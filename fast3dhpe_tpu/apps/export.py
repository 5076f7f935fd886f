"""Export a trained CDRNet to a serving artifact (StableHLO).

    python -m fast3dhpe_tpu.apps.export --config_path configs/mads_3d.yaml \
        --batch_size 64 --platforms tpu,cpu --out cdrnet101.stablehlo

The artifact carries preprocessing + forward + weights; load it with
fast3dhpe_tpu.export.load_serving (no model code or checkpoint needed).
The reference has no deployment path beyond unpickling a state dict
[ref: inference.py:30-35].
"""

import argparse
import os

import jax.numpy as jnp


def main():
    from ..utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", type=str,
                        default="configs/mads_3d.yaml")
    parser.add_argument("--weights_root", type=str, default="weights")
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--platforms", type=str, default=None,
                        help="comma-separated, e.g. tpu,cpu "
                             "(default: current backend)")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute in the exported graph")
    parser.add_argument("--out", type=str, default=None,
                        help="output path (default <MODEL.NAME>.stablehlo)")
    parser.add_argument("--int8_pack", type=str, default=None,
                        help="export the int8 PTQ path from this .npz "
                             "pack (apps.inference --int8_pack writes "
                             "one) instead of the fp checkpoint")
    args = parser.parse_args()

    from ..config import load_config
    from ..models import CDRNet
    from ..train.checkpoint import load_variables
    from ..export import (export_cdrnet, export_cdrnet_int8,
                          save_exported)

    config = load_config(args.config_path)
    platforms = (args.platforms.split(",") if args.platforms else None)
    if args.int8_pack:
        from ..models.quantized import load_pack
        exported = export_cdrnet_int8(
            load_pack(args.int8_pack), batch_size=args.batch_size,
            image_size=tuple(config.MODEL.IMAGE_SIZE),
            platforms=platforms,
            dlt_method=config.MODEL.EXTRA.DLT_METHOD)
    else:
        model = CDRNet.from_config(
            config, dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
        variables = load_variables(
            os.path.join(args.weights_root, config.MODEL.NAME))
        exported = export_cdrnet(
            model, variables, batch_size=args.batch_size,
            image_size=tuple(config.MODEL.IMAGE_SIZE),
            platforms=platforms)
    out = args.out or f"{config.MODEL.NAME}.stablehlo"
    size = save_exported(exported, out)
    print(f"Wrote {out} ({size / 1e6:.1f} MB, platforms="
          f"{list(exported.platforms)}, batch={args.batch_size})")


if __name__ == "__main__":
    main()
