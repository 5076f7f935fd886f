"""CDRNet stereo training CLI. [ref: train_cdr.py:240-250]"""

import argparse

from ..config import load_config
from ..train import loop_cdr


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", type=str,
                        default="configs/mads_3d.yaml",
                        help="Path to the config file")
    parser.add_argument("--overwrite", action="store_true")
    parser.add_argument("--weights_root", type=str, default="weights")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute (fp32 params/BN stats)")
    parser.add_argument("--plot_dir", type=str, default=None,
                        help="write loss curves here after training")
    parser.add_argument("--resume", action="store_true",
                        help="continue from weights/<NAME>/latest")
    parser.add_argument("--log_every", type=int, default=None,
                        help="log per-step loss/grad-norm/lr + live "
                             "throughput every N steps")
    parser.add_argument("--trace_dir", type=str, default=None,
                        help="capture a jax.profiler device trace of a "
                             "few steady-state steps here")
    parser.add_argument("--retries", type=int, default=0,
                        help="auto-resume from the last checkpoint after "
                             "retryable backend crashes (preemptible / "
                             "flaky TPU stacks), up to N times")
    parser.add_argument("--checkpoint_every", type=int, default=1,
                        help="save the rolling latest checkpoint every N "
                             "epochs (N>1 also enables one-dispatch "
                             "segment execution when the device frame "
                             "cache holds the dataset)")
    parser.add_argument("--async_checkpoint", action="store_true",
                        help="fetch+write checkpoints on a background "
                             "thread so the ~540 MB state transfer "
                             "overlaps training")
    parser.add_argument("--no_segments", action="store_true",
                        help="keep scan-EPOCH dispatches but never batch "
                             "an inter-checkpoint span into one segment "
                             "graph (workaround for backends that crash "
                             "on very large compiles; --retries reaches "
                             "this automatically on the second retry)")
    parser.add_argument("--per_batch", action="store_true",
                        help="force classic per-batch execution "
                             "(scan_epochs=False); the slowest but most "
                             "robust path")
    parser.add_argument("--segment_epochs", type=int, default=None,
                        help="epochs per segment GRAPH, decoupled from "
                             "--checkpoint_every (clamped to it): small "
                             "segments keep most of the dispatch "
                             "amortization with a far smaller compile — "
                             "the escape hatch when the full-span "
                             "segment graph crashes the backend compiler")
    args = parser.parse_args()

    from ..parallel.distributed import init_distributed
    from ..utils.runtime import enable_compilation_cache
    init_distributed()   # no-op unless JAX_COORDINATOR_ADDRESS is set
    enable_compilation_cache()   # warm runs skip the remote XLA compile

    config = load_config(args.config_path)
    from ..train.resilience import run_with_retries
    run_with_retries(loop_cdr.run, config, retries=args.retries,
                     overwrite=args.overwrite,
                     weights_root=args.weights_root, seed=args.seed,
                     compute_dtype="bfloat16" if args.bf16 else "float32",
                     plot_dir=args.plot_dir, resume=args.resume,
                     log_every=args.log_every,
                     trace_dir=args.trace_dir,
                     scan_epochs=False if args.per_batch else None,
                     segments=False if (args.no_segments
                                        or args.per_batch) else None,
                     checkpoint_every=args.checkpoint_every,
                     segment_epochs=args.segment_epochs,
                     async_checkpoint=args.async_checkpoint)


if __name__ == "__main__":
    main()
