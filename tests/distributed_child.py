"""Child process for tests/test_distributed_real.py: one rank of a REAL
2-process jax.distributed run (CPU backend, localhost coordinator).

Runs the actual CDR training loop (loop_cdr.run) over a mesh spanning
both processes' devices: per-host record shards, lockstep batch counts,
row_valid=0 padding, jax.make_array_from_process_local_data assembly
(parallel/mesh.shard_batch), and process-0-gated checkpoint writes all
execute for real — the paths every other multi-host test only simulates
by monkeypatching jax.process_count/process_index.

Invoked as:
  python tests/distributed_child.py <pid> <nprocs> <coord> <mads_root> \
      <weights_root> <out_json>

Augmentation is disabled (ROT/SCALE 0, FLIP/OCCLUSION off) so the global
batch content is deterministic and a single-process run over the same
records is numerically comparable (the hosts' local RNG streams would
otherwise diverge from the single-process stream).

Frames are 256x192 (the synthetic rig's fixed 600-px focal needs at
least ~192-px frames for the joints to project in bounds — at 64x64 the
train-mode boundary check zeroes every target weight and training is
vacuous: loss 0, grad 0).
"""

import json
import os
import re
import sys


def main():
    pid, nprocs = int(sys.argv[1]), int(sys.argv[2])
    coord, mads_root, weights_root, out_json = sys.argv[3:7]

    # one CPU device per process (a conftest-inherited
    # xla_force_host_platform_device_count would multiply the global
    # device count and break the batch divisibility)
    os.environ["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "",
        os.environ.get("XLA_FLAGS", "")).strip()

    import jax
    # must run before backends initialize (sitecustomize pins a TPU relay)
    jax.config.update("jax_platforms", "cpu")

    from fast3dhpe_tpu.parallel.distributed import init_distributed
    init_distributed(coordinator_address=coord, num_processes=nprocs,
                     process_id=pid)
    assert jax.process_count() == nprocs
    assert jax.process_index() == pid

    from fast3dhpe_tpu.config import config_from_dict
    from fast3dhpe_tpu.parallel import make_mesh
    from fast3dhpe_tpu.train import loop_cdr

    cfg = config_from_dict({
        "DATASET": {"TYPE": "MADS_3d", "ROOT": mads_root,
                    "TRAIN_SET": "train", "TEST_SET": "valid",
                    "FLIP": False, "ROT_FACTOR": 0, "SCALE_FACTOR": 0,
                    "OCCLUSION": "None"},
        "MODEL": {"NUM_JOINTS": 19, "NUM_LAYERS": 18, "NAME": "dist",
                  "PRETRAINED": "", "IMAGE_SIZE": [64, 64],
                  "EXTRA": {"TARGET_TYPE": "gaussian", "SIGMA": 1,
                            "HEATMAP_SIZE": [16, 16]}},
        # local batch 4/host -> global batch 8 (assembled over the mesh);
        # 6 records/shard of 3 -> one lockstep batch with padded rows
        "TRAIN": {"BATCH_SIZE": 4, "EPOCH": 2, "LR": 1e-3,
                  "LR_STEP": [40], "LR_FACTOR": 0.1, "WARMUP": 1,
                  "LOSS_3D_WEIGHT": 4},
        "TEST": {"BATCH_SIZE": 4},
        "LOSS": {"USE_TARGET_WEIGHT": True, "TYPE": "JointsMSE"},
    })
    mesh = make_mesh()
    history = loop_cdr.run(cfg, mesh=mesh, overwrite=True, seed=0,
                           weights_root=weights_root)
    with open(out_json, "w") as f:
        json.dump({k: [float(x) for x in v] for k, v in history.items()},
                  f)


if __name__ == "__main__":
    main()
