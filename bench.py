"""Benchmark: CDRNet-101 stereo inference throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "stereo_pairs_per_sec", "value": N, "unit": "pairs/s",
   "vs_baseline": N / 1.128, "mode": "int8-ptq"|"bf16",
   "bf16_pairs_per_sec": N, "int8_pairs_per_sec": N}

Both serving paths are measured every run; the headline is the faster
one (int8 PTQ since round 4 — demonstrated accuracy-neutral on trained
checkpoints, scripts/int8_accuracy.py / BASELINE.md; the bf16 number
stays in the line for round-over-round comparability).

Baseline 1.128 pairs/s = the reference torch-CPU CDRNet-101 forward at
256x256, batch 1 (best CPU batch size), minted on this host — see
BASELINE.md. The reference publishes no numbers of its own.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_PAIRS_PER_SEC = 1.128


def _stereo_projs(batch):
    K = np.array([[1100.0, 0.0, 128.0],
                  [0.0, 1100.0, 128.0],
                  [0.0, 0.0, 1.0]])
    Ps = []
    for dx in (-400.0, 400.0):
        R = np.eye(3)
        T = np.array([[dx], [0.0], [3000.0]])
        Ps.append((K @ np.hstack([R, T])).astype(np.float32))
    return np.broadcast_to(np.stack(Ps), (batch, 2, 3, 4)).astype(np.float32)


def bench_cdrnet(batch_sizes=(16, 32, 64), iters=20,
                 dtype=jnp.bfloat16, verbose=True):
    """Steady-state throughput with the iteration loop INSIDE jit.

    The axon-tunneled TPU has ~20ms per-dispatch RPC latency and its
    block_until_ready does not wait for device completion, so host-side
    per-call timing is meaningless. Instead `iters` forward passes run
    under one lax.scan with a serializing data dependency (the input is
    perturbed by a term derived from the previous output, numerically
    negligible but impossible to hoist), and completion is forced by
    fetching a scalar reduced from the final carry.
    """
    from fast3dhpe_tpu.models import CDRNet

    model = CDRNet(num_joints=19, num_layers=101, dtype=dtype)
    rng = np.random.RandomState(0)

    best = 0.0
    best_b = None
    results = {}
    for B in batch_sizes:
        imgs = jnp.asarray(rng.randn(B, 2, 256, 256, 3), jnp.float32)
        projs = jnp.asarray(_stereo_projs(B))
        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), imgs, projs, train=False)

        def run_n(variables, imgs, projs):
            def body(carry, _):
                x = carry
                kp, p3d = model.apply(variables, x, projs, train=False)
                # serializing dependency; ~1e-9 relative perturbation
                x = x + jnp.mean(kp) * 1e-9
                return x, jnp.sum(p3d)
            x, sums = jax.lax.scan(body, imgs, None, length=iters)
            return jnp.sum(sums)

        g = jax.jit(run_n)
        # first call compiles (remote compile is slow) + warms up
        float(g(variables, imgs, projs))

        t0 = time.perf_counter()
        s = float(g(variables, imgs, projs))
        dt = (time.perf_counter() - t0) / iters
        assert np.isfinite(s)
        pps = B / dt
        results[B] = pps
        if verbose:
            print(f"# batch {B}: {pps:.1f} pairs/s ({dt*1e3:.2f} ms/step)")
        if pps > best:
            best, best_b = pps, B
    return best, best_b, results


def bench_training(batch_sizes=(16, 32, 64), iters=10, dtype=jnp.bfloat16):
    """Secondary metric: full CDR train step (fwd+bwd+Adam+BN) pairs/s,
    swept over batch sizes (round-1 only measured batch 16)."""
    import optax
    from fast3dhpe_tpu.models import CDRNet, make_loss
    from fast3dhpe_tpu.train.state import TrainState
    from fast3dhpe_tpu.train.steps import make_train_step_cdr

    rng = np.random.RandomState(0)
    model = CDRNet(num_joints=19, num_layers=101, dtype=dtype)
    best, best_b, results = 0.0, None, {}
    for B in batch_sizes:
        batch = {
            "image": jnp.asarray(rng.randn(B, 2, 256, 256, 3), jnp.float32),
            "proj": jnp.asarray(_stereo_projs(B)),
            "target_3d": jnp.asarray(rng.randn(B, 19, 3) * 200, jnp.float32),
            "target_2d": jnp.asarray(rng.uniform(0, 256, (B, 2, 19, 2)),
                                     jnp.float32),
            "target_weight": jnp.ones((B, 19), jnp.float32),
        }
        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), batch["image"], batch["proj"],
            train=False)
        state = TrainState.create(variables, optax.adam(1e-4))
        step = make_train_step_cdr(model, make_loss("JointsMSESmooth", True))

        state, m = step(state, batch, jnp.asarray(True))      # compile
        _ = float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch, jnp.asarray(True))  # state-chained
        _ = float(m["loss"])
        dt = (time.perf_counter() - t0) / iters
        pps = B / dt
        results[B] = pps
        print(f"# training batch {B}: {pps:.1f} pairs/s "
              f"({dt*1e3:.1f} ms/step)")
        if pps > best:
            best, best_b = pps, B
    print(f"# training best: {best:.1f} pairs/s at batch {best_b}")
    return best, best_b, results


def bench_training_loop(B=64, dtype="bfloat16"):
    """Loop-level training throughput: the REAL loop (loader with decode
    threads + RAM cache + prefetch, device metric accumulation) on a
    synthetic MADS tree — validates the loop reaches the compiled step's
    throughput (VERDICT round-1: the loop's per-step host syncs would have
    halved it)."""
    import tempfile
    from fast3dhpe_tpu.config import config_from_dict
    from fast3dhpe_tpu.data.synthetic import make_synthetic_mads
    from fast3dhpe_tpu.train import loop_cdr

    tmp = tempfile.mkdtemp(prefix="benchloop_")
    root = f"{tmp}/data"
    make_synthetic_mads(root, n_frames=256, img_w=256, img_h=192)
    cfg = config_from_dict({
        "DATASET": {"TYPE": "MADS_3d", "ROOT": root, "TRAIN_SET": "train",
                    "TEST_SET": "valid", "FLIP": True, "ROT_FACTOR": 30,
                    "SCALE_FACTOR": 0.25, "OCCLUSION": "CUTOUT",
                    "CACHE_BYTES": 2 << 30,
                    # frames resident in HBM: batches assemble by
                    # on-device gather, so the loop is step-bound, not
                    # bound by raw-frame transfer over the relay link
                    "DEVICE_CACHE_BYTES": 4 << 30},
        "MODEL": {"NUM_JOINTS": 19, "NUM_LAYERS": 101, "NAME": "benchloop",
                  "PRETRAINED": "", "IMAGE_SIZE": [256, 256],
                  "EXTRA": {"TARGET_TYPE": "gaussian", "SIGMA": 3,
                            "HEATMAP_SIZE": [64, 64]}},
        "TRAIN": {"BATCH_SIZE": B, "EPOCH": 24, "LR": 1e-4, "LR_STEP": [40],
                  "LR_FACTOR": 0.1, "WARMUP": 0, "LOSS_3D_WEIGHT": 4},
        "TEST": {"BATCH_SIZE": B},
        "LOSS": {"USE_TARGET_WEIGHT": True, "TYPE": "JointsMSESmooth"},
    })
    # checkpoint_every=12 -> two equal 12-epoch SEGMENTS (each segment =
    # one dispatch: 12x(train scan + eval scan), steps.make_segment_cdr);
    # the first pays compile + cold decode, the second is the steady
    # number. The reported pairs/s counts TRAIN pairs only but the
    # measured window includes the in-dispatch val epochs (reference
    # loop parity) — the train-only ceiling is the step rate.
    hist = loop_cdr.run(cfg, overwrite=True, weights_root=f"{tmp}/weights",
                        max_steps_per_epoch=None, compute_dtype=dtype,
                        checkpoint_every=12)
    pps = hist["train_pairs_per_sec"][-1]
    print(f"# training loop (batch {B}, full pipeline): {pps:.1f} pairs/s")
    return pps


def bench_infer_loop(B=64, n_frames=256, dtype=jnp.bfloat16, epochs=3):
    """End-to-end serving-eval throughput: the REAL streaming pipeline
    (batch JPEG decode -> prefetch -> raw-frame transfer -> on-device
    affine crop + normalize + CDRNet-101 forward + MPJPE) on a synthetic
    MADS tree — the loop-level counterpart of the batch-64 step number,
    like --train-loop is for training."""
    import tempfile
    from fast3dhpe_tpu.config import config_from_dict
    from fast3dhpe_tpu.data.synthetic import make_synthetic_mads
    from fast3dhpe_tpu.data.stream import LoadMADSData
    from fast3dhpe_tpu.apps.inference import CDRNetInferencer

    tmp = tempfile.mkdtemp(prefix="benchinfer_")
    root = f"{tmp}/data"
    make_synthetic_mads(root, n_frames=n_frames, img_w=256, img_h=192,
                        splits=("valid",))
    cfg = config_from_dict({
        "DATASET": {"TYPE": "MADS_3d", "ROOT": root, "TRAIN_SET": "train",
                    "TEST_SET": "valid"},
        "MODEL": {"NUM_JOINTS": 19, "NUM_LAYERS": 101, "NAME": "benchinfer",
                  "PRETRAINED": "", "IMAGE_SIZE": [256, 256],
                  "EXTRA": {"TARGET_TYPE": "gaussian", "SIGMA": 3,
                            "HEATMAP_SIZE": [64, 64]}},
        "TRAIN": {"BATCH_SIZE": B, "EPOCH": 1, "LR": 1e-4, "LR_STEP": [40],
                  "LR_FACTOR": 0.1},
        "TEST": {"BATCH_SIZE": B},
        "LOSS": {"USE_TARGET_WEIGHT": True, "TYPE": "JointsMSESmooth"},
    })
    from fast3dhpe_tpu.models import CDRNet
    model = CDRNet.from_config(cfg, dtype=dtype)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(2, 2, 256, 256, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), imgs, jnp.asarray(_stereo_projs(2)),
        train=False)
    inf = CDRNetInferencer(cfg, dtype=dtype, variables=variables)
    stream = LoadMADSData(f"{root}/valid", cfg.MODEL.IMAGE_SIZE, "HipHop")
    pps = 0.0
    for ep in range(epochs):      # first pays compile + cache build
        t0 = time.perf_counter()
        inf.evaluate_movement(stream, batch_size=B,
                              device_cache_bytes=4 << 30)
        dt = time.perf_counter() - t0
        pps = len(stream) / dt
        print(f"# infer loop epoch {ep}: {pps:.1f} pairs/s "
              f"({len(stream)} frames in {dt:.2f}s)")
    print(f"# inference loop (batch {B}, full pipeline): {pps:.1f} pairs/s")
    return pps


def bench_cdrnet_int8(batch_sizes=(16, 32, 64, 128), iters=20,
                      verbose=True):
    """Int8 PTQ serving throughput (models/quantized.py) vs the bf16
    path, same serializing-scan methodology. The int8 MXU probe
    (scripts/int8_probe.py) predicted 1.4-1.7x at CDRNet conv shapes;
    this measures the full quantized network (encoder+decoder int8,
    CanonicalFusion bf16, soft-argmax/DLT fp32). Accuracy of the same
    path on a trained model: scripts/int8_accuracy.py."""
    from fast3dhpe_tpu.models import CDRNet
    from fast3dhpe_tpu.models import quantized as qz

    rng = np.random.RandomState(0)
    model = CDRNet(num_joints=19, num_layers=101, dtype=jnp.bfloat16)
    imgs0 = jnp.asarray(rng.randn(2, 2, 256, 256, 3), jnp.float32)
    projs0 = jnp.asarray(_stereo_projs(2))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), imgs0, projs0, train=False)
    pack = qz.quantize_cdrnet(variables, [(imgs0, projs0)])

    best, best_b, results = 0.0, None, {}
    for B in batch_sizes:
        imgs = jnp.asarray(rng.randn(B, 2, 256, 256, 3), jnp.float32)
        projs = jnp.asarray(_stereo_projs(B))

        def run_n(pack, imgs, projs):
            def body(carry, _):
                kp, p3d = qz.cdrnet_int8_apply(pack, carry, projs,
                                               depth=101)
                x = carry + jnp.mean(kp) * 1e-9   # serializing dep
                return x, jnp.sum(p3d)
            x, sums = jax.lax.scan(body, imgs, None, length=iters)
            return jnp.sum(sums)

        g = jax.jit(run_n)
        float(g(pack, imgs, projs))               # compile + warm
        t0 = time.perf_counter()
        s = float(g(pack, imgs, projs))
        dt = (time.perf_counter() - t0) / iters
        assert np.isfinite(s)
        pps = B / dt
        results[B] = pps
        if verbose:
            print(f"# int8 batch {B}: {pps:.1f} pairs/s "
                  f"({dt*1e3:.2f} ms/step)")
        if pps > best:
            best, best_b = pps, B
    print(f"# int8 best: {best:.1f} pairs/s at batch {best_b}")
    return best, best_b, results


def _measure_scan_floor(iters=50):
    """Shared methodology: utils.profiling.measure_scan_floor (one
    baseline for bench.py and scripts/bottleneck_variant_bench.py)."""
    from fast3dhpe_tpu.utils.profiling import measure_scan_floor
    return measure_scan_floor(iters=iters)


def bench_latency(batch_sizes=(1, 4, 16), iters=50, dtype=jnp.bfloat16,
                  int8=False):
    """Serving-latency view: per-step device latency at small batches
    (the reference's actual use case is frame-by-frame video).

    Methodology (docs/PERFORMANCE.md): the serializing-scan measurement
    is an UPPER BOUND that includes a fixed per-iteration scan cost
    (~1.3-1.45 ms on this relay). That floor is measured directly with a
    trivial-body scan at the same iteration count and subtracted, giving
    a floor-corrected model-latency estimate alongside the raw bound.

    int8=True measures the PTQ serving path instead of bf16."""
    floor = _measure_scan_floor(iters=iters)
    print(f"# scan floor: {floor*1e3:.2f} ms/iter (trivial body, "
          f"measured, subtracted below)")
    if int8:
        best, best_b, results = bench_cdrnet_int8(
            batch_sizes=batch_sizes, iters=iters, verbose=False)
    else:
        best, best_b, results = bench_cdrnet(batch_sizes=batch_sizes,
                                             iters=iters, dtype=dtype,
                                             verbose=False)
    out = {}
    tag = "int8 " if int8 else ""
    for B, pps in results.items():
        raw = B / pps * 1e3
        corrected = max(raw - floor * 1e3, 0.0)
        out[B] = {"upper_ms": raw, "corrected_ms": corrected}
        print(f"# {tag}latency batch {B}: {corrected:.2f} ms/step "
              f"(scan-floor-corrected; raw upper bound {raw:.2f} ms, "
              f"{pps:.1f} pairs/s)")
    return out


def _with_retries(fn, retries=3, backoff_s=90.0):
    """Re-run a stateless measurement after a retryable backend crash.

    The relay's TPU worker can die underneath any client (observed:
    "TPU worker process crashed or restarted", ~5 min to come back). The
    driver runs this script unattended at round end — a transient crash
    must not cost the round its recorded number. Measurements here are
    stateless (fresh init each call), so a plain re-run is safe; the
    UNAVAILABLE-class filter is shared with train.resilience so
    numerical errors never retry. After the backoff a device round-trip
    probe (wait_for_backend) holds the retry until the worker actually
    answers — outages up to >12 min have outlived pure backoff (r4)."""
    from fast3dhpe_tpu.train.resilience import is_retryable, wait_for_backend
    for attempt in range(retries + 1):
        try:
            return fn()
        except Exception as e:            # noqa: BLE001 — filtered below
            if attempt >= retries or not is_retryable(e):
                raise
            wait = backoff_s * (attempt + 1)
            print(f"# backend failure ({str(e).splitlines()[0][:100]}); "
                  f"retrying in {wait:.0f}s "
                  f"(attempt {attempt + 1}/{retries})")
            time.sleep(wait)
            wait_for_backend(600.0)


def main():
    import sys
    from fast3dhpe_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()   # warm runs skip the remote XLA compile
    backend = jax.default_backend()
    print(f"# backend: {backend}, devices: {jax.devices()}")
    if "--train" in sys.argv:
        bench_training()
    if "--train-loop" in sys.argv:
        bench_training_loop()
    if "--infer-loop" in sys.argv:
        bench_infer_loop()
    if "--latency" in sys.argv:
        bench_latency(int8="--int8" in sys.argv)
    best_bf16, _, _ = _with_retries(bench_cdrnet)
    # Headline = the int8 PTQ serving path: measured accuracy-NEUTRAL on
    # trained checkpoints (2D delta <= 0.01 px, 3D delta <= 0.2 mm at
    # both CDR-18 and the staged CDR-101 flagship —
    # scripts/int8_accuracy.py, BASELINE.md), so it is the configuration
    # a production deployment would serve. The bf16 number is measured
    # in the same run and reported alongside.
    best_i8, _, _ = _with_retries(bench_cdrnet_int8)
    best = max(best_i8, best_bf16)
    print(json.dumps({
        "metric": "stereo_pairs_per_sec",
        "value": round(best, 2),
        "unit": "pairs/s",
        "vs_baseline": round(best / BASELINE_PAIRS_PER_SEC, 2),
        "mode": ("int8-ptq" if best_i8 >= best_bf16 else "bf16"),
        "bf16_pairs_per_sec": round(best_bf16, 2),
        "int8_pairs_per_sec": round(best_i8, 2),
    }))


if __name__ == "__main__":
    main()
