"""Int8 PTQ inference path (models/quantized.py, ops/quant.py).

Guards: (1) the quant primitives' arithmetic, (2) BN-fold exactness
against the fp32 flax model, (3) end-to-end int8 accuracy vs the fp
model for PoseResNet and CDRNet (the serving path the int8 MXU probe
motivates — docs/PERFORMANCE.md round-4 section).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fast3dhpe_tpu.ops import quant as Q
from fast3dhpe_tpu.models import quantized as qz
from fast3dhpe_tpu.models.poseresnet import PoseResNet
from fast3dhpe_tpu.models.cdrnet import CDRNet

from tests.test_model_parity import stereo_projections


def _randomize_batch_stats(vars_, seed=7):
    """Init leaves BN stats at mean=0/var=1 (a trivial fold); replace
    them with realistic values so the fold math is actually exercised."""
    rng = np.random.RandomState(seed)

    def mutate(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "mean":
            return jnp.asarray(rng.randn(*leaf.shape) * 0.3, leaf.dtype)
        if name == "var":
            return jnp.asarray(0.25 + rng.rand(*leaf.shape), leaf.dtype)
        return leaf

    stats = jax.tree_util.tree_map_with_path(
        mutate, vars_["batch_stats"])
    return {**vars_, "batch_stats": stats}


class TestPrimitives:
    def test_quantize_kernel_per_channel(self):
        rng = np.random.RandomState(0)
        w = jnp.asarray(rng.randn(3, 3, 8, 16) *
                        rng.rand(16) * 5, jnp.float32)
        q, s = Q.quantize_kernel(w)
        assert q.dtype == jnp.int8 and s.shape == (16,)
        # per-channel max maps to +-127; dequantized error < scale/2
        err = np.abs(np.asarray(q, np.float32) * np.asarray(s) -
                     np.asarray(w))
        assert err.max() <= np.asarray(s).max() * 0.5 + 1e-6

    def test_quantize_kernel_zero_channel_safe(self):
        w = jnp.zeros((1, 1, 4, 3), jnp.float32)
        q, s = Q.quantize_kernel(w)
        assert np.all(np.asarray(q) == 0) and np.all(np.asarray(s) == 1.0)

    def test_requant_dequant_roundtrip(self):
        x = jnp.asarray([-300.0, -1.0, 0.0, 0.26, 0.5, 1.0, 300.0])
        x8 = Q.requant(x, jnp.float32(0.5))
        assert x8.dtype == jnp.int8
        np.testing.assert_array_equal(
            np.asarray(x8), [-127, -2, 0, 1, 1, 2, 127])

    def test_fold_bn_matches_bn_composition(self):
        rng = np.random.RandomState(1)
        w = jnp.asarray(rng.randn(3, 3, 4, 8), jnp.float32)
        scale = jnp.asarray(rng.rand(8) + 0.5, jnp.float32)
        bias = jnp.asarray(rng.randn(8), jnp.float32)
        mean = jnp.asarray(rng.randn(8), jnp.float32)
        var = jnp.asarray(rng.rand(8) + 0.1, jnp.float32)
        x = jnp.asarray(rng.randn(2, 6, 6, 4), jnp.float32)
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        conv = lambda k: jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)
        ref = (conv(w) - mean) * scale / jnp.sqrt(var + 1e-5) + bias
        wf, bf = Q.fold_bn(w, scale, bias, mean, var)
        np.testing.assert_allclose(np.asarray(conv(wf) + bf),
                                   np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_int8_conv_exact_vs_fp(self):
        rng = np.random.RandomState(2)
        x8 = jnp.asarray(rng.randint(-127, 128, (2, 8, 8, 4)), jnp.int8)
        w8 = jnp.asarray(rng.randint(-127, 128, (3, 3, 4, 6)), jnp.int8)
        y = Q.conv_i8(x8, w8, 1, 1)
        dn = jax.lax.conv_dimension_numbers(x8.shape, w8.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        ref = jax.lax.conv_general_dilated(
            x8.astype(jnp.float32), w8.astype(jnp.float32), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=dn)
        assert y.dtype == jnp.int32
        np.testing.assert_array_equal(np.asarray(y),
                                      np.asarray(ref).astype(np.int64))

    def test_max_pool_i8_matches_fp_pool(self):
        rng = np.random.RandomState(3)
        x = rng.randint(0, 127, (2, 9, 9, 4))  # post-ReLU domain
        got = Q.max_pool_i8(jnp.asarray(x, jnp.int8))
        from fast3dhpe_tpu.models.layers import max_pool_torch
        ref = max_pool_torch(jnp.asarray(x, jnp.float32))
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(ref))


class TestPoseResNetInt8:
    def _build(self, depth, seed=0):
        rng = np.random.RandomState(seed)
        model = PoseResNet(num_joints=5, num_layers=depth,
                           dtype=jnp.float32)
        x = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
        vars_ = _randomize_batch_stats(
            model.init(jax.random.PRNGKey(0), x, train=False))
        return model, vars_, x

    def test_folded_fp_matches_model(self):
        model, vars_, x = self._build(18)
        ref = np.asarray(model.apply(vars_, x, train=False), np.float32)
        got = np.asarray(qz.poseresnet_fp_folded_apply(vars_, x),
                         np.float32)
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() < 1e-4 * max(scale, 1e-3)

    def test_int8_close_to_fp(self):
        model, vars_, x = self._build(18)
        ref = np.asarray(model.apply(vars_, x, train=False), np.float32)
        pack = qz.quantize_poseresnet(vars_, [x])
        out = jax.jit(lambda p, im: qz.poseresnet_int8_apply(p, im, 18))(
            pack, x)
        out = np.asarray(out, np.float32)
        assert out.dtype == np.float32
        corr = np.corrcoef(ref.ravel(), out.ravel())[0, 1]
        assert corr > 0.99, corr
        assert np.abs(out - ref).max() < 0.12 * np.abs(ref).max()

    def test_pack_is_int8(self):
        _, vars_, x = self._build(18)
        pack = qz.quantize_poseresnet(vars_, [x])
        for l in pack["layers"].values():
            assert str(l["w"].dtype) == "int8"
            assert l["sw"].dtype == jnp.float32
            assert l["b"].dtype == jnp.float32

    @pytest.mark.slow
    def test_int8_close_to_fp_depth50(self):
        model, vars_, x = self._build(50)
        ref = np.asarray(model.apply(vars_, x, train=False), np.float32)
        pack = qz.quantize_poseresnet(vars_, [x])
        out = np.asarray(jax.jit(
            lambda p, im: qz.poseresnet_int8_apply(p, im, 50))(pack, x),
            np.float32)
        corr = np.corrcoef(ref.ravel(), out.ravel())[0, 1]
        assert corr > 0.99, corr


class TestCDRNetInt8:
    def test_int8_keypoints_close(self):
        rng = np.random.RandomState(0)
        model = CDRNet(num_joints=5, num_layers=18, dtype=jnp.float32)
        imgs = jnp.asarray(rng.randn(2, 2, 64, 64, 3), jnp.float32)
        projs = jnp.asarray(stereo_projections(2), jnp.float32)
        # NOTE: init-default BN stats (mean 0, var 1). At random init the
        # heatmaps are near-flat, so soft-argmax amplifies any noise;
        # with randomized stats the kp bound is meaningless (the fold
        # math itself is covered by TestPoseResNetInt8). Trained-model
        # accuracy is measured by scripts/int8_accuracy.py instead.
        vars_ = model.init(jax.random.PRNGKey(0), imgs, projs,
                           train=False)
        kp_ref, p3_ref = model.apply(vars_, imgs, projs, train=False)
        pack = qz.quantize_cdrnet(vars_, [(imgs, projs)])
        kp, p3 = qz.jit_cdrnet_int8(pack)(imgs, projs)
        kp_err = np.abs(np.asarray(kp) - np.asarray(kp_ref)).max()
        # soft-argmax over 16x16 heatmaps at 64px scale: sub-pixel drift
        assert kp_err < 1.5, kp_err
        assert np.all(np.isfinite(np.asarray(p3)))
        # heatmaps come back fp32 when asked
        _, _, hm = qz.cdrnet_int8_apply(pack, imgs, projs, depth=18,
                                        return_heatmaps=True)
        assert hm.shape == (2, 2, 16, 16, 5)

    def test_inferencer_int8_path(self, tmp_path):
        """CDRNetInferencer(int8=True): calibrates from a stream and
        evaluates a movement through the quantized serving path, close
        to the bf16 result of the same random-init checkpoint."""
        from fast3dhpe_tpu.apps.inference import CDRNetInferencer
        from fast3dhpe_tpu.data.stream import LoadMADSData
        from fast3dhpe_tpu.data.synthetic import make_synthetic_mads
        from tests.test_end_to_end import tiny_cfg

        root = str(tmp_path / "mads")
        make_synthetic_mads(root, n_frames=8, img_w=256, img_h=192,
                            splits=("valid",), movements=("HipHop",))
        cfg = tiny_cfg(root)
        model = CDRNet.from_config(cfg, dtype=jnp.float32)
        rng = np.random.RandomState(0)
        imgs = jnp.asarray(rng.randn(2, 2, 64, 64, 3), jnp.float32)
        projs = jnp.asarray(stereo_projections(2), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), imgs, projs,
                               train=False)

        stream = LoadMADSData(os.path.join(root, "valid"),
                              cfg.MODEL.IMAGE_SIZE, "HipHop")
        res = {}
        for mode in ("bf16", "int8"):
            inf = CDRNetInferencer(cfg, variables=variables,
                                   int8=(mode == "int8"),
                                   calib_stream=stream, calib_batches=1)
            res[mode] = inf.evaluate_movement(stream, batch_size=4)
            assert np.isfinite(res[mode]).all()
        # random-init MPJPEs are huge; the two paths must agree in scale
        ratio = (res["int8"][0] + 1e-6) / (res["bf16"][0] + 1e-6)
        assert 0.3 < ratio < 3.0, res

    def test_sharded_matches_single_device(self):
        """The int8 graph partitions over a data-parallel mesh: pack
        replicated, batch sharded, results identical to single-device
        (int8/int32 arithmetic is exact, so this is a strict check)."""
        from fast3dhpe_tpu.parallel import make_mesh, replicate
        from fast3dhpe_tpu.parallel.mesh import batch_sharding
        import functools

        rng = np.random.RandomState(0)
        model = CDRNet(num_joints=5, num_layers=18, dtype=jnp.float32)
        imgs = jnp.asarray(rng.randn(8, 2, 64, 64, 3), jnp.float32)
        projs = jnp.asarray(stereo_projections(8), jnp.float32)
        vars_ = model.init(jax.random.PRNGKey(0), imgs[:2], projs[:2],
                           train=False)
        pack = qz.quantize_cdrnet(vars_, [(imgs[:2], projs[:2])])
        fn = jax.jit(functools.partial(qz.cdrnet_int8_apply, depth=18))
        kp1, p31 = jax.device_get(fn(pack, imgs, projs))

        mesh = make_mesh()
        sh = batch_sharding(mesh)
        kp8, p38 = jax.device_get(fn(
            replicate(mesh, pack),
            jax.device_put(imgs, sh), jax.device_put(projs, sh)))
        np.testing.assert_allclose(kp8, kp1, rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(p38, p31, rtol=1e-4, atol=1e-2)

    @pytest.mark.slow
    def test_spatial_sharded_matches_single_device(self):
        """Int8 serving under the SPATIAL (mp=2) layout — the
        latency-bound small-batch serving configuration
        (docs/SCALING.md): image height split over the model axis, pack
        replicated, XLA inserts the conv halo exchanges. int8/int32
        conv arithmetic is partition-invariant, so outputs must match
        the single-device pack bit-for-bit up to the fp32 geometry
        tail's float reassociation."""
        from fast3dhpe_tpu.parallel import make_mesh, replicate
        from fast3dhpe_tpu.parallel.mesh import (batch_sharding,
                                                 spatial_sharding)
        import functools

        rng = np.random.RandomState(0)
        model = CDRNet(num_joints=5, num_layers=18, dtype=jnp.float32)
        # batch 4 = the data-axis size of the 8-device mp=2 mesh
        imgs = jnp.asarray(rng.randn(4, 2, 64, 64, 3), jnp.float32)
        projs = jnp.asarray(stereo_projections(4), jnp.float32)
        vars_ = model.init(jax.random.PRNGKey(0), imgs, projs,
                           train=False)
        pack = qz.quantize_cdrnet(vars_, [(imgs, projs)])
        fn = jax.jit(functools.partial(qz.cdrnet_int8_apply, depth=18))
        kp1, p31 = jax.device_get(fn(pack, imgs, projs))

        mesh = make_mesh(model_parallel=2)
        kp2, p32 = jax.device_get(fn(
            replicate(mesh, pack),
            jax.device_put(imgs, spatial_sharding(mesh, 5)),
            jax.device_put(projs, batch_sharding(mesh))))
        np.testing.assert_allclose(kp2, kp1, rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(p32, p31, rtol=1e-4, atol=1e-2)

    def test_pack_save_load_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        model = CDRNet(num_joints=5, num_layers=18, dtype=jnp.float32)
        imgs = jnp.asarray(rng.randn(2, 2, 64, 64, 3), jnp.float32)
        projs = jnp.asarray(stereo_projections(2), jnp.float32)
        vars_ = model.init(jax.random.PRNGKey(0), imgs, projs,
                           train=False)
        pack = qz.quantize_cdrnet(vars_, [(imgs, projs)])
        path = str(tmp_path / "pack.npz")
        qz.save_pack(path, pack)
        pack2 = qz.load_pack(path)
        assert pack2["depth"] == pack["depth"] == 18
        kp1, p31 = qz.cdrnet_int8_apply(pack, imgs, projs, depth=18)
        kp2, p32 = qz.cdrnet_int8_apply(pack2, imgs, projs, depth=18)
        np.testing.assert_array_equal(np.asarray(kp1), np.asarray(kp2))
        np.testing.assert_array_equal(np.asarray(p31), np.asarray(p32))

    def test_calibration_batches_merge(self):
        # scales from two batches must dominate each single batch
        rng = np.random.RandomState(1)
        model = PoseResNet(num_joints=3, num_layers=18,
                           dtype=jnp.float32)
        x1 = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
        x2 = jnp.asarray(rng.randn(1, 64, 64, 3) * 3, jnp.float32)
        vars_ = model.init(jax.random.PRNGKey(0), x1, train=False)
        p1 = qz.quantize_poseresnet(vars_, [x1])
        p12 = qz.quantize_poseresnet(vars_, [x1, x2])
        for k in p1["scales"]:
            assert float(p12["scales"][k]) >= float(p1["scales"][k]) - 1e-9
