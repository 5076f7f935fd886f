"""Pallas kernel tests (run in interpret mode on the CPU test mesh;
the compiled path is exercised on TPU by bench.py / the driver)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fast3dhpe_tpu.ops.heatmap import soft_argmax
from fast3dhpe_tpu.ops.pallas_softargmax import (
    soft_argmax_fused, _jnp_soft_argmax, _fwd_pallas, _bwd_pallas)

rng = np.random.RandomState(0)


class TestSoftArgmaxFused:
    def test_jnp_path_matches_reference_op(self):
        hm = jnp.asarray(rng.randn(4, 64, 64, 19).astype(np.float32) * 3)
        a = np.asarray(soft_argmax_fused(hm))
        b = np.asarray(soft_argmax(hm))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)

    def test_pallas_interpret_matches_jnp(self):
        hm = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32) * 3)
        a = np.asarray(_fwd_pallas(hm, interpret=True))
        b = np.asarray(_jnp_soft_argmax(hm))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)

    def test_custom_vjp_matches_autodiff(self):
        hm = jnp.asarray(rng.randn(2, 16, 16, 4).astype(np.float32) * 2)
        ct = jnp.asarray(rng.randn(2, 4, 2).astype(np.float32))

        def loss_fused(h):
            return jnp.sum(soft_argmax_fused(h) * ct)

        def loss_auto(h):
            return jnp.sum(soft_argmax(h) * ct)

        g1 = np.asarray(jax.grad(loss_fused)(hm))
        g2 = np.asarray(jax.grad(loss_auto)(hm))
        np.testing.assert_allclose(g1, g2, rtol=1e-3, atol=1e-5)

    def test_pallas_bwd_interpret_matches_closed_form(self):
        hm = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32) * 2)
        g = jnp.asarray(rng.randn(2, 8, 2).astype(np.float32))
        a = np.asarray(_bwd_pallas(hm, g, interpret=True))
        from fast3dhpe_tpu.ops.pallas_softargmax import _fused_bwd
        (b,) = _fused_bwd(False, hm, g)
        np.testing.assert_allclose(a, np.asarray(b), rtol=1e-3, atol=1e-5)

    def test_peak_recovery(self):
        hm = np.zeros((1, 32, 32, 2), np.float32)
        hm[0, 7, 21, 0] = 40.0
        hm[0, 30, 3, 1] = 40.0
        kp = np.asarray(soft_argmax_fused(jnp.asarray(hm)))
        np.testing.assert_allclose(kp[0, 0], [21, 7], atol=1e-3)
        np.testing.assert_allclose(kp[0, 1], [3, 30], atol=1e-3)


class TestFusedBottleneck:
    """ops/pallas_bottleneck.py — the fused inference Bottleneck kernel
    (interpret mode on CPU; bit-exact on real TPU, verified separately)."""

    def _mk_bn(self, C, r):
        from fast3dhpe_tpu.ops.pallas_bottleneck import fold_bn
        return fold_bn(jnp.asarray(r.rand(C) + 0.5, jnp.float32),
                       jnp.asarray(r.randn(C) * 0.1, jnp.float32),
                       jnp.asarray(r.randn(C) * 0.1, jnp.float32),
                       jnp.asarray(r.rand(C) + 0.5, jnp.float32))

    @pytest.mark.parametrize("conv2_mode", ["taps", "xpack"])
    @pytest.mark.parametrize("ds", [True, False])
    def test_kernel_matches_xla_reference(self, ds, conv2_mode):
        from fast3dhpe_tpu.ops.pallas_bottleneck import (
            fused_bottleneck, bottleneck_reference)
        r = np.random.RandomState(0)
        P, H, B = 16, 8, 4
        Cout = 4 * P
        Cin = 64 if ds else Cout
        x = jnp.asarray(r.randn(B, H, H, Cin), jnp.float32)
        w1 = r.randn(Cin, P).astype(np.float32) * 0.1
        w2 = r.randn(3, 3, P, P).astype(np.float32) * 0.1
        w3 = r.randn(P, Cout).astype(np.float32) * 0.1
        s1, b1 = self._mk_bn(P, r)
        s2, b2 = self._mk_bn(P, r)
        s3, b3 = self._mk_bn(Cout, r)
        wd = sd = bd = None
        if ds:
            wd = r.randn(Cin, Cout).astype(np.float32) * 0.1
            sd, bd = self._mk_bn(Cout, r)
        ref = np.asarray(bottleneck_reference(
            x, w1, s1, b1, w2, s2, b2, w3, s3, b3, wd, sd, bd))
        got = np.asarray(fused_bottleneck(
            x, w1, s1, b1, w2, s2, b2, w3, s3, b3, wd, sd, bd,
            samples_per_cell=2, interpret=True, conv2_mode=conv2_mode))
        np.testing.assert_allclose(got, ref, atol=1e-4)

    @pytest.mark.slow
    def test_encoder_fused_matches_standard(self):
        """ResNetEncoder(fused_inference=True) == standard path on the
        same params — exercises the gating, BN folding and the param
        extraction in models/resnet.Bottleneck._fused. bf16 256px input
        so stage1 (64x64 plane) and stage2 (32x32) actually fuse."""
        from fast3dhpe_tpu.models.resnet import ResNetEncoder
        r = np.random.RandomState(1)
        x = jnp.asarray(r.randn(2, 256, 256, 3), jnp.float32)
        enc = ResNetEncoder(num_layers=50, dtype=jnp.bfloat16)
        enc_f = ResNetEncoder(num_layers=50, dtype=jnp.bfloat16,
                              fused_inference=True)
        variables = enc.init(jax.random.PRNGKey(0), x, train=False)
        a = np.asarray(enc.apply(variables, x, train=False),
                       np.float32)
        b = np.asarray(enc_f.apply(variables, x, train=False),
                       np.float32)
        # bf16 path: folded-BN rounding differs from sequential BN
        denom = max(np.abs(a).max(), 1e-3)
        assert np.abs(a - b).max() / denom < 0.05
        assert np.abs(a - b).mean() / denom < 0.005

    def test_param_tree_unchanged(self):
        """setup-style Bottleneck must keep the round-1 param names
        (checkpoint compatibility)."""
        from fast3dhpe_tpu.models.resnet import Bottleneck
        blk = Bottleneck(planes=8, downsample=True)
        v = blk.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 16)),
                     train=False)
        assert set(v["params"].keys()) == {
            "conv1", "bn1", "conv2", "bn2", "conv3", "bn3",
            "downsample_conv", "downsample_bn"}
        assert set(v["batch_stats"].keys()) == {
            "bn1", "bn2", "bn3", "downsample_bn"}
        assert v["params"]["conv1"]["kernel"].shape == (1, 1, 16, 8)
