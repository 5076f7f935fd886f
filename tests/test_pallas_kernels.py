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
