"""Losses/metrics vs the reference torch implementations (imported from
/root/reference) and numpy oracles."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import REFERENCE_PATH, reference_available

from fast3dhpe_tpu.models.losses import (
    joints_mse_loss, joints_mse_smooth_loss, mpjpe_loss, make_loss)
from fast3dhpe_tpu.models.metrics import pck_accuracy, calc_mpjpe

torch = pytest.importorskip("torch")

if reference_available() and REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)

needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")

rng = np.random.RandomState(0)


@needs_reference
class TestLossParity:
    def setup_method(self, method):
        B, J, H, W = 4, 19, 64, 64
        self.hm_pred = rng.randn(B, J, H, W).astype(np.float32)
        self.hm_gt = rng.randn(B, J, H, W).astype(np.float32)
        self.w = (rng.uniform(size=(B, J, 1)) > 0.3).astype(np.float32)
        self.kp_pred = (rng.randn(B, J, 2) * 30 + 128).astype(np.float32)
        self.kp_gt = (rng.randn(B, J, 2) * 30 + 128).astype(np.float32)

    def test_joints_mse(self):
        from models.loss import JointsMSELoss
        for use_w in (True, False):
            crit = JointsMSELoss(use_target_weight=use_w)
            expected = crit(torch.tensor(self.hm_pred),
                            torch.tensor(self.hm_gt),
                            torch.tensor(self.w)).item()
            got = float(joints_mse_loss(
                self.hm_pred, self.hm_gt, self.w if use_w else None))
            assert got == pytest.approx(expected, rel=1e-5)

    def test_joints_mse_smooth_on_coords(self):
        """As used by train_cdr on 2D/3D coordinates
        [ref train_cdr.py:112-125]."""
        from models.loss import JointsMSESmoothLoss
        for use_w in (True, False):
            crit = JointsMSESmoothLoss(use_target_weight=use_w)
            expected = crit(torch.tensor(self.kp_pred),
                            torch.tensor(self.kp_gt),
                            torch.tensor(self.w)).item()
            got = float(joints_mse_smooth_loss(
                self.kp_pred, self.kp_gt, self.w if use_w else None))
            assert got == pytest.approx(expected, rel=1e-5)

    def test_joints_mse_smooth_clamps_large_residuals(self):
        from models.loss import JointsMSESmoothLoss
        # residuals > sqrt(400) trigger the soft clamp branch
        pred = self.kp_pred + 100.0
        crit = JointsMSESmoothLoss(use_target_weight=False)
        expected = crit(torch.tensor(pred), torch.tensor(self.kp_gt),
                        torch.tensor(self.w)).item()
        got = float(joints_mse_smooth_loss(pred, self.kp_gt, None))
        assert got == pytest.approx(expected, rel=1e-5)

    def test_mpjpe(self):
        from models.loss import MPJPELoss
        for use_w in (True, False):
            crit = MPJPELoss(use_target_weight=use_w)
            expected = crit(torch.tensor(self.kp_pred),
                            torch.tensor(self.kp_gt),
                            torch.tensor(self.w)).item()
            got = float(mpjpe_loss(
                self.kp_pred, self.kp_gt, self.w if use_w else None))
            assert got == pytest.approx(expected, rel=1e-5)

    def test_make_loss_dispatch(self):
        for t in ("JointsMSE", "JointsMSESmooth", "MPJPE"):
            fn = make_loss(t, use_target_weight=True)
            v = fn(self.kp_pred, self.kp_gt, self.w)
            assert np.isfinite(float(v))
        with pytest.raises(NotImplementedError):
            make_loss("nope", True)


@needs_reference
class TestMetricParity:
    def test_pck_accuracy(self):
        from models.metrics import accuracy as ref_accuracy
        B, J, H, W = 6, 19, 64, 64
        # peaked heatmaps with some zero/negative (invalid) channels
        hm_pred = rng.randn(B, J, H, W).astype(np.float32)
        hm_gt = rng.randn(B, J, H, W).astype(np.float32)
        hm_gt[:, 3] = -1.0   # gt decodes to (0,0) -> excluded joints

        expected_acc, _ = ref_accuracy(hm_pred, hm_gt)
        avg, per_joint, _ = pck_accuracy(
            jnp.asarray(hm_pred.transpose(0, 2, 3, 1)),
            jnp.asarray(hm_gt.transpose(0, 2, 3, 1)))

        assert float(avg) == pytest.approx(expected_acc[0], abs=1e-6)
        np.testing.assert_allclose(np.asarray(per_joint), expected_acc[1:],
                                   atol=1e-6)

    def test_calc_mpjpe(self):
        from models.metrics import calc_mpjpe as ref_calc_mpjpe
        B, J = 4, 19
        pred2d = rng.randn(B, 2, J, 2).astype(np.float32) * 20 + 128
        pred3d = rng.randn(B, J, 3).astype(np.float32) * 100
        gt3d = rng.randn(B, J, 3).astype(np.float32) * 100
        gtl = rng.randn(B, J, 2).astype(np.float32) * 20 + 128
        gtr = rng.randn(B, J, 2).astype(np.float32) * 20 + 128
        w = (rng.uniform(size=(B, J, 1)) > 0.2).astype(np.float32)

        exp_2d, exp_3d = ref_calc_mpjpe(
            [pred2d[:, 0], pred2d[:, 1]], pred3d, gt3d, gtl, gtr, w)
        got_2d, got_3d = calc_mpjpe(pred2d, pred3d, gt3d, gtl, gtr, w)
        assert float(got_2d) == pytest.approx(float(exp_2d), rel=1e-5)
        assert float(got_3d) == pytest.approx(float(exp_3d), rel=1e-5)

        # and without weights
        exp_2d, exp_3d = ref_calc_mpjpe(
            [pred2d[:, 0], pred2d[:, 1]], pred3d, gt3d, gtl, gtr)
        got_2d, got_3d = calc_mpjpe(pred2d, pred3d, gt3d, gtl, gtr)
        assert float(got_2d) == pytest.approx(float(exp_2d), rel=1e-5)
        assert float(got_3d) == pytest.approx(float(exp_3d), rel=1e-5)
