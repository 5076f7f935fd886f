"""Tests for device ops: warp vs cv2, heatmap render vs numpy oracle,
hard-argmax vs the reference decode, occlusion mask semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fast3dhpe_tpu.ops import (
    affine_warp, soft_argmax, hard_argmax, render_gaussian_heatmaps,
    cutout, hide_n_seek,
)
from fast3dhpe_tpu.ops.warp import normalize_imagenet
from fast3dhpe_tpu.geometry import get_affine_transform

rng = np.random.RandomState(0)


class TestAffineWarp:
    def test_matches_cv2_warpaffine(self):
        cv2 = pytest.importorskip("cv2")
        img = rng.randint(0, 256, size=(300, 400, 3), dtype=np.uint8)
        for seed in range(3):
            r = np.random.RandomState(seed)
            c = np.array([200.0, 150.0]) + r.uniform(-20, 20, 2)
            s = r.uniform(0.9, 1.2)
            rot = r.uniform(-30, 30)
            tr = get_affine_transform(c, s, rot, 300, (256, 256))
            expected = cv2.warpAffine(img, tr, (256, 256),
                                      flags=cv2.INTER_LINEAR)
            got = np.asarray(affine_warp(img[None], tr, (256, 256)))[0]
            # cv2 uses 5-bit fixed-point interpolation weights; allow a few
            # intensity levels of difference, and require close agreement on
            # the vast majority of pixels.
            diff = np.abs(got - expected.astype(np.float32))
            assert np.mean(diff) < 0.5, np.mean(diff)
            assert np.percentile(diff, 99) <= 4.0

    def test_identity(self):
        img = rng.randint(0, 256, size=(64, 64, 3), dtype=np.uint8)
        tr = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        got = np.asarray(affine_warp(img[None], tr, (64, 64)))[0]
        np.testing.assert_allclose(got, img.astype(np.float32), atol=1e-4)

    def test_out_of_bounds_is_zero(self):
        img = np.full((32, 32, 3), 255, dtype=np.uint8)
        # translate far off-image
        tr = np.array([[1.0, 0.0, 1000.0], [0.0, 1.0, 1000.0]])
        got = np.asarray(affine_warp(img[None], tr, (32, 32)))[0]
        np.testing.assert_allclose(got, 0.0)

    def test_batched_per_image_transforms(self):
        imgs = rng.randint(0, 256, size=(3, 64, 64, 3), dtype=np.uint8)
        trs = np.stack([
            np.array([[1.0, 0.0, float(i)], [0.0, 1.0, 0.0]])
            for i in range(3)])
        got = np.asarray(affine_warp(imgs, trs, (64, 64)))
        for i in range(3):
            single = np.asarray(affine_warp(imgs[i:i+1], trs[i], (64, 64)))[0]
            np.testing.assert_allclose(got[i], single)

    def test_normalize_imagenet(self):
        img = np.full((1, 4, 4, 3), 255, dtype=np.uint8)
        out = np.asarray(normalize_imagenet(img))
        expected = (1.0 - np.array([0.485, 0.456, 0.406])) / \
            np.array([0.229, 0.224, 0.225])
        np.testing.assert_allclose(out[0, 0, 0], expected, rtol=1e-5)


def reference_generate_target(joints, joints_vis, heatmap_size, image_size,
                              sigma=3):
    """numpy oracle transcribed from the documented reference algorithm
    [ref dataset/base.py:100-158]."""
    num_joints = joints.shape[0]
    W_hm, H_hm = heatmap_size
    target_weight = np.ones((num_joints, 1), dtype=np.float32)
    target_weight[:, 0] = joints_vis[:, 0]
    target = np.zeros((num_joints, H_hm, W_hm), dtype=np.float32)
    tmp_size = sigma * 3
    for j in range(num_joints):
        feat_stride = [i / h for (i, h) in zip(image_size, heatmap_size)]
        mu_x = int(joints[j][0] / feat_stride[0] + 0.5)
        mu_y = int(joints[j][1] / feat_stride[1] + 0.5)
        ul = [int(mu_x - tmp_size), int(mu_y - tmp_size)]
        br = [int(mu_x + tmp_size + 1), int(mu_y + tmp_size + 1)]
        if ul[0] >= W_hm or ul[1] >= H_hm or br[0] < 0 or br[1] < 0:
            target_weight[j] = 0
            continue
        size = 2 * tmp_size + 1
        x = np.arange(0, size, 1, np.float32)
        y = x[:, np.newaxis]
        x0 = y0 = size // 2
        g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma ** 2))
        g_x = max(0, -ul[0]), min(br[0], W_hm) - ul[0]
        g_y = max(0, -ul[1]), min(br[1], H_hm) - ul[1]
        img_x = max(0, ul[0]), min(br[0], W_hm)
        img_y = max(0, ul[1]), min(br[1], H_hm)
        if target_weight[j] > 0.5:
            target[j][img_y[0]:img_y[1], img_x[0]:img_x[1]] = \
                g[g_y[0]:g_y[1], g_x[0]:g_x[1]]
    return target, target_weight


class TestGaussianHeatmaps:
    @pytest.mark.parametrize("seed", range(4))
    def test_matches_reference_oracle(self, seed):
        r = np.random.RandomState(seed)
        J = 19
        # include in-bounds, near-edge and far out-of-bounds joints
        joints = r.uniform(-80, 330, size=(J, 2)).astype(np.float32)
        vis = (r.uniform(size=(J, 1)) > 0.2).astype(np.float32)
        expected_t, expected_w = reference_generate_target(
            joints, vis, (64, 64), (256, 256), sigma=3)

        got_t, got_w = render_gaussian_heatmaps(
            joints[None], vis[None, :, 0], (64, 64), (256, 256), sigma=3)
        got_t = np.asarray(got_t)[0].transpose(2, 0, 1)   # (J, H, W)
        got_w = np.asarray(got_w)[0]

        np.testing.assert_allclose(got_w, expected_w[:, 0])
        np.testing.assert_allclose(got_t, expected_t, rtol=1e-5, atol=1e-6)

    def test_center_value_is_one(self):
        joints = np.array([[128.0, 128.0]], dtype=np.float32)
        vis = np.ones((1, 1), dtype=np.float32)
        t, w = render_gaussian_heatmaps(joints[None], vis[None, :, 0],
                                        (64, 64), (256, 256), sigma=3)
        assert float(np.asarray(t).max()) == pytest.approx(1.0)
        # peak at heatmap (32, 32)
        idx = np.unravel_index(np.asarray(t)[0, :, :, 0].argmax(), (64, 64))
        assert idx == (32, 32)


class TestArgmaxDecode:
    def test_hard_argmax_matches_reference(self):
        """Oracle: get_max_preds [ref tools/utils.py:30-58]."""
        hm = rng.randn(3, 64, 64, 19).astype(np.float32)
        got_pred, got_max = hard_argmax(jnp.asarray(hm))

        nchw = hm.transpose(0, 3, 1, 2)
        B, J, H, W = nchw.shape
        reshaped = nchw.reshape(B, J, -1)
        idx = np.argmax(reshaped, 2)
        maxvals = np.amax(reshaped, 2)
        preds = np.tile(idx[..., None], (1, 1, 2)).astype(np.float32)
        preds[:, :, 0] = preds[:, :, 0] % W
        preds[:, :, 1] = np.floor(preds[:, :, 1] / W)
        preds *= np.tile((maxvals > 0)[..., None], (1, 1, 2))

        np.testing.assert_allclose(np.asarray(got_pred), preds)
        np.testing.assert_allclose(np.asarray(got_max), maxvals)

    def test_soft_argmax_peak_recovery(self):
        # a sharply peaked heatmap decodes to (approximately) the peak
        hm = np.zeros((1, 64, 64, 2), dtype=np.float32)
        hm[0, 20, 40, 0] = 50.0
        hm[0, 5, 10, 1] = 50.0
        kp = np.asarray(soft_argmax(jnp.asarray(hm)))
        np.testing.assert_allclose(kp[0, 0], [40.0, 20.0], atol=1e-3)
        np.testing.assert_allclose(kp[0, 1], [10.0, 5.0], atol=1e-3)


class TestOcclusion:
    def test_cutout_semantics(self):
        key = jax.random.PRNGKey(0)
        imgs = jnp.zeros((2, 128, 128, 3), jnp.float32)
        out, keep = cutout(key, imgs, n_holes=6, length=40)
        out, keep = np.asarray(out), np.asarray(keep)
        assert out.shape == (2, 128, 128, 3)
        assert keep.shape == (2, 128, 128)
        # occluded pixels are gray 128 [ref tools/augmentation.py:44]
        assert (out[~keep] == 128.0).all()
        assert (out[keep] == 0.0).all()
        # some but not all pixels occluded
        frac = (~keep).mean()
        assert 0.01 < frac < 0.5, frac

    def test_cutout_deterministic_per_key(self):
        imgs = jnp.zeros((1, 64, 64, 3))
        o1, m1 = cutout(jax.random.PRNGKey(7), imgs)
        o2, m2 = cutout(jax.random.PRNGKey(7), imgs)
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
        o3, m3 = cutout(jax.random.PRNGKey(8), imgs)
        assert not np.array_equal(np.asarray(m1), np.asarray(m3))

    def test_hide_n_seek_semantics(self):
        key = jax.random.PRNGKey(1)
        imgs = jnp.zeros((3, 128, 128, 3), jnp.float32)
        out, keep = hide_n_seek(key, imgs, n_patches=4, p_hide=0.4)
        out, keep = np.asarray(out), np.asarray(keep)
        assert (out[~keep] == 128.0).all()
        # exactly int(0.4 * 16) = 6 of 16 cells hidden per image
        cell = keep[:, ::32, ::32]                        # (B, 4, 4) corners
        hidden_cells = (~cell).sum(axis=(1, 2))
        np.testing.assert_array_equal(hidden_cells, [6, 6, 6])

    def test_hide_n_seek_remainder_rows_never_hidden(self):
        # H=130 not divisible by 4: length=32, rows 128..129 stay visible
        imgs = jnp.zeros((1, 130, 130, 3))
        _, keep = hide_n_seek(jax.random.PRNGKey(2), imgs, n_patches=4)
        keep = np.asarray(keep)
        assert keep[:, 128:, :].all()
        assert keep[:, :, 128:].all()
