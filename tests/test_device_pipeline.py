"""Unit tests for device_pipeline internals vs reference-transcribed
oracles (check_boundary / check_occlusion / P composition)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fast3dhpe_tpu.data.device_pipeline import (
    _check_boundary, _check_occlusion, compose_projection_batched,
    preprocess_stereo_batch)

rng = np.random.RandomState(0)


class TestCheckBoundary:
    def test_matches_reference_oracle(self):
        """Oracle: tools/utils.py:200-207 — OOB joints set to (-1,-1),
        validity flag returned."""
        H = W = 256
        pose = np.array([[10.0, 20.0], [-5.0, 100.0], [100.0, 300.0],
                         [255.9, 255.9], [256.0, 10.0]], np.float32)
        got_pose, got_valid = _check_boundary(jnp.asarray(pose[None]), H, W)
        got_pose, got_valid = np.asarray(got_pose)[0], np.asarray(got_valid)[0]

        expected_valid = np.array([True, False, False, True, False])
        np.testing.assert_array_equal(got_valid, expected_valid)
        for i, v in enumerate(expected_valid):
            if v:
                np.testing.assert_allclose(got_pose[i], pose[i])
            else:
                np.testing.assert_allclose(got_pose[i], [-1.0, -1.0])


class TestCheckOcclusion:
    def test_mask_lookup(self):
        """Oracle: tools/utils.py:184-197 — visibility from the keep-mask
        at the joint's integer pixel."""
        H = W = 32
        keep = np.ones((1, H, W), bool)
        keep[0, 10:20, 10:20] = False
        pose = np.array([[[5.0, 5.0], [15.0, 15.0], [25.0, 12.0]]],
                        np.float32)
        vis = np.asarray(_check_occlusion(jnp.asarray(pose),
                                          jnp.asarray(keep)))
        np.testing.assert_array_equal(vis[0], [True, False, True])

    def test_negative_one_wraps_like_numpy(self):
        """Joints zeroed to (-1,-1) by check_boundary index the LAST pixel
        in the reference's numpy lookup — preserved."""
        keep = np.ones((1, 8, 8), bool)
        keep[0, 7, 7] = False
        pose = np.array([[[-1.0, -1.0]]], np.float32)
        vis = np.asarray(_check_occlusion(jnp.asarray(pose),
                                          jnp.asarray(keep)))
        assert vis[0, 0] == False  # noqa: E712


class TestComposeProjection:
    def test_matches_numpy_oracle(self):
        """Oracle: dataset/mads_3d.py:223-226."""
        P = rng.randn(3, 4, 4)
        trans = rng.randn(3, 2, 3)
        got = np.asarray(compose_projection_batched(
            jnp.asarray(P, jnp.float32), jnp.asarray(trans, jnp.float32)))
        for b in range(3):
            T = np.eye(4)
            T[:2, :3] = trans[b]
            np.testing.assert_allclose(got[b], T @ P[b], rtol=1e-5,
                                       atol=1e-4)


class TestOcclusionGating:
    def test_eval_mode_never_occludes(self):
        key = jax.random.PRNGKey(0)
        B, H0, W0 = 2, 64, 80
        img = jnp.asarray(rng.randint(0, 255, (B, H0, W0, 3)), jnp.uint8)
        trans = jnp.broadcast_to(
            jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]]), (B, 2, 3))
        P = jnp.broadcast_to(jnp.eye(4), (B, 4, 4)).astype(jnp.float32)
        pose = jnp.asarray(rng.randn(B, 19, 3), jnp.float32)
        vis = jnp.ones((B, 19), jnp.float32)
        out = preprocess_stereo_batch(
            key, img, img, trans, P, P, pose, vis, image_size=(64, 64),
            occlusion="CUTOUT", train=False)
        # eval: no gray-128 cutout patches, weights untouched
        np.testing.assert_array_equal(np.asarray(out["target_weight"]),
                                      np.ones((B, 19)))

    def test_return_masks(self):
        """return_masks exposes the per-view keep-masks for the inspection
        view [ref: tools/visualize.py:35-63]; hidden pixels are gray-128
        in the occluded image wherever the mask says hidden."""
        key = jax.random.PRNGKey(1)
        B, H0, W0 = 4, 64, 80
        img = jnp.asarray(rng.randint(0, 255, (B, H0, W0, 3)), jnp.uint8)
        trans = jnp.broadcast_to(
            jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]]), (B, 2, 3))
        P = jnp.broadcast_to(jnp.eye(4), (B, 4, 4)).astype(jnp.float32)
        pose = jnp.asarray(rng.randn(B, 19, 3), jnp.float32)
        vis = jnp.ones((B, 19), jnp.float32)
        out = preprocess_stereo_batch(
            key, img, img, trans, P, P, pose, vis, image_size=(64, 64),
            occlusion="CUTOUT", train=True, occl_prob=1.0,
            return_masks=True)
        masks = np.asarray(out["keep_mask"])
        assert masks.shape == (B, 2, 64, 64) and masks.dtype == bool
        assert (~masks).any(), "p=1.0 gating must occlude something"
        # un-normalize and check hidden pixels are the cutout gray
        from fast3dhpe_tpu.ops.warp import IMAGENET_MEAN, IMAGENET_STD
        imgs = np.asarray(out["image"])                   # (B, 2, H, W, 3)
        raw = (imgs * np.asarray(IMAGENET_STD)
               + np.asarray(IMAGENET_MEAN)) * 255.0
        hidden = ~masks
        np.testing.assert_allclose(raw[hidden], 128.0, atol=0.6)
