"""AOT export (jax.export): roundtrip correctness + cross-platform lowering."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fast3dhpe_tpu.export import (export_cdrnet, save_exported, load_serving,
                                  make_serving_fn)
from fast3dhpe_tpu.models import CDRNet


@pytest.fixture(scope="module")
def tiny_model():
    model = CDRNet(num_joints=19, num_layers=18)
    B, H = 2, 64
    rng = np.random.RandomState(0)
    K = np.array([[300.0, 0, 32], [0, 300.0, 32], [0, 0, 1]])
    Ps = []
    for dx in (-400.0, 400.0):
        T = np.array([[dx], [0.0], [3000.0]])
        Ps.append((K @ np.hstack([np.eye(3), T])).astype(np.float32))
    proj = np.broadcast_to(np.stack(Ps), (B, 2, 3, 4)).astype(np.float32)
    imgs = rng.randint(0, 256, (B, 2, H, H, 3)).astype(np.uint8)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 2, H, H, 3), jnp.float32),
                           jnp.asarray(proj[:1]), train=False)
    return model, variables, imgs, proj


class TestExportInt8:
    def test_int8_export_roundtrip(self, tiny_model, tmp_path):
        """The PTQ pack exports to StableHLO and the loaded artifact
        reproduces the in-process int8 path (same quantized arithmetic,
        so agreement is tight despite the untrained net)."""
        from fast3dhpe_tpu.export import (export_cdrnet_int8,
                                          make_serving_fn_int8)
        from fast3dhpe_tpu.models import quantized as qz
        from fast3dhpe_tpu.ops.warp import normalize_imagenet

        model, variables, imgs, proj = tiny_model
        B, H = imgs.shape[0], imgs.shape[2]
        imgs_n = jnp.stack([normalize_imagenet(jnp.asarray(imgs[:, 0])),
                            normalize_imagenet(jnp.asarray(imgs[:, 1]))],
                           axis=1)
        pack = qz.quantize_cdrnet(variables, [(imgs_n, jnp.asarray(proj))])

        exported = export_cdrnet_int8(pack, batch_size=B,
                                      image_size=(H, H))
        path = str(tmp_path / "m_int8.stablehlo")
        save_exported(exported, path)
        serve = load_serving(path)
        kp, p3 = serve(imgs[:, 0], imgs[:, 1], proj)
        assert kp.shape == (B, 2, 19, 2)
        assert p3.shape == (B, 19, 3)

        ref = jax.jit(make_serving_fn_int8(pack))
        kp_ref, p3_ref = ref(jnp.asarray(imgs[:, 0]),
                             jnp.asarray(imgs[:, 1]), jnp.asarray(proj))
        np.testing.assert_allclose(np.asarray(kp), np.asarray(kp_ref),
                                   rtol=1e-4, atol=1e-3)
        p3, p3_ref = np.asarray(p3), np.asarray(p3_ref)
        scale = np.abs(p3_ref).max() + 1.0
        np.testing.assert_allclose(p3 / scale, p3_ref / scale,
                                   rtol=0, atol=1e-3)


class TestExportRoundtrip:
    def test_serialize_load_matches_direct(self, tiny_model, tmp_path):
        model, variables, imgs, proj = tiny_model
        B, H = imgs.shape[0], imgs.shape[2]
        exported = export_cdrnet(model, variables, batch_size=B,
                                 image_size=(H, H))
        path = str(tmp_path / "m.stablehlo")
        size = save_exported(exported, path)
        assert size > 1_000_000          # weights baked in

        serve = load_serving(path)
        kp, p3 = serve(imgs[:, 0], imgs[:, 1], proj)
        assert kp.shape == (B, 2, 19, 2)
        assert p3.shape == (B, 19, 3)

        ref = jax.jit(make_serving_fn(model, variables))
        kp_ref, p3_ref = ref(jnp.asarray(imgs[:, 0]), jnp.asarray(imgs[:, 1]),
                             jnp.asarray(proj))
        # 2D keypoints are well-conditioned (0..64 px): tight bound.
        np.testing.assert_allclose(np.asarray(kp), np.asarray(kp_ref),
                                   rtol=1e-4, atol=1e-3)
        # The untrained net triangulates near infinity (|p3| ~ 1e7, DLT
        # condition number huge), so fp32 fusion differences between the
        # two compilations are amplified — bound relative to magnitude.
        p3, p3_ref = np.asarray(p3), np.asarray(p3_ref)
        scale = np.abs(p3_ref).max() + 1.0
        np.testing.assert_allclose(p3 / scale, p3_ref / scale,
                                   rtol=0, atol=1e-3)

    def test_cross_platform_lowering(self, tiny_model, tmp_path):
        """A TPU-targeted artifact can be produced on a CPU-only host."""
        model, variables, imgs, proj = tiny_model
        B, H = imgs.shape[0], imgs.shape[2]
        exported = export_cdrnet(model, variables, batch_size=B,
                                 image_size=(H, H),
                                 platforms=("tpu", "cpu"))
        assert set(p.lower() for p in exported.platforms) == {"tpu", "cpu"}
        blob = exported.serialize()
        assert len(blob) > 1_000_000

    def test_wrong_batch_size_rejected(self, tiny_model):
        model, variables, imgs, proj = tiny_model
        H = imgs.shape[2]
        exported = export_cdrnet(model, variables, batch_size=4,
                                 image_size=(H, H))
        with pytest.raises(Exception):
            exported.call(jnp.asarray(imgs[:2, 0]), jnp.asarray(imgs[:2, 1]),
                          jnp.asarray(proj[:2]))
