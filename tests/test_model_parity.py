"""Cross-framework parity: reference torch models vs our flax models.

Builds the reference networks from /root/reference (read-only import, torch
CPU), converts their randomly-initialized state dicts through the .pth
importer, and asserts forward-pass outputs match within fp32 tolerance.
This is the checkpoint-parity guarantee: any real reference checkpoint
loads the same way.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import REFERENCE_PATH, reference_available

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")

if reference_available() and REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)

from fast3dhpe_tpu.models import PoseResNet, CDRNet  # noqa: E402
from fast3dhpe_tpu.train.checkpoint import (  # noqa: E402
    torch_state_dict_to_flax, merge_encoder_only)


def make_cfg(num_joints=19, num_layers=50):
    cfg = types.SimpleNamespace()
    cfg.MODEL = types.SimpleNamespace(
        NUM_JOINTS=num_joints, NUM_LAYERS=num_layers)
    return cfg


def rel_err(a, b):
    scale = max(np.abs(b).max(), 1e-8)
    return np.abs(a - b).max() / scale


@pytest.fixture(scope="module")
def torch_poseresnet():
    from models.poseresnet import PoseResNet as TorchPoseResNet
    torch.manual_seed(0)
    model = TorchPoseResNet(make_cfg(num_joints=19, num_layers=50))
    model.eval()
    return model


@pytest.mark.slow
class TestPoseResNetParity:
    def test_forward_matches(self, torch_poseresnet):
        model = torch_poseresnet
        variables = torch_state_dict_to_flax(model.state_dict())

        x = torch.randn(2, 3, 256, 256)
        with torch.no_grad():
            y_ref = model(x).numpy()                       # (2, J, 64, 64)

        net = PoseResNet(num_joints=19, num_layers=50)
        xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))  # NHWC
        y = net.apply(variables, xj, train=False)
        y = np.asarray(y).transpose(0, 3, 1, 2)

        assert y.shape == y_ref.shape
        assert rel_err(y, y_ref) < 2e-3, rel_err(y, y_ref)

    def test_converted_tree_matches_model_init(self, torch_poseresnet):
        """Converted tree has exactly the structure flax init produces."""
        variables = torch_state_dict_to_flax(torch_poseresnet.state_dict())
        net = PoseResNet(num_joints=19, num_layers=50)
        init_vars = net.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 64, 64, 3)), train=False)

        flat_conv = jax.tree_util.tree_map(lambda x: x.shape, variables)
        flat_init = jax.tree_util.tree_map(lambda x: x.shape, init_vars)
        conv_paths = jax.tree_util.tree_leaves_with_path(flat_conv)
        init_paths = jax.tree_util.tree_leaves_with_path(flat_init)
        assert ({(jax.tree_util.keystr(p), v) for p, v in conv_paths}
                == {(jax.tree_util.keystr(p), v) for p, v in init_paths})

    def test_encoder_only_merge(self, torch_poseresnet):
        """merge_encoder_only loads encoder, keeps fresh decoder.
        [ref models/poseresnet.py:23-38]"""
        pretrained = torch_state_dict_to_flax(torch_poseresnet.state_dict())
        net = PoseResNet(num_joints=19, num_layers=50)
        fresh = net.init(jax.random.PRNGKey(1),
                         jnp.zeros((1, 64, 64, 3)), train=False)
        merged = merge_encoder_only(fresh, pretrained)

        enc_kernel = merged["params"]["encoder"]["conv1"]["kernel"]
        np.testing.assert_array_equal(
            np.asarray(enc_kernel),
            np.asarray(pretrained["params"]["encoder"]["conv1"]["kernel"]))
        dec_kernel = merged["params"]["decoder"]["deconv1"]["kernel"]
        np.testing.assert_array_equal(
            np.asarray(dec_kernel),
            np.asarray(fresh["params"]["decoder"]["deconv1"]["kernel"]))

    def test_resnet101_forward_matches(self):
        from models.poseresnet import PoseResNet as TorchPoseResNet
        torch.manual_seed(1)
        model = TorchPoseResNet(make_cfg(num_joints=19, num_layers=101))
        model.eval()
        variables = torch_state_dict_to_flax(model.state_dict())

        x = torch.randn(1, 3, 256, 256)
        with torch.no_grad():
            y_ref = model(x).numpy()
        net = PoseResNet(num_joints=19, num_layers=101)
        y = net.apply(variables,
                      jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                      train=False)
        y = np.asarray(y).transpose(0, 3, 1, 2)
        assert rel_err(y, y_ref) < 2e-3, rel_err(y, y_ref)


def stereo_projections(batch):
    """Realistic-ish stereo projection matrices, cropped-image scale."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tests.test_geometry import random_camera
    from fast3dhpe_tpu.geometry import get_projection_matrix
    Ps = []
    for seed in (100, 101):
        K, R, T, _ = random_camera(seed)
        Ps.append(np.asarray(get_projection_matrix(K, R, T))[:3])
    P = np.stack(Ps)                                     # (2, 3, 4)
    return np.broadcast_to(P, (batch, 2, 3, 4)).copy()


@pytest.mark.slow
class TestCDRNetParity:
    def test_heatmaps_match(self):
        """End-to-end encoder -> pinv -> CanonicalFusion -> decoder parity.

        Heatmaps (pre-softmax) are compared instead of keypoints: with
        RANDOM weights the heatmaps are multi-peak noise, so soft-argmax
        chaotically amplifies fp32-level differences (which peak wins
        flips); trained checkpoints produce single dominant peaks where the
        decode is stable. soft-argmax + DLT parity are covered separately
        on controlled inputs (test_softargmax_parity_on_peaked_maps,
        tests/test_geometry.py).
        """
        from models.cdrnet import CDRNet as TorchCDRNet
        torch.manual_seed(2)
        model = TorchCDRNet(make_cfg(num_joints=19, num_layers=50))
        model.eval()
        variables = torch_state_dict_to_flax(model.state_dict())

        B = 2
        xs = [torch.randn(B, 3, 256, 256) for _ in range(2)]
        projs = stereo_projections(B)
        proj_t = [torch.tensor(projs[:, i], dtype=torch.float32)
                  for i in range(2)]
        # reference heatmaps, orchestrating the reference's own modules
        # exactly as CDRNet.forward does [ref models/cdrnet.py:224-244]
        with torch.no_grad():
            zs = [model.encoder(x) for x in xs]
            proj_inv_t = [torch.linalg.pinv(p) for p in proj_t]
            f_out = model.CF(zs, proj_t, proj_inv_t)
            hm_ref = np.stack(
                [model.decoder(f).numpy() for f in f_out], axis=1)

        net = CDRNet(num_joints=19, num_layers=50)
        imgs = jnp.asarray(np.stack(
            [x.numpy().transpose(0, 2, 3, 1) for x in xs], axis=1))
        _, _, hm = net.apply(variables, imgs, jnp.asarray(projs),
                             train=False, return_heatmaps=True)
        hm = np.asarray(hm).transpose(0, 1, 4, 2, 3)     # (B,V,J,h,w)

        assert hm.shape == hm_ref.shape
        assert rel_err(hm, hm_ref) < 2e-3, rel_err(hm, hm_ref)

    def test_softargmax_parity_on_peaked_maps(self):
        """soft-argmax == reference process_heatmap on realistic peaked
        heatmaps [ref models/cdrnet.py:120-149], and the full decode + DLT
        pipeline agrees on the resulting 3D points."""
        from fast3dhpe_tpu.ops.heatmap import soft_argmax
        import torch.nn.functional as F

        r = np.random.RandomState(3)
        B, J, H = 4, 19, 64
        mu = r.uniform(5, 58, size=(B, J, 2))
        ys, xs_ = np.mgrid[0:H, 0:H]
        hm = np.exp(-((xs_[None, None] - mu[..., 0, None, None]) ** 2 +
                      (ys[None, None] - mu[..., 1, None, None]) ** 2) / 18.0)
        hm = (hm * 10).astype(np.float32)                # peaked logits

        # reference torch implementation
        t = torch.tensor(hm)
        flat = F.softmax(t.reshape(B, J, -1), dim=2).reshape(B, J, H, H)
        gx, gy = torch.meshgrid(torch.arange(H, dtype=torch.float32),
                                torch.arange(H, dtype=torch.float32),
                                indexing="xy")
        cx = torch.sum(gx * flat, dim=[2, 3])
        cy = torch.sum(gy * flat, dim=[2, 3])
        expected = torch.stack([cx, cy], dim=-1).numpy()

        got = np.asarray(soft_argmax(
            jnp.asarray(hm.transpose(0, 2, 3, 1))))      # NHWC in
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-3)

    def test_gradients_flow_end_to_end(self):
        """3D loss produces nonzero encoder gradients (end-to-end path)."""
        net = CDRNet(num_joints=19, num_layers=18)
        B = 1
        imgs = jnp.asarray(np.random.RandomState(0)
                           .randn(B, 2, 64, 64, 3).astype(np.float32))
        projs = jnp.asarray(stereo_projections(B))
        variables = net.init(jax.random.PRNGKey(0), imgs, projs, train=False)

        def loss_fn(params):
            p2d, p3d = net.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                imgs, projs, train=False)
            return jnp.sum(p3d ** 2) * 1e-6

        grads = jax.grad(loss_fn)(variables["params"])
        g = np.asarray(grads["encoder"]["conv1"]["kernel"])
        assert np.isfinite(g).all()
        assert np.abs(g).max() > 0


class TestMultiView:
    def test_cdrnet_three_views(self):
        """n_views is parametric here (the reference hardcodes 2 in its
        out_layer ModuleList); DLT stacks 2V rows, so V=3 triangulates."""
        net = CDRNet(num_joints=19, num_layers=18, n_views=3)
        B, H = 2, 64
        r = np.random.RandomState(0)
        imgs = jnp.asarray(r.randn(B, 3, H, H, 3).astype(np.float32))
        base = stereo_projections(B)                  # (B, 2, 3, 4)
        third = base[:, :1].copy()
        third[:, 0, :, 3] += 100.0                    # offset third camera
        projs = jnp.asarray(np.concatenate([base, third], axis=1))
        variables = net.init(jax.random.PRNGKey(0), imgs, projs,
                             train=False)
        kp, p3d = net.apply(variables, imgs, projs, train=False)
        assert kp.shape == (B, 3, 19, 2)
        assert p3d.shape == (B, 19, 3)
        assert np.isfinite(np.asarray(p3d)).all()


class TestAllDepths:
    """Every spec'd ResNet depth builds and produces the right feature
    shape — including 34 and 152, untested until round 2. (The
    reference's 18/34 are DEAD code: its BasicBlock strides both convs
    and crashes [ref: models/encoder.py:13-14]; ours are the canonical
    blocks and work.)"""

    @pytest.mark.parametrize("depth,cout", [(18, 512), (34, 512),
                                            (50, 2048), (152, 2048)])
    def test_encoder_output_shape(self, depth, cout):
        from fast3dhpe_tpu.models.resnet import ResNetEncoder
        enc = ResNetEncoder(num_layers=depth)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = enc.init(jax.random.PRNGKey(0), x, train=False)
        out = enc.apply(variables, x, train=False)
        assert out.shape == (1, 2, 2, cout)

    def test_resnet34_trains(self):
        """Depth 34 runs a full train step with finite, non-zero
        gradients and updated params (the reference's 34 CRASHES — its
        BasicBlock strides both convs; convergence-speed assertions are
        covered at depth 18 where fitting is fast)."""
        import optax
        from fast3dhpe_tpu.models import PoseResNet, make_loss
        from fast3dhpe_tpu.train.state import TrainState
        from fast3dhpe_tpu.train.steps import make_train_step_2d
        from fast3dhpe_tpu.ops import render_gaussian_heatmaps
        r = np.random.RandomState(0)
        img = r.randn(4, 64, 64, 3).astype(np.float32)
        joints = r.uniform(5, 59, size=(4, 4, 2)).astype(np.float32)
        tgt, w = render_gaussian_heatmaps(joints, np.ones((4, 4), np.float32),
                                          (16, 16), (64, 64), 1)
        batch = {"image": jnp.asarray(img), "target": tgt,
                 "target_weight": w}
        model = PoseResNet(num_joints=4, num_layers=34)
        variables = model.init(jax.random.PRNGKey(0), batch["image"],
                               train=False)
        state = TrainState.create(variables, optax.adam(1e-3))
        step = make_train_step_2d(model, make_loss("JointsMSE", True,
                                                   layout="NHWC"))
        before = np.asarray(
            state.params["encoder"]["layer3_0"]["conv1"]["kernel"]).copy()
        state, m = step(state, batch)
        assert np.isfinite(float(m["loss"]))
        assert float(m["grad_norm"]) > 0 and np.isfinite(
            float(m["grad_norm"]))
        after = np.asarray(
            state.params["encoder"]["layer3_0"]["conv1"]["kernel"])
        assert not np.allclose(before, after)
