"""Checkpoint interop: flax -> torch export loads into the reference models
(strict) with matching outputs; torch -> flax -> torch round-trips."""

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
    torch_state_dict_to_flax, flax_to_torch_state_dict)


def make_cfg(num_joints=19, num_layers=50):
    cfg = types.SimpleNamespace()
    cfg.MODEL = types.SimpleNamespace(
        NUM_JOINTS=num_joints, NUM_LAYERS=num_layers)
    return cfg


@pytest.mark.slow
class TestExport:
    def test_flax_init_loads_into_torch_poseresnet_strict(self):
        net = PoseResNet(num_joints=19, num_layers=50)
        variables = net.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 64, 64, 3)), train=False)
        sd = {k: torch.tensor(np.asarray(v)) for k, v in
              flax_to_torch_state_dict(variables).items()}

        from models.poseresnet import PoseResNet as TorchPoseResNet
        model = TorchPoseResNet(make_cfg())
        model.load_state_dict(sd, strict=True)   # raises on any mismatch
        model.eval()

        x = torch.randn(1, 3, 128, 128)
        with torch.no_grad():
            y_ref = model(x).numpy()
        y = net.apply(variables,
                      jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                      train=False)
        y = np.asarray(y).transpose(0, 3, 1, 2)
        scale = max(np.abs(y_ref).max(), 1e-6)
        assert np.abs(y - y_ref).max() / scale < 2e-3

    def test_flax_init_loads_into_torch_cdrnet_strict(self):
        net = CDRNet(num_joints=19, num_layers=50)
        imgs = jnp.zeros((1, 2, 64, 64, 3))
        projs = jnp.broadcast_to(
            jnp.asarray([[600.0, 0, 32, 0], [0, 600.0, 32, 0],
                         [0, 0, 1, 3000.0]]), (1, 2, 3, 4))
        variables = net.init(jax.random.PRNGKey(1), imgs, projs,
                             train=False)
        sd = {k: torch.tensor(np.asarray(v)) for k, v in
              flax_to_torch_state_dict(variables).items()}

        from models.cdrnet import CDRNet as TorchCDRNet
        model = TorchCDRNet(make_cfg())
        model.load_state_dict(sd, strict=True)

    def test_torch_to_flax_to_torch_roundtrip(self):
        from models.poseresnet import PoseResNet as TorchPoseResNet
        torch.manual_seed(5)
        model = TorchPoseResNet(make_cfg())
        sd = model.state_dict()
        back = flax_to_torch_state_dict(torch_state_dict_to_flax(sd))
        for k, v in sd.items():
            if k.endswith("num_batches_tracked"):
                continue
            np.testing.assert_allclose(
                back[k], v.numpy(), atol=1e-6,
                err_msg=f"round-trip mismatch for {k}")
        assert set(back.keys()) == set(sd.keys())
