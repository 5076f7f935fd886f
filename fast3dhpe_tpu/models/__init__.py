"""Neural networks (flax.linen, NHWC) + losses + metrics."""

from .resnet import ResNetEncoder  # noqa: F401
from .decoder import PoseDecoder  # noqa: F401
from .poseresnet import PoseResNet  # noqa: F401
from .cdrnet import CDRNet, CanonicalFusion  # noqa: F401
from .losses import (  # noqa: F401
    joints_mse_loss,
    joints_mse_smooth_loss,
    mpjpe_loss,
    make_loss,
)
from .metrics import pck_accuracy, calc_mpjpe  # noqa: F401
