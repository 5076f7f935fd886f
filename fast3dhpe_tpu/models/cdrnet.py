"""CDRNet: camera-disentangled stereo 3D pose network.

TPU-first re-design of the reference CDRNet [ref: models/cdrnet.py:88-268]
(Remelli et al. 2020, arXiv:2004.02186):

- The two views are STACKED INTO THE BATCH for the shared encoder/decoder:
  one (B*V)-sized MXU-friendly batch instead of the reference's sequential
  per-view calls [ref: models/cdrnet.py:232-234, 244].
- The FTL (feature transform layer) bmm [ref: models/cdrnet.py:45-56]
  becomes a single einsum vectorized over views.
- The per-joint Python loop of SVD DLTs [ref: models/cdrnet.py:263-265]
  becomes one batched (B, J) one-sided Jacobi SVD (ops/small_svd.py).
- torch.linalg.pinv of the 3x4 projections [ref: models/cdrnet.py:236-237]
  uses the same batched Jacobi SVD (generic XLA svd costs 100x more here).

Gradients flow through soft-argmax and the DLT SVD back into the decoders,
fusion and encoder — the end-to-end 3D training path is preserved.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .resnet import ResNetEncoder
from .decoder import PoseDecoder
from .layers import conv2d, batch_norm, bn_row_mask
from ..geometry.triangulation import dlt_triangulate, pinv_projection
from ..ops.heatmap import soft_argmax


def ftl(x, proj, n_groups: int):
    """Feature Transform Layer: mix channel groups with a projection matrix.

    Reinterprets the (B, H, W, C) feature map as C/N-many N-vectors per
    pixel (channel-major groups, matching the reference's NCHW
    reshape(b, N, -1) memory layout [ref: models/cdrnet.py:45-56]) and
    left-multiplies by proj.

    Args:
      x: (B, H, W, N*g) features.
      proj: (B, M, N) transform (P: (3,4)->N=4 -> M=3; P^-1: (4,3)->N=3 -> M=4).
      n_groups: g = C // N.
    Returns:
      (B, H, W, M*g).
    """
    B, H, W, C = x.shape
    M, N = proj.shape[-2:]
    assert C == N * n_groups, (C, N, n_groups)
    xg = x.reshape(B, H, W, N, n_groups)
    out = jnp.einsum("bmn,bhwng->bhwmg", proj.astype(x.dtype), xg)
    return out.reshape(B, H, W, M * n_groups)


class CanonicalFusion(nn.Module):
    """Fuse per-view features in a camera-disentangled canonical space.
    [ref: models/cdrnet.py:10-85]

    Channel arithmetic is structural (for hid_ch1=300, hid_ch2=400):
    2048 -> conv1x1 -> 300 -> FTL(P^-1) -> 400 -> concat views -> 800
    -> conv1x1 x2 -> 400 -> FTL(P) -> 300 -> per-view conv1x1 -> 2048.
    """
    in_dim: int = 2048
    hid_ch1: int = 300
    hid_ch2: int = 400
    n_views: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, zs, proj, proj_inv, train: bool = False,
                 bn_mask=None):
        """
        Args:
          zs: (B, V, H, W, in_dim) per-view encoder features.
          proj: (B, V, 3, 4) projection matrices.
          proj_inv: (B, V, 4, 3) their right pseudo-inverses.
          bn_mask: optional (B, 1, 1, 1) bool (layers.bn_row_mask) —
            restricts train-mode BN batch statistics to valid rows; the
            view-stacked (B*V) BN sites repeat it per view.
        Returns:
          (B, V, H, W, in_dim) fused per-view features.
        """
        B, V, H, W, C = zs.shape
        assert V == self.n_views
        g1 = self.hid_ch1 // 3          # groups for FTL with P^-1 (N=3)
        g2 = self.hid_ch2 // 4          # groups for FTL with P (N=4)
        bn_mask_bv = (None if bn_mask is None
                      else jnp.repeat(bn_mask, V, axis=0))

        # conv_layer1 (shared across views): 1x1 conv + BN + ReLU
        x = zs.reshape(B * V, H, W, C)
        x = conv2d(self.hid_ch1, 1, 1, 0, "conv_layer1", self.dtype,
                   use_bias=True)(x)
        x = batch_norm(train, "conv_layer1_bn", self.dtype)(
            x, mask=bn_mask_bv)
        x = nn.relu(x)

        # FTL into the canonical frame, all views in one einsum
        pi = proj_inv.reshape(B * V, 4, 3)
        z = ftl(x, pi, g1)                              # (B*V, H, W, hid_ch2)

        # concat views along channels [ref: models/cdrnet.py:70]
        z = z.reshape(B, V, H, W, self.hid_ch2)
        z = jnp.moveaxis(z, 1, -2).reshape(B, H, W, V * self.hid_ch2)

        # conv_layer2: two 1x1 conv + BN + ReLU blocks
        f = conv2d(self.hid_ch2, 1, 1, 0, "conv_layer2_0", self.dtype,
                   use_bias=True)(z)
        f = batch_norm(train, "conv_layer2_0_bn", self.dtype)(
            f, mask=bn_mask)
        f = nn.relu(f)
        f = conv2d(self.hid_ch2, 1, 1, 0, "conv_layer2_1", self.dtype,
                   use_bias=True)(f)
        f = batch_norm(train, "conv_layer2_1_bn", self.dtype)(
            f, mask=bn_mask)
        f = nn.relu(f)                                  # (B, H, W, hid_ch2)

        # FTL back to each view, then per-view (unshared) output projection
        f_rep = jnp.broadcast_to(f[:, None], (B, V, H, W, self.hid_ch2))
        f_rep = f_rep.reshape(B * V, H, W, self.hid_ch2)
        p = proj.reshape(B * V, 3, 4)
        back = ftl(f_rep, p, g2)                        # (B*V, H, W, hid_ch1)
        back = back.reshape(B, V, H, W, self.hid_ch1)

        outs = []
        for i in range(V):
            o = conv2d(self.in_dim, 1, 1, 0, f"out_layer{i}", self.dtype,
                       use_bias=True)(back[:, i])
            o = batch_norm(train, f"out_layer{i}_bn", self.dtype)(
                o, mask=bn_mask)
            outs.append(nn.relu(o))
        return jnp.stack(outs, axis=1)                  # (B, V, H, W, in_dim)


class CDRNet(nn.Module):
    """Full stereo 3D network. [ref: models/cdrnet.py:88-268]"""
    num_joints: int = 19
    num_layers: int = 101
    n_views: int = 2
    fusion_hid_ch1: int = 300
    fusion_hid_ch2: int = 400
    dlt_method: str = "jacobi"
    # "xla" (default): jnp soft-argmax — XLA fuses it fully AND it shards
    # under the data-parallel mesh. "pallas": the fused Pallas kernel
    # (ops/pallas_softargmax.py) — numerically identical, single-chip
    # only (a bare pallas_call is opaque to the pjit partitioner).
    softargmax: str = "xla"
    # fuse bandwidth-bound eval-mode encoder Bottlenecks into Pallas
    # kernels (ops/pallas_bottleneck.py); off by default — XLA's conv
    # strategy wins at the shapes that matter on v5e (measured,
    # docs/PERFORMANCE.md); enable-and-measure per chip generation
    fused_inference: bool = False
    # rematerialize encoder blocks in the backward pass (training
    # bandwidth lever — see docs/PERFORMANCE.md train-step roofline)
    remat: bool = False
    # None = full per-block recompute; "convs" = save conv outputs,
    # recompute only BN/ReLU chains (models/resnet.py remat_policy)
    remat_policy: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, imgs, projs, train: bool = False,
                 return_heatmaps: bool = False, row_valid=None):
        """
        Args:
          imgs: (B, V, H, W, 3) normalized stereo images.
          projs: (B, V, 3, 4) projection matrices (image-space composed).
          return_heatmaps: also return the raw (B, V, h, w, J) heatmaps.
          row_valid: optional (B,) 0/1 — train-mode BN batch statistics
            are restricted to valid rows (padded loader rows excluded).
        Returns:
          pred_2d: (B, V, J, 2) keypoints in image pixels.
          pred_3d: (B, J, 3) triangulated world keypoints.
        """
        B, V, H, W, _ = imgs.shape
        assert V == self.n_views
        img_size = H
        mask_b = bn_row_mask(row_valid, ndim=4)         # (B, 1, 1, 1)
        mask_bv = (None if mask_b is None
                   else jnp.repeat(mask_b, V, axis=0))  # view-stacked

        x = imgs.reshape(B * V, H, W, 3)
        z = ResNetEncoder(num_layers=self.num_layers, dtype=self.dtype,
                          fused_inference=self.fused_inference,
                          remat=self.remat,
                          remat_policy=self.remat_policy,
                          name="encoder")(x, train, mask_bv)  # (B*V,h,w,C)
        fh, fw, in_dim = z.shape[1], z.shape[2], z.shape[3]
        zs = z.reshape(B, V, fh, fw, in_dim)

        proj_inv = pinv_projection(projs)               # (B, V, 4, 3)
        fused = CanonicalFusion(
            in_dim=in_dim, hid_ch1=self.fusion_hid_ch1,
            hid_ch2=self.fusion_hid_ch2, n_views=self.n_views,
            dtype=self.dtype, name="CF")(zs, projs, proj_inv, train,
                                         mask_b)

        h = PoseDecoder(num_joints=self.num_joints, dtype=self.dtype,
                        name="decoder")(
            fused.reshape(B * V, fh, fw, in_dim), train, mask_bv)
        heatmap_size = h.shape[1]

        # soft-argmax decode in fp32, scaled back to image coords
        # [ref: models/cdrnet.py:247-250]
        if self.softargmax == "pallas":
            from ..ops.pallas_softargmax import soft_argmax_fused
            kp = soft_argmax_fused(h.astype(jnp.float32))
        else:
            kp = soft_argmax(h.astype(jnp.float32))     # (B*V, J, 2)
        kp = kp * (img_size / heatmap_size)
        kp = kp.reshape(B, V, self.num_joints, 2)

        # batched differentiable DLT over all (B, J) joints
        # [ref: models/cdrnet.py:252-265]
        proj_j = jnp.broadcast_to(
            projs[:, None], (B, self.num_joints, V, 3, 4))
        kp_j = jnp.swapaxes(kp, 1, 2)                   # (B, J, V, 2)
        pred_3d = dlt_triangulate(proj_j, kp_j, method=self.dlt_method)

        if return_heatmaps:
            hm = h.reshape(B, V, heatmap_size, h.shape[2], self.num_joints)
            return kp, pred_3d, hm
        return kp, pred_3d

    @classmethod
    def from_config(cls, cfg, dtype=jnp.float32, fused_inference=False):
        return cls(num_joints=cfg.MODEL.NUM_JOINTS,
                   num_layers=cfg.MODEL.NUM_LAYERS,
                   dlt_method=cfg.MODEL.EXTRA.DLT_METHOD,
                   fused_inference=fused_inference, dtype=dtype)
