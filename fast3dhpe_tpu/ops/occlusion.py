"""On-device occlusion augmentations: Cutout and Hide-and-Seek.

PRNG-keyed, batched jnp re-designs of /root/reference/tools/augmentation.py.
The reference mutates numpy images per sample on the host; here a whole
batch is masked in one fused device op, and the boolean keep-masks are
returned so the caller can zero joint visibility [ref: dataset/mads_3d.py:218-221,
tools/visualize.py].

Both fill occluded pixels with the constant 128 (gray), matching the
reference [ref: tools/augmentation.py:44, 100].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

FILL_VALUE = 128.0


@partial(jax.jit, static_argnames=("n_holes", "length"))
def cutout(key, images, n_holes: int = 6, length: int = 40):
    """Cutout: n random length x length squares set to gray.
    [ref: tools/augmentation.py:5-49; defaults from dataset/base.py:41]

    Args:
      key: PRNG key.
      images: (B, H, W, C).
    Returns:
      (images_out, keep_mask) where keep_mask is (B, H, W) True where the
      image is NOT occluded (reference returns mask[..., 0] of the same
      meaning).
    """
    images = jnp.asarray(images)
    B, H, W, C = images.shape
    ky, kx = jax.random.split(key)
    # reference: np.random.randint(h) / randint(w) — uniform over [0, h)
    cy = jax.random.randint(ky, (B, n_holes), 0, H)
    cx = jax.random.randint(kx, (B, n_holes), 0, W)

    y1 = jnp.clip(cy - length // 2, 0, H)
    y2 = jnp.clip(cy + length // 2, 0, H)
    x1 = jnp.clip(cx - length // 2, 0, W)
    x2 = jnp.clip(cx + length // 2, 0, W)

    ys = jnp.arange(H)[None, None, :]                   # (1, 1, H)
    xs = jnp.arange(W)[None, None, :]                   # (1, 1, W)
    in_y = (ys >= y1[..., None]) & (ys < y2[..., None])  # (B, n, H)
    in_x = (xs >= x1[..., None]) & (xs < x2[..., None])  # (B, n, W)
    hole = jnp.any(in_y[:, :, :, None] & in_x[:, :, None, :], axis=1)  # (B,H,W)

    out = jnp.where(hole[..., None], jnp.asarray(FILL_VALUE, images.dtype),
                    images)
    return out, ~hole


@partial(jax.jit, static_argnames=("n_patches", "p_hide"))
def hide_n_seek(key, images, n_patches: int = 4, p_hide: float = 0.4):
    """Hide-and-Seek: hide a fixed fraction of an n x n grid of patches.
    [ref: tools/augmentation.py:52-105]

    The reference picks exactly int(p_hide * n^2) cells without replacement;
    we reproduce that by ranking uniform scores per cell (top-k without
    replacement, jit-safe).

    Returns:
      (images_out, keep_mask (B, H, W)).
    """
    images = jnp.asarray(images)
    B, H, W, C = images.shape
    length = H // n_patches
    n_cells = n_patches * n_patches
    n_hide = int(p_hide * n_cells)

    scores = jax.random.uniform(key, (B, n_cells))
    order = jnp.argsort(scores, axis=-1)
    ranks = jnp.argsort(order, axis=-1)                  # rank of each cell
    hide_cell = (ranks < n_hide).reshape(B, n_patches, n_patches)

    # cell (gy, gx) covers rows [gy*length, min((gy+1)*length, H))
    ys = jnp.arange(H)
    xs = jnp.arange(W)
    cell_y = jnp.clip(ys // length, 0, n_patches - 1)    # (H,)
    cell_x = jnp.clip(xs // length, 0, n_patches - 1)    # (W,)
    # reference's grid leaves the remainder rows/cols (H - n*length) attached
    # to the last cell only via np.clip of y2/x2; rows >= n*length are never
    # hidden there. Replicate: mark out-of-grid rows as never hidden.
    in_grid_y = ys < n_patches * length
    in_grid_x = xs < n_patches * length

    hole = hide_cell[:, cell_y][:, :, cell_x]            # (B, H, W)
    hole = hole & in_grid_y[None, :, None] & in_grid_x[None, None, :]

    out = jnp.where(hole[..., None], jnp.asarray(FILL_VALUE, images.dtype),
                    images)
    return out, ~hole
