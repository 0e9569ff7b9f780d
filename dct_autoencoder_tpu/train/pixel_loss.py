"""Differentiable RGB-space pixel loss (reference: main.py:95-110).

The reference can train with an MSE in pixel space: decoded DCT patches are
unpatched, inverse-DCT'd, converted IPT->RGB, and compared to the originals —
all differentiable in torch's eager mode.  The TPU-native version requires
static shapes, so it targets bucketed training (all images in the batch share
one (ph, pw) patch grid and pixel size):

  tokens --scatter--> (max_images, c, ph, pw, p*p) canvases --reshape-->
  DCT planes --IDCT (matmul)--> pixels --IPT->RGB--> masked MSE vs targets.

Every step is jit-differentiable; the scatter uses a trash slot for padding
tokens.  Image count per batch varies (stochastic token budgets), so canvases
are allocated for `max_images` slots and masked by a validity vector.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.colorspace import ipt_to_rgb
from ..ops.dct import idct2
from ..patches.container import DCTPatches


def unpatch_to_images(
    patches: jnp.ndarray,  # (b, s, p*p) decoded DCT patch tokens
    batch: DCTPatches,
    row_offsets: jnp.ndarray,  # (b,) global image-index offset per row
    grid: Tuple[int, int],  # (ph, pw) shared patch grid
    patch_size: int,
    channels: int,
    max_images: int,
) -> jnp.ndarray:
    """Scatter packed tokens onto per-image pixel canvases; returns
    (max_images, c, ph*p, pw*p) RGB images (unused slots are zeros)."""
    ph, pw = grid
    p = patch_size
    c = channels
    b, s, pz = patches.shape

    gid = row_offsets[:, None] + batch.batched_image_ids  # (b, s)
    valid = ~batch.key_pad_mask
    flat_idx = ((gid * c + batch.patch_channels) * ph + batch.h_indices) * pw + batch.w_indices
    trash = max_images * c * ph * pw
    flat_idx = jnp.where(valid, flat_idx, trash)

    canvas = jnp.zeros((max_images * c * ph * pw + 1, pz), dtype=jnp.float32)
    canvas = canvas.at[flat_idx.reshape(-1)].set(
        patches.reshape(-1, pz).astype(jnp.float32)
    )
    canvas = canvas[:-1].reshape(max_images, c, ph, pw, p, p)
    dct_planes = canvas.transpose(0, 1, 2, 4, 3, 5).reshape(max_images, c, ph * p, pw * p)
    return ipt_to_rgb(idct2(dct_planes))


def pixel_loss(
    rec_patches: jnp.ndarray,
    batch: DCTPatches,
    pixel_targets: jnp.ndarray,  # (max_images, c, H, W) RGB originals
    image_valid: jnp.ndarray,  # (max_images,) bool
    row_offsets: jnp.ndarray,
    grid: Tuple[int, int],
    patch_size: int,
) -> jnp.ndarray:
    """Masked mean-squared error in RGB space over the valid image slots."""
    c = pixel_targets.shape[1]
    max_images = pixel_targets.shape[0]
    rec = unpatch_to_images(
        rec_patches, batch, row_offsets, grid, patch_size, c, max_images
    )
    se = (rec - pixel_targets.astype(jnp.float32)) ** 2
    se = se * image_valid[:, None, None, None]
    denom = jnp.maximum(image_valid.sum(), 1) * np_prod(se.shape[1:])
    return se.sum() / denom


def np_prod(shape) -> int:
    out = 1
    for s in shape:
        out *= int(s)
    return out


def make_row_offsets(batch: DCTPatches) -> Tuple[jnp.ndarray, int]:
    """Host-side: per-row global image offsets + image count (see patchnorm)."""
    import numpy as np

    ids = np.asarray(batch.batched_image_ids)
    pad = np.asarray(batch.key_pad_mask)
    n_per_row = np.where((~pad).any(axis=1), ids.max(axis=1, where=~pad, initial=0) + 1, 0)
    offsets = np.concatenate([[0], np.cumsum(n_per_row)])[:-1].astype(np.int32)
    return jnp.asarray(offsets), int(n_per_row.sum())
