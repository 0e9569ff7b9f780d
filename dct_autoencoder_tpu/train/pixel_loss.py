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

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.colorspace import ipt_to_rgb
from ..ops.dct import idct2
from ..patches.container import DCTPatches


def unpatch_to_planes(
    patches: jnp.ndarray,  # (b, s, p*p) decoded DCT patch tokens
    batch: DCTPatches,
    row_offsets: jnp.ndarray,  # (b,) global image-index offset per row
    grid: Tuple[int, int],  # (ph, pw) shared patch grid
    patch_size: int,
    channels: int,
    max_images: int,
) -> jnp.ndarray:
    """Scatter packed tokens onto per-image DCT planes, wholly inside jit;
    returns (max_images, c, ph*p, pw*p) planes (unused slots are zeros).
    The in-jit counterpart of extractor.revert_patching — also used by the
    serving pipeline's fused reconstruct path."""
    ph, pw = grid
    p = patch_size
    c = channels
    b, s, pz = patches.shape

    gid = row_offsets[:, None] + batch.batched_image_ids  # (b, s)
    valid = (~batch.key_pad_mask) & (gid < max_images)  # overflow images -> trash
    flat_idx = ((gid * c + batch.patch_channels) * ph + batch.h_indices) * pw + batch.w_indices
    trash = max_images * c * ph * pw
    flat_idx = jnp.where(valid, flat_idx, trash)

    canvas = jnp.zeros((max_images * c * ph * pw + 1, pz), dtype=jnp.float32)
    canvas = canvas.at[flat_idx.reshape(-1)].set(
        patches.reshape(-1, pz).astype(jnp.float32)
    )
    canvas = canvas[:-1].reshape(max_images, c, ph, pw, p, p)
    return canvas.transpose(0, 1, 2, 4, 3, 5).reshape(max_images, c, ph * p, pw * p)


def unpatch_to_images(
    patches: jnp.ndarray,
    batch: DCTPatches,
    row_offsets: jnp.ndarray,
    grid: Tuple[int, int],
    patch_size: int,
    channels: int,
    max_images: int,
) -> jnp.ndarray:
    """Scatter packed tokens onto per-image pixel canvases; returns
    (max_images, c, ph*p, pw*p) RGB images (unused slots are zeros)."""
    planes = unpatch_to_planes(
        patches, batch, row_offsets, grid, patch_size, channels, max_images
    )
    return ipt_to_rgb(idct2(planes))


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


def row_image_layout(batch: DCTPatches) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """In-jit per-row (global image offset, image count) arrays.

    Rows contribute their packed images in order, so row r's images occupy
    global slots [offsets[r], offsets[r] + n_per_row[r]).  Packing never
    splits an image across rows, so slot ranges of distinct rows are disjoint
    — the property micro-batch slicing relies on.
    """
    ids = batch.batched_image_ids
    pad = batch.key_pad_mask
    any_valid = (~pad).any(axis=1)
    max_id = jnp.max(jnp.where(pad, -1, ids), axis=1)
    n_per_row = jnp.where(any_valid, max_id + 1, 0).astype(jnp.int32)
    offsets = (jnp.cumsum(n_per_row) - n_per_row).astype(jnp.int32)
    return offsets, n_per_row


def row_offsets_in_jit(batch: DCTPatches) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """In-jit per-row global image offsets + total image count."""
    offsets, n_per_row = row_image_layout(batch)
    return offsets, n_per_row.sum()


def packed_pixel_loss(
    rec_patches: jnp.ndarray,  # (b, s, p*p) decoded UNNORMALIZED DCT tokens
    target_patches: jnp.ndarray,  # (b, s, p*p) target UNNORMALIZED DCT tokens
    batch: DCTPatches,
    grid_sizes: jnp.ndarray,  # (max_images, 2) per-image (ph, pw); 0 = empty slot
    grid: Tuple[int, int],  # (max_patch_h, max_patch_w) static canvas grid
    patch_size: int,
    channels: int,
    row_offsets: Optional[jnp.ndarray] = None,  # (b,) global image offsets
    slot_valid: Optional[jnp.ndarray] = None,  # (max_images,) slots to average
) -> jnp.ndarray:
    """Reference-parity RGB pixel loss, computed wholly inside jit.

    The reference's pixel loss (main.py:95-110) compares
    postprocess(inv_normalize(output)) against
    postprocess(inv_normalize(normalized_batch)) — i.e. the TARGET is itself a
    token reconstruction, so no raw pixels need to be plumbed through the data
    path.  Both sides here run the differentiable unpatch->IDCT->IPT->RGB on
    shared (max_images, c, PH*p, PW*p) canvases and the per-image MSEs are
    averaged, matching the reference's `sum(mse(im, im_hat)) / n_images`.

    Deviation (documented): the reference zero-pads each DCT plane to the
    ORIGINAL image size before the IDCT (feature_extraction...py:289-310);
    we evaluate at the crop/grid resolution instead.  The orthonormal pad+IDCT
    preserves the sum of squared DCT-coefficient differences exactly
    (Parseval), so the two only differ through the IPT->RGB nonlinearity —
    and a static canvas is what XLA needs.  Images that overflow `max_images`
    slots or whose grid exceeds the canvas are excluded from the average.
    """
    max_images = grid_sizes.shape[0]
    if row_offsets is None:
        # whole-batch mode: image slots are this batch's packing order
        offsets, n_images = row_offsets_in_jit(batch)
        slot_valid = jnp.arange(max_images) < n_images
    else:
        # micro-batch mode (grad accumulation): the caller passes GLOBAL
        # per-row image offsets and the slot window this micro-batch owns,
        # so grid_sizes (built once for the full batch) stay aligned
        offsets = row_offsets
        assert slot_valid is not None
    rec = unpatch_to_images(
        rec_patches, batch, offsets, grid, patch_size, channels, max_images
    )
    tgt = unpatch_to_images(
        target_patches, batch, offsets, grid, patch_size, channels, max_images
    )
    se = jnp.sum((rec - tgt) ** 2, axis=(1, 2, 3))  # (max_images,)
    denom = (
        channels * grid_sizes[:, 0] * patch_size * grid_sizes[:, 1] * patch_size
    ).astype(jnp.float32)
    slot_valid = slot_valid & (grid_sizes[:, 0] > 0)
    per_image = jnp.where(slot_valid, se / jnp.maximum(denom, 1.0), 0.0)
    return per_image.sum() / jnp.maximum(slot_valid.sum(), 1)


def make_grid_sizes(batch: DCTPatches, max_images: int, clip_grid: Tuple[int, int]):
    """Host-side: (max_images, 2) per-image patch grids, clipped to the canvas.

    Images beyond max_images are dropped from the loss (slot 0-padded); grids
    are clipped to (max_patch_h, max_patch_w) because tokens outside that grid
    were already dropped at preprocess time.
    """
    import numpy as np

    gs = np.zeros((max_images, 2), dtype=np.int32)
    for i, (ph, pw) in enumerate(batch.patch_sizes[:max_images]):
        gs[i] = (min(ph, clip_grid[0]), min(pw, clip_grid[1]))
    return jnp.asarray(gs)


def make_row_offsets(batch: DCTPatches) -> Tuple[jnp.ndarray, int]:
    """Host-side: per-row global image offsets + image count (see patchnorm)."""
    import numpy as np

    ids = np.asarray(batch.batched_image_ids)
    pad = np.asarray(batch.key_pad_mask)
    n_per_row = np.where((~pad).any(axis=1), ids.max(axis=1, where=~pad, initial=0) + 1, 0)
    offsets = np.concatenate([[0], np.cumsum(n_per_row)])[:-1].astype(np.int32)
    return jnp.asarray(offsets), int(n_per_row.sum())
