"""PatchNorm — per-(channel, row, col, coeff) running Laplace normalization.

Functional re-design of the reference module (reference:
dct_autoencoder/patchnorm.py:32-177).  State is a pytree of three arrays:
`n` (c, H, W) observation counts, `median` (c, H, W, pz) running medians, and
`b` (c, H, W, pz) running mean-absolute-deviations.  Normalization divides by
std = b * sqrt(2) (Laplace), clamps to ±6.

The calibration update replaces the reference's triple Python loop over
(c, i, j) buckets computing masked medians (patchnorm.py:121-130 — O(3·32·32)
host-synced median calls) with ONE dense scatter + a single masked sort along
the image axis: every image contributes at most one patch per (c, h, w)
position, so scattering tokens onto an (n_images, c, H, W, pz) canvas makes
the per-bucket median a vectorized sorted-gather.  Matches the reference's
merge algorithm (count-weighted average of batch medians — an approximation,
preserved for parity, patchnorm.py:133-150) and torch.median's lower-middle
convention.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..patches.container import DCTPatches


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PatchNormState:
    n: jnp.ndarray  # (c, H, W)
    median: jnp.ndarray  # (c, H, W, pz)
    b: jnp.ndarray  # (c, H, W, pz)

    @staticmethod
    def create(channels: int, max_patch_h: int, max_patch_w: int, patch_dim: int) -> "PatchNormState":
        return PatchNormState(
            n=jnp.zeros((channels, max_patch_h, max_patch_w), dtype=jnp.float32),
            median=jnp.zeros((channels, max_patch_h, max_patch_w, patch_dim), dtype=jnp.float32),
            b=jnp.ones((channels, max_patch_h, max_patch_w, patch_dim), dtype=jnp.float32),
        )


EPS = 1e-6
MAX_VAL = 6.0
MIN_VAL = -6.0


def _gather(state_arr: jnp.ndarray, x: DCTPatches) -> jnp.ndarray:
    return state_arr[x.patch_channels, x.h_indices, x.w_indices]


def patchnorm_std(state: PatchNormState) -> jnp.ndarray:
    """Laplace std = b * sqrt(2) (reference patchnorm.py:76-78)."""
    return state.b * 2**0.5


def apply_patchnorm(state: PatchNormState, x: DCTPatches) -> jnp.ndarray:
    """Normalize packed patches with frozen stats (reference patchnorm.py:157-165)."""
    medians = _gather(state.median, x)
    std = _gather(state.b, x) * 2**0.5 + EPS
    patches = (x.patches - medians) / std
    return jnp.clip(patches, MIN_VAL, MAX_VAL)


def inverse_patchnorm(state: PatchNormState, x: DCTPatches) -> jnp.ndarray:
    """Inverse of apply_patchnorm (reference patchnorm.py:167-177)."""
    medians = _gather(state.median, x)
    std = _gather(state.b, x) * 2**0.5 + EPS
    return x.patches * std + medians


@partial(jax.jit, static_argnames=("n_images",))
def update_patchnorm(
    state: PatchNormState,
    patches: jnp.ndarray,  # (b, s, pz)
    channels: jnp.ndarray,  # (b, s)
    positions: jnp.ndarray,  # (b, s, 2)
    key_pad_mask: jnp.ndarray,  # (b, s) True where padding
    image_ids: jnp.ndarray,  # (b, s) per-row image ids
    row_offsets: jnp.ndarray,  # (b,) global image-index offset per row
    n_images: int,
) -> Tuple[PatchNormState, jnp.ndarray]:
    """One online calibration step (reference patchnorm.py:101-155).

    Returns (new_state, patches zero-filled at padding) — the reference
    returns the *raw* (not normalized) patches during calibration.
    """
    c, H, W, pz = state.median.shape
    b, s, _ = patches.shape

    valid = ~key_pad_mask
    ch = channels
    hh = positions[..., 0]
    ww = positions[..., 1]

    # flat bucket index per token; padding routed to a trash bucket
    bucket = (ch * H + hh) * W + ww  # (b, s) in [0, c*H*W)
    bucket = jnp.where(valid, bucket, c * H * W)

    ones = valid.astype(jnp.float32)
    batch_n_flat = jax.ops.segment_sum(
        ones.reshape(-1), bucket.reshape(-1), num_segments=c * H * W + 1
    )[:-1]
    batch_n = batch_n_flat.reshape(c, H, W)

    # dense canvas: every image fills each (c,h,w) position at most once
    gid = row_offsets[:, None] + image_ids  # (b, s)
    canvas_idx = gid * (c * H * W) + jnp.where(valid, (ch * H + hh) * W + ww, 0)
    canvas_idx = jnp.where(valid, canvas_idx, n_images * c * H * W)  # trash slot

    canvas = jnp.full((n_images * c * H * W + 1, pz), jnp.inf, dtype=jnp.float32)
    canvas = canvas.at[canvas_idx.reshape(-1)].set(
        patches.reshape(-1, pz).astype(jnp.float32)
    )
    canvas = canvas[:-1].reshape(n_images, c * H * W, pz)

    # masked median over the image axis: +inf sorts to the end, so the
    # median of cnt values sits at sorted index (cnt-1)//2 (torch lower-middle)
    canvas_sorted = jnp.sort(canvas, axis=0)
    cnt = batch_n_flat.astype(jnp.int32)  # (c*H*W,)
    take = jnp.clip((cnt - 1) // 2, 0, n_images - 1)
    batch_median = jnp.take_along_axis(canvas_sorted, take[None, :, None], axis=0)[0]
    batch_median = jnp.where((cnt > 0)[:, None], batch_median, 0.0)
    batch_median = batch_median.reshape(c, H, W, pz)

    n_old = state.n
    denom = jnp.clip(n_old + batch_n, 1.0, None)[..., None]
    new_median = (
        state.median * n_old[..., None] + batch_median * batch_n[..., None]
    ) / denom

    # MAD against the *updated* median (reference patchnorm.py:140)
    med_tok = new_median.reshape(c * H * W, pz)[
        jnp.where(valid, (ch * H + hh) * W + ww, 0)
    ]
    dist = jnp.abs(patches.astype(jnp.float32) - med_tok)
    dist = jnp.where(valid[..., None], dist, 0.0)
    batch_b_flat = jax.ops.segment_sum(
        dist.reshape(-1, pz), bucket.reshape(-1), num_segments=c * H * W + 1
    )[:-1]
    batch_b = batch_b_flat.reshape(c, H, W, pz) / jnp.clip(batch_n, 1.0, None)[..., None]

    new_b = (state.b * n_old[..., None] + batch_b * batch_n[..., None]) / denom
    new_n = n_old + batch_n

    new_state = PatchNormState(n=new_n, median=new_median, b=new_b)
    out = jnp.where(valid[..., None], patches, 0.0)
    return new_state, out


def calibrate_patchnorm_batch(state: PatchNormState, batch: DCTPatches) -> Tuple[PatchNormState, jnp.ndarray]:
    """Convenience wrapper computing per-row image offsets on host."""
    ids = np.asarray(batch.batched_image_ids)
    pad = np.asarray(batch.key_pad_mask)
    n_per_row = np.where((~pad).any(axis=1), ids.max(axis=1, where=~pad, initial=0) + 1, 0)
    row_offsets = np.concatenate([[0], np.cumsum(n_per_row)])[:-1].astype(np.int32)
    n_images = int(n_per_row.sum())
    return update_patchnorm(
        state,
        batch.patches,
        batch.patch_channels,
        batch.patch_positions,
        batch.key_pad_mask,
        batch.batched_image_ids,
        jnp.asarray(row_offsets),
        n_images,
    )
