"""Loss assembly for autoencoder training.

Pure-functional port of the reference's step logic (reference: main.py:44-112):
masked L1 in normalized DCT space (weight 0.1), masked L1 in unnormalized DCT
space (weight 1.0), LFQ commit loss (0.1), MaskGIT entropy loss (0.1), plus
codebook perplexity as a metric.  DCT features are treated as Laplace
distributed, hence L1 (reference main.py:69-71).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..models.autoencoder import DCTAutoencoderModule
from ..models.patchnorm import PatchNormState, inverse_patchnorm
from ..ops.stats import calculate_perplexity, compute_entropy_loss
from ..patches.container import DCTPatches

# reference main.py:311-314
DEFAULT_LOSS_WEIGHTS = dict(
    rec_loss_unnormalized=1.0,
    rec_loss=0.1,
    commit_loss=0.1,
    entropy_loss=0.1,
)


def masked_l1(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean |pred-target| over valid tokens (== F.l1_loss(pred[mask], target[mask]))."""
    diff = jnp.abs(pred - target) * mask[..., None]
    denom = jnp.maximum(mask.sum() * pred.shape[-1], 1)
    return diff.sum() / denom


def step_autoencoder(
    module: DCTAutoencoderModule,
    params: Any,
    patchnorm: PatchNormState,
    batch: DCTPatches,
    normalized_batch: DCTPatches,
    training: bool = True,
    pixel_grid_sizes: Optional[jnp.ndarray] = None,
    pixel_rows: Optional[Any] = None,
    rng: Optional[jnp.ndarray] = None,
    vq_stats: Optional[Any] = None,
) -> Dict[str, jnp.ndarray]:
    """One forward pass + loss dict (reference main.py:44-112).

    pixel_grid_sizes != None enables the differentiable RGB pixel loss
    (reference decode_pixels=True, main.py:95-110): a (max_images, 2) array of
    per-image patch grids (see pixel_loss.make_grid_sizes).  The whole
    unpatch -> IDCT -> IPT->RGB chain is inside this jitted step and
    backpropagated through, exactly like the reference's eager autograd.
    pixel_rows (grad accumulation) carries (row_offsets, slot_valid) mapping
    this micro-batch's rows onto GLOBAL image slots of pixel_grid_sizes.

    vq_stats != None (VQ mode) applies with mutable=['vq_stats'] so the EMA
    affine/usage statistics update; the new state is returned under the
    'vq_stats' key (and the pre-quantization projections under 'vq_z') —
    the train step threads them.  rng drives gumbel code sampling.
    """
    rngs = {"vq": rng} if rng is not None else None
    if vq_stats is not None:
        out, new_vars = module.apply(
            {"params": params, "vq_stats": vq_stats},
            normalized_batch,
            training=training,
            rngs=rngs,
            mutable=["vq_stats"],
        )
    else:
        out = module.apply(
            {"params": params}, normalized_batch, training=training, rngs=rngs
        )
        new_vars = None
    output_patches: DCTPatches = out["dct_patches"]
    mask = ~output_patches.key_pad_mask

    losses: Dict[str, jnp.ndarray] = {}

    if training and module.config.vq_type == "lfq":
        losses["entropy_loss"] = compute_entropy_loss(out["distances"], mask)
    else:
        losses["entropy_loss"] = jnp.zeros(())

    losses["rec_loss"] = masked_l1(output_patches.patches, normalized_batch.patches, mask)
    losses["commit_loss"] = out["commit_loss"]

    unnormalized = inverse_patchnorm(patchnorm, output_patches)
    losses["rec_loss_unnormalized"] = masked_l1(unnormalized, batch.patches, mask)

    if pixel_grid_sizes is not None:
        from .pixel_loss import packed_pixel_loss

        cfg = module.config
        # reference target: postprocess(inv_normalize_(normalized_batch))
        # (main.py:96-98) — the input tokens pushed back through the inverse
        # norm, NOT the raw pixels (clamped-normalization effects included)
        target = jax.lax.stop_gradient(
            inverse_patchnorm(patchnorm, normalized_batch)
        )
        row_offsets, slot_valid = pixel_rows if pixel_rows is not None else (None, None)
        losses["pixel_loss"] = packed_pixel_loss(
            unnormalized,
            target,
            output_patches,
            pixel_grid_sizes,
            (cfg.max_patch_h, cfg.max_patch_w),
            cfg.patch_size,
            cfg.image_channels,
            row_offsets=row_offsets,
            slot_valid=slot_valid,
        )

    # metrics (stop-gradient)
    codes = out["codes"]
    null_codes = jnp.where(mask[..., None], codes, -1)
    losses["perplexity"] = jax.lax.stop_gradient(
        calculate_perplexity(null_codes, module.config.vq_codebook_size)
    )
    losses["codes"] = codes
    losses["rec_patches"] = output_patches.patches
    if new_vars is not None:
        losses["vq_stats"] = jax.lax.stop_gradient(new_vars.get("vq_stats", {}))
        losses["vq_z"] = jax.lax.stop_gradient(out.get("vq_z"))
    return losses


def weighted_total(
    losses: Dict[str, jnp.ndarray],
    loss_weights: Optional[Dict[str, float]] = None,
    warmup_dict: Optional[Dict[str, int]] = None,
    global_step: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Weighted loss sum with optional per-term linear warmup (main.py:223-237).

    Weights may be Python floats (compile-time constants, the normal path) or
    traced jnp scalars (the shared-program sweep: hyperparams ride as jit
    ARGUMENTS so trials with different weights reuse ONE device program —
    remote compiles are minutes each, train/sweep.py).  The `w == 0` term-skip
    is only applied to static floats; a traced weight always contributes.
    """
    weights = dict(DEFAULT_LOSS_WEIGHTS)
    if loss_weights:
        weights.update(loss_weights)
    total = jnp.zeros(())
    for k, v in losses.items():
        if not k.endswith("loss"):
            continue
        w = weights.get(k, 1.0)
        if warmup_dict and k in warmup_dict and global_step is not None:
            warm = warmup_dict[k]
            frac = jnp.minimum((global_step + 1.0) / warm, 1.0)
            w = w * frac
        if isinstance(w, (int, float)) and w == 0.0:
            continue
        total = total + v * w
    return total
