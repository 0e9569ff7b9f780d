"""Model + processor factory (reference: dct_autoencoder/factory.py)."""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp

from ..patches.extractor import DCTAutoencoderFeatureExtractor
from .autoencoder import DCTAutoencoder
from .config import DCTAutoencoderConfig


def power_of_two(target: int) -> int:
    """Smallest power of two >= target (reference util.py:184-189)."""
    if target > 1:
        for i in range(1, int(target)):
            if 2**i >= target:
                return 2**i
    return 1


def get_max_seq_length(
    model_config: DCTAutoencoderConfig, sample_patches_beta: float, cdf_p: float = 0.95
) -> int:
    """Derive max_seq_len from the exponential CDF (reference factory.py:11-33).

    Picks x with F(x; beta) = cdf_p, rounds to a power of two, caps at the full
    lossless grid size max_patch_h * max_patch_w * channels.
    """
    cap = model_config.max_patch_h * model_config.max_patch_w * model_config.image_channels
    if sample_patches_beta <= 0:
        return cap
    max_seq_len = round(-1 * math.log(1 - cdf_p) / sample_patches_beta)
    max_seq_len = power_of_two(max_seq_len)
    return min(cap, max_seq_len)


def get_model_and_processor(
    model_config: Optional[DCTAutoencoderConfig] = None,
    dtype=jnp.float32,
    sample_patches_beta: float = 0.02,
    resume_path: Optional[str] = None,
    seed: int = 0,
) -> Tuple[DCTAutoencoder, DCTAutoencoderFeatureExtractor]:
    """Build (model, processor) (reference factory.py:36-64)."""
    if resume_path is not None:
        model = DCTAutoencoder.from_pretrained(resume_path, dtype=dtype)
        model_config = model.config
    else:
        assert model_config is not None
        model = DCTAutoencoder(model_config, dtype=dtype, seed=seed)

    max_seq_len = get_max_seq_length(model_config, sample_patches_beta)

    proc = DCTAutoencoderFeatureExtractor(
        channels=model_config.image_channels,
        patch_size=model_config.patch_size,
        sample_patches_beta=sample_patches_beta,
        max_patch_h=model_config.max_patch_h,
        max_patch_w=model_config.max_patch_w,
        max_seq_len=max_seq_len,
    )
    return model, proc
