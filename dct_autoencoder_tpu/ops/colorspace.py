"""Colorspace transforms (pure JAX, VPU-friendly elementwise + tiny matmuls).

Implements the IPT perceptual colorspace used by the reference pipeline
(reference: dct_autoencoder/util.py:21-97) and the JPEG YCbCr variant
(reference: dct_autoencoder/util.py:100-140).  The 3x3 color matrices are
standard published constants (sRGB->XYZ D65, Hunt-Pointer-Estevez XYZ->LMS,
LMS->IPT; see https://scholarworks.rit.edu/theses/2858/ p.147).

All functions operate on `(..., c, h, w)` arrays with c == 3 and are shape
polymorphic; everything is traceable under `jax.jit`.
"""
from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

# sRGB -> XYZ D65
_M_SRGB = np.array(
    [
        [0.4124564, 0.3575761, 0.1804375],
        [0.2126729, 0.7151522, 0.0721750],
        [0.0193339, 0.1191920, 0.9503041],
    ],
    dtype=np.float64,
)
# XYZ D65 -> LMS (Hunt-Pointer-Estevez)
_M_HPE = np.array(
    [[0.4002, 0.7076, -0.0807], [-0.2280, 1.1500, 0.0612], [0.0, 0.0, 0.9184]],
    dtype=np.float64,
)
# LMS' -> IPT
_M_IPT = np.array(
    [[0.4, 0.4, 0.2], [4.455, -4.851, 0.3960], [0.8056, 0.3572, -1.1628]],
    dtype=np.float64,
)

_RGB2LMS = _M_HPE @ _M_SRGB
_LMS2RGB = np.linalg.inv(_RGB2LMS)
_IPT2LMS = np.linalg.inv(_M_IPT)

IPT_GAMMA = 0.43


def _channel_mult(M: np.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Apply a 3x3 color matrix along the channel axis of (..., c, h, w)."""
    M = jnp.asarray(M, dtype=x.dtype)
    return jnp.einsum("ij,...jhw->...ihw", M, x, precision=jax.lax.Precision.HIGHEST)


def _signed_pow(x: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """|x|^gamma with the sign of x preserved (reference util.py:76-78)."""
    return jnp.sign(x) * jnp.abs(x) ** gamma


def rgb_to_lms(x: jnp.ndarray) -> jnp.ndarray:
    return _channel_mult(_RGB2LMS, x)


def lms_to_rgb(x: jnp.ndarray) -> jnp.ndarray:
    return _channel_mult(_LMS2RGB, x)


def rgb_to_ipt(x: jnp.ndarray) -> jnp.ndarray:
    """sRGB (in [0,1]) -> IPT.  Reference: util.py:70-83."""
    x = rgb_to_lms(x)
    x = _signed_pow(x, IPT_GAMMA)
    return _channel_mult(_M_IPT, x)


def ipt_to_rgb(x: jnp.ndarray) -> jnp.ndarray:
    """IPT -> sRGB.  Reference: util.py:85-97."""
    x = _channel_mult(_IPT2LMS, x)
    x = _signed_pow(x, 1.0 / IPT_GAMMA)
    return lms_to_rgb(x)


def rgb_to_ycbcr(x: jnp.ndarray) -> jnp.ndarray:
    """JPEG-convention YCbCr.  Reference: util.py:100-116.

    Note: the reference's forward constants contain typos (0.866 for 0.886 and
    0.144 for 0.114) that make it inconsistent with its own inverse; YCbCr is
    unused in the reference's main pipeline.  We use the correct JPEG
    constants (Cb = (B-Y)/1.772 + 0.5, Cr = (R-Y)/1.402 + 0.5) so the pair is
    an exact roundtrip.
    """
    r = x[..., 0, :, :]
    g = x[..., 1, :, :]
    b = x[..., 2, :, :]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = (-0.299 * r - 0.587 * g + 0.886 * b) / 1.772 + 0.5
    cr = (0.701 * r - 0.587 * g - 0.114 * b) / 1.402 + 0.5
    return jnp.stack([y, cb, cr], axis=-3)


def ycbcr_to_rgb(x: jnp.ndarray) -> jnp.ndarray:
    """Reference: util.py:119-140."""
    y = x[..., 0, :, :]
    cb = x[..., 1, :, :]
    cr = x[..., 2, :, :]
    r = y + 1.402 * (cr - 0.5)
    g = y - (0.114 * 1.772 * (cb - 0.5) + 0.299 * 1.402 * (cr - 0.5)) / 0.587
    b = y + 1.772 * (cb - 0.5)
    return jnp.stack([r, g, b], axis=-3)
