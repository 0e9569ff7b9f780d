"""Frequency-plane masks and small signal-processing helpers.

Pure-JAX/numpy ports of the reference's mask/basis utilities
(reference: dct_autoencoder/util.py:213-228, 441-568): upper-left-triangle
masks with per-channel budgets (for DCT low-pass experiments), circular masks,
the square DCT basis-image tensor, FFT amplitude/phase split, and Gaussian
kernels.  Masks are built host-side in numpy (they're static per shape) and
consumed as jit constants.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp


def get_square_dct_basis(resolution: int = 16) -> np.ndarray:
    """(res, res, res, res) DCT basis images; first two dims are the (u, v)
    DCT coordinates (reference util.py:213-228)."""
    x, y = np.meshgrid(np.arange(resolution), np.arange(resolution), indexing="ij")
    u = np.arange(resolution)[:, None, None, None]
    v = np.arange(resolution)[None, :, None, None]
    return np.cos(((2 * x + 1) * u * np.pi) / (2 * resolution)) * np.cos(
        ((2 * y + 1) * v * np.pi) / (2 * resolution)
    )


def get_upper_left_tri_p(shape, p: float) -> np.ndarray:
    """Keep-mask dropping ~fraction p of coefficients farthest (in h+w) from
    the DC corner (reference util.py:473-491)."""
    h, w = shape[-2], shape[-1]
    x, y = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    dist = (x + y) * -1.0
    thresh = np.quantile(dist, p)
    mask = dist > thresh
    return mask.reshape((1,) * (len(shape) - 2) + (h, w))


def get_upper_left_tri_p_w_channel_preferences(
    shape: Tuple[int, int, int], p: float, channel_preferences: Tuple[float, ...]
) -> np.ndarray:
    """Per-channel triangle masks with the keep budget split by channel
    importance (reference util.py:441-470)."""
    c, h, w = shape
    prefs = np.asarray(channel_preferences, dtype=np.float64)
    prefs = prefs / prefs.sum()
    channel_ps = prefs * c * p
    masks = [get_upper_left_tri_p((h, w), float(cp)) for cp in channel_ps]
    return np.stack(masks, axis=0)


def get_upper_left_tri(shape, triangle_n: int = 1) -> np.ndarray:
    """Hard triangle of size triangle_n anchored at the DC corner
    (reference util.py:494-508)."""
    h, w = shape[-2], shape[-1]
    assert triangle_n >= 1
    diagonal = w - triangle_n
    assert diagonal >= -h - 2
    tri = np.fliplr(np.triu(np.ones((h, w)), k=diagonal))
    return tri.reshape((1,) * (len(shape) - 2) + (h, w))


def get_circular_mask(shape, p: float = 0.5) -> np.ndarray:
    """Mask cutting a centered disk holding ~fraction p of the coefficients
    (reference util.py:511-537)."""
    h, w = shape[-2], shape[-1]
    cy, cx = h / 2 - 0.5, w / 2 - 0.5
    x, y = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    dist = np.sqrt((y - cy) ** 2 + (x - cx) ** 2)
    thresh = np.quantile(dist, p)
    mask = dist > thresh
    return mask.reshape((1,) * (len(shape) - 2) + (h, w))


def fft_amp_phase(x: jnp.ndarray):
    """2-D FFT split into amplitude and phase (reference util.py:548-552)."""
    f = jnp.fft.fft2(x)
    return jnp.abs(f), jnp.angle(f)


def inverse_fft(amp: jnp.ndarray, phase: jnp.ndarray) -> jnp.ndarray:
    """Inverse of fft_amp_phase (reference util.py:540-545)."""
    f = amp * jnp.cos(phase) + 1j * amp * jnp.sin(phase)
    return jnp.real(jnp.fft.ifft2(f))


def gaussian_fn(m: int, std: float) -> np.ndarray:
    n = np.arange(0, m) - (m - 1.0) / 2.0
    return np.exp(-(n**2) / (2 * std * std))


def gkern(size: int = 256, std: float = None) -> np.ndarray:
    """2-D Gaussian kernel (reference util.py:562-568)."""
    if std is None:
        std = size / 2
    g = gaussian_fn(size, std)
    return np.outer(g, g)
