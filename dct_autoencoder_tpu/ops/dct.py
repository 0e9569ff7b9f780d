"""Orthonormal 2-D DCT-II / DCT-III as MXU matmuls.

The reference computes whole-image DCTs through torch_dct's FFT route and is
forced onto the CPU by a cuFFT memory leak (reference:
feature_extraction_dct_autoencoder.py:138-141).  On TPU the natural formulation
is the matrix one: for an HxW image, ``dct2(X) = D_H @ X @ D_W^T`` where D_N is
the orthonormal DCT-II matrix.  Both matmuls land on the MXU, run in a single
fused XLA computation, batch over channels/images for free, and differentiate
cleanly (the IDCT is the exact transpose).  For the image sizes this framework
touches (<= ~1024 px) the O(N) matmul-vs-FFT factor is irrelevant next to MXU
throughput, and there is no host detour.

DCT matrices are cached per (size, dtype) on host and closed over as constants
so jit sees them as literals.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import numpy as np
import jax.numpy as jnp


@lru_cache(maxsize=None)
def _dct_matrix_np(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix, float64.  Row k: s_k cos(pi (2i+1) k / 2n)."""
    k = np.arange(n)[:, None].astype(np.float64)
    i = np.arange(n)[None, :].astype(np.float64)
    mat = np.cos(np.pi * (2.0 * i + 1.0) * k / (2.0 * n))
    scale = np.full((n, 1), np.sqrt(2.0 / n))
    scale[0, 0] = np.sqrt(1.0 / n)
    return mat * scale


def dct_matrix(n: int, dtype=np.float32) -> np.ndarray:
    return _dct_matrix_np(n).astype(dtype)


def dct1d(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Orthonormal DCT-II along `axis`."""
    n = x.shape[axis]
    D = jnp.asarray(dct_matrix(n, np.float32), dtype=x.dtype)
    x = jnp.moveaxis(x, axis, -1)
    y = jnp.matmul(x, D.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(y, -1, axis)


def idct1d(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Orthonormal DCT-III (inverse of dct1d) along `axis`."""
    n = x.shape[axis]
    D = jnp.asarray(dct_matrix(n, np.float32), dtype=x.dtype)
    x = jnp.moveaxis(x, axis, -1)
    y = jnp.matmul(x, D, precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(y, -1, axis)


def dct2(x: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal 2-D DCT-II over the trailing (h, w) axes.

    Equivalent to torch_dct.dct_2d(x, norm='ortho') (reference util.py:333-334).
    """
    h, w = x.shape[-2], x.shape[-1]
    Dh = jnp.asarray(dct_matrix(h, np.float32), dtype=x.dtype)
    Dw = jnp.asarray(dct_matrix(w, np.float32), dtype=x.dtype)
    # (..., h, w) -> D_h @ X @ D_w^T ; both contractions are MXU matmuls.
    # HIGHEST precision: on TPU, f32 matmuls otherwise run as bf16 passes,
    # which visibly degrades DCT roundtrip fidelity.
    return jnp.einsum(
        "hk,...kl,wl->...hw", Dh, x, Dw, optimize=True, precision=jax.lax.Precision.HIGHEST
    )


def idct2(x: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal 2-D inverse DCT (DCT-III) over the trailing (h, w) axes.

    Equivalent to torch_dct.idct_2d(x, norm='ortho') (reference util.py:337-338).
    """
    h, w = x.shape[-2], x.shape[-1]
    Dh = jnp.asarray(dct_matrix(h, np.float32), dtype=x.dtype)
    Dw = jnp.asarray(dct_matrix(w, np.float32), dtype=x.dtype)
    return jnp.einsum(
        "kh,...kl,lw->...hw", Dh, x, Dw, optimize=True, precision=jax.lax.Precision.HIGHEST
    )


@lru_cache(maxsize=None)
def _block_dct_basis_np(patch_size: int) -> np.ndarray:
    """(p*p, p*p) matrix mapping a flattened p x p pixel block to its 2-D DCT.

    Kronecker form: vec(D X D^T) = (D ⊗ D) vec(X).  Useful for fused
    block-DCT kernels where patches are already flattened tokens.
    """
    D = _dct_matrix_np(patch_size)
    return np.kron(D, D)


def block_dct_basis(patch_size: int, dtype=np.float32) -> np.ndarray:
    return _block_dct_basis_np(patch_size).astype(dtype)
