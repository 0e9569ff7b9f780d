"""Lookup-Free Quantization (LFQ), TPU-native.

Behavioral port of the reference quantizer (reference:
dct_autoencoder/lfq.py:35-227): sign-binarize each latent dimension per
codebook, straight-through gradients, MSB-first bit-packed indices, masked MSE
commit loss, and `-2 x . C^T` code affinities against the materialized ±1
codebook for the MaskGIT entropy loss.

Bit-exactness notes (these define token-stream compatibility):
  * quantize uses strictly-positive sign: `x > 0` -> +scale else -scale
    (reference lfq.py:175,187);
  * indices are packed MSB-first: bit i of codebook_dim weights
    2**(codebook_dim-1-i) (reference lfq.py:87).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.stats import masked_mean


def _bit_mask(codebook_dim: int) -> np.ndarray:
    return 2 ** np.arange(codebook_dim - 1, -1, -1, dtype=np.int32)


def _materialize_codebook(codebook_size: int, codebook_dim: int, scale: float) -> np.ndarray:
    """(codebook_size, codebook_dim) array of ±scale code vectors."""
    codes = np.arange(codebook_size)[:, None]
    bits = (codes & _bit_mask(codebook_dim)[None, :]) != 0
    return (bits.astype(np.float32) * 2.0 - 1.0) * scale


class LFQ(nn.Module):
    dim: int
    codebook_size: int
    num_codebooks: int = 1
    codebook_scale: float = 1.0

    @property
    def codebook_dim(self) -> int:
        cd = int(math.log2(self.codebook_size))
        assert 2**cd == self.codebook_size, "codebook_size must be a power of 2"
        return cd

    @property
    def codebook_dims(self) -> int:
        return self.codebook_dim * self.num_codebooks

    @property
    def has_projections(self) -> bool:
        return self.dim != self.codebook_dims

    def setup(self):
        if self.has_projections:
            self.project_in = nn.Dense(self.codebook_dims, name="project_in")
            self.project_out = nn.Dense(self.dim, name="project_out")
        self._mask = jnp.asarray(_bit_mask(self.codebook_dim))
        self._codebook = jnp.asarray(
            _materialize_codebook(self.codebook_size, self.codebook_dim, self.codebook_scale)
        )

    def indices_to_codes(self, indices: jnp.ndarray, project_out: bool = True) -> jnp.ndarray:
        """(..., c) int indices -> (..., dim) code vectors (reference lfq.py:105-134)."""
        bits = (indices[..., None].astype(jnp.int32) & self._mask) != 0
        codes = (bits.astype(jnp.float32) * 2.0 - 1.0) * self.codebook_scale
        codes = codes.reshape(*codes.shape[:-2], self.codebook_dims)
        if project_out and self.has_projections:
            codes = self.project_out(codes)
        return codes

    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        training: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """x: (b, n, dim); mask: (b, n) bool, False where padding.

        Returns (quantized_out (b, n, dim), indices (b, n, c),
        commit_loss scalar, distances (b, n, c, codebook_size)).
        Reference: lfq.py:136-227.
        """
        assert x.shape[-1] == self.dim
        b, n, _ = x.shape
        c, d = self.num_codebooks, self.codebook_dim

        if self.has_projections:
            x = self.project_in(x)
        x = x.reshape(b, n, c, d)
        original_input = x

        quantized = jnp.where(x > 0, self.codebook_scale, -self.codebook_scale).astype(x.dtype)

        if training:
            # straight-through: forward = quantized, backward = identity
            x = x + jax.lax.stop_gradient(quantized - x)
        else:
            x = quantized

        indices = jnp.sum((x > 0).astype(jnp.int32) * self._mask, axis=-1)

        if training:
            # euclidean distance up to a constant (reference lfq.py:190-193)
            distances = -2.0 * jnp.einsum(
                "bncd,zd->bncz", original_input, self._codebook, preferred_element_type=jnp.float32
            )
            if mask is not None:
                se = (original_input - jax.lax.stop_gradient(quantized)) ** 2
                commit_loss = masked_mean(se, mask, dim=0).sum(axis=0).mean()
            else:
                commit_loss = jnp.mean((original_input - jax.lax.stop_gradient(quantized)) ** 2)
        else:
            distances = jnp.zeros((), dtype=x.dtype)
            commit_loss = jnp.zeros((), dtype=x.dtype)

        x = x.reshape(b, n, c * d)
        if self.has_projections:
            x = self.project_out(x)

        return x, indices, commit_loss, distances
