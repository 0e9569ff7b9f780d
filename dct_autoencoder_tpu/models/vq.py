"""Classic vector quantization (the reference's `vq_type='vq'` option).

The reference vendors vector-quantize-pytorch (reference:
dct_autoencoder/vector_quantize.py:680-1050) and instantiates it with a
learnable (gradient-trained) codebook, 16-dim codes, multi-head lookup into a
shared codebook, and stochastic code sampling at temperature 20
(reference: modeling_dct_autoencoder.py:77).  This is a TPU-first re-design,
not a port:

  * distances/quantization are one MXU matmul per batch (`-2 x.C^T` trick);
  * the codebook trains by gradient (codebook + commitment terms), which is
    the natural JAX formulation — no in-place buffer mutation;
  * EMA codebook updates, k-means init, and dead-code expiry (the reference's
    other operating modes, vector_quantize.py:239-507) are provided as pure
    functional state updates;
  * distributed codebook statistics use `jax.lax.psum` over a named mesh axis
    instead of torch.distributed all_reduce (reference vector_quantize.py:
    135-171, 489-494) — pass `sync_axis` inside shard_map/pjit.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.stats import masked_mean


def _euclidean_sq_dist(x: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """(..., d) x, (z, d) codebook -> (..., z) squared distances via MXU."""
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    c2 = jnp.sum(codebook * codebook, axis=-1)
    xc = jnp.einsum("...d,zd->...z", x, codebook, preferred_element_type=jnp.float32)
    return x2 + c2 - 2.0 * xc


class VectorQuantize(nn.Module):
    dim: int
    codebook_size: int
    heads: int = 1
    codebook_dim: int = 16
    use_cosine_sim: bool = False
    sample_codebook_temp: float = 0.0
    commitment_weight: float = 1.0
    codebook_weight: float = 1.0
    # one codebook per head instead of a shared one
    # (reference vector_quantize.py separate_codebook_per_head)
    separate_codebook_per_head: bool = False
    # affine codebook re-parameterization: learnable per-dim scale/shift on
    # the codebook (gradient-trained analogue of the reference's EMA-tracked
    # batch/codebook statistic rescaling, vector_quantize.py:383-409)
    affine_param: bool = False
    # || C C^T - I ||^2 penalty pushing codes apart
    # (reference vector_quantize.py orthogonal_reg_weight)
    orthogonal_reg_weight: float = 0.0
    sync_axis: Optional[str] = None

    def setup(self):
        inner = self.codebook_dim * self.heads
        self.project_in = nn.Dense(inner, name="project_in")
        self.project_out = nn.Dense(self.dim, name="project_out")
        cb_shape = (
            (self.heads, self.codebook_size, self.codebook_dim)
            if self.separate_codebook_per_head
            else (self.codebook_size, self.codebook_dim)
        )
        self.codebook = self.param(
            "codebook", nn.initializers.normal(stddev=1.0), cb_shape
        )
        if self.affine_param:
            self.affine_scale = self.param(
                "affine_scale", nn.initializers.ones, (self.codebook_dim,)
            )
            self.affine_shift = self.param(
                "affine_shift", nn.initializers.zeros, (self.codebook_dim,)
            )

    def _normed_codebook(self) -> jnp.ndarray:
        cb = self.codebook
        if self.affine_param:
            cb = cb * self.affine_scale + self.affine_shift
        if self.use_cosine_sim:
            cb = cb / (jnp.linalg.norm(cb, axis=-1, keepdims=True) + 1e-8)
        return cb

    def indices_to_codes(self, indices: jnp.ndarray) -> jnp.ndarray:
        """(..., h) indices -> (..., dim) decoded features."""
        cb = self._normed_codebook()
        if self.separate_codebook_per_head:
            # per-head gather from (h, z, d)
            codes = jnp.stack(
                [cb[h][indices[..., h]] for h in range(self.heads)], axis=-2
            )
        else:
            codes = cb[indices]  # (..., h, d)
        codes = codes.reshape(*codes.shape[:-2], self.heads * self.codebook_dim)
        return self.project_out(codes)

    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        training: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """x: (b, n, dim); mask: (b, n) bool, False where padding.

        Returns (quantized (b, n, dim), indices (b, n, heads), loss scalar).
        """
        b, n, _ = x.shape
        h, d = self.heads, self.codebook_dim

        z = self.project_in(x).reshape(b, n, h, d)
        if self.use_cosine_sim:
            z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)

        codebook = self._normed_codebook()
        if self.separate_codebook_per_head:
            # (b, n, h, d) vs (h, z, d): per-head distances via one einsum
            z32 = z.astype(jnp.float32)
            cb32 = codebook.astype(jnp.float32)
            x2 = jnp.sum(z32 * z32, axis=-1, keepdims=True)
            c2 = jnp.sum(cb32 * cb32, axis=-1)  # (h, z)
            xc = jnp.einsum("bnhd,hzd->bnhz", z32, cb32, preferred_element_type=jnp.float32)
            dists = x2 + c2[None, None] - 2.0 * xc
        else:
            dists = _euclidean_sq_dist(z.astype(jnp.float32), codebook.astype(jnp.float32))

        if training and self.sample_codebook_temp > 0.0 and rng is not None:
            # stochastic code sampling (reference vector_quantize.py:61-98)
            g = jax.random.gumbel(rng, dists.shape, dtype=jnp.float32)
            indices = jnp.argmax(-dists / self.sample_codebook_temp + g, axis=-1)
        else:
            indices = jnp.argmin(dists, axis=-1)

        if self.separate_codebook_per_head:
            quantized = jnp.stack(
                [codebook[i][indices[..., i]] for i in range(h)], axis=-2
            )  # (b, n, h, d)
        else:
            quantized = codebook[indices]  # (b, n, h, d)

        if training:
            if mask is None:
                mask = jnp.ones((b, n), dtype=bool)
            # commitment: pull encoder output toward frozen codes
            commit = (z - jax.lax.stop_gradient(quantized)) ** 2
            commit = masked_mean(commit, mask, dim=0).sum(axis=0).mean()
            # codebook: pull codes toward frozen encoder output (grad-trained
            # codebook, standing in for the reference's learnable_codebook=True)
            codebook_loss = (jax.lax.stop_gradient(z) - quantized) ** 2
            codebook_loss = masked_mean(codebook_loss, mask, dim=0).sum(axis=0).mean()
            loss = self.commitment_weight * commit + self.codebook_weight * codebook_loss
            if self.orthogonal_reg_weight > 0.0:
                cb2 = codebook.reshape(-1, d)
                cbn = cb2 / (jnp.linalg.norm(cb2, axis=-1, keepdims=True) + 1e-8)
                gram = cbn @ cbn.T
                eye = jnp.eye(gram.shape[0], dtype=gram.dtype)
                ortho = jnp.sum((gram - eye) ** 2) / gram.shape[0] ** 2
                loss = loss + self.orthogonal_reg_weight * ortho
            # straight-through
            zq = z + jax.lax.stop_gradient(quantized - z)
        else:
            loss = jnp.zeros((), dtype=x.dtype)
            zq = quantized

        out = self.project_out(zq.reshape(b, n, h * d))
        return out, indices, loss


# --------------------------------------------------------------------------
# Functional EMA codebook machinery (the reference's other operating modes)
# --------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EMACodebookState:
    """EMA statistics for a codebook (reference vector_quantize.py:239-507)."""

    embed: jnp.ndarray  # (z, d)
    cluster_size: jnp.ndarray  # (z,)
    embed_avg: jnp.ndarray  # (z, d)

    @staticmethod
    def create(codebook_size: int, dim: int, rng: jax.Array) -> "EMACodebookState":
        embed = jax.random.normal(rng, (codebook_size, dim))
        return EMACodebookState(
            embed=embed,
            cluster_size=jnp.zeros((codebook_size,)),
            embed_avg=embed.copy(),
        )


def ema_codebook_update(
    state: EMACodebookState,
    flat_x: jnp.ndarray,  # (m, d) encoder outputs (valid tokens only; pad with zeros+mask)
    valid: jnp.ndarray,  # (m,) bool
    decay: float = 0.8,
    eps: float = 1e-5,
    sync_axis: Optional[str] = None,
) -> EMACodebookState:
    """One EMA codebook step; stats are psum-synced across `sync_axis` if given.

    This is the TPU-native equivalent of the reference's distributed
    all_reduce of cluster bins / embed sums (vector_quantize.py:489-494,
    552-553, 655-662): within pjit/shard_map, `lax.psum` over the mesh axis
    rides the ICI.
    """
    dists = _euclidean_sq_dist(flat_x, state.embed)
    idx = jnp.argmin(dists, axis=-1)
    onehot = jax.nn.one_hot(idx, state.embed.shape[0], dtype=flat_x.dtype)
    onehot = onehot * valid[:, None].astype(flat_x.dtype)

    bins = onehot.sum(axis=0)  # (z,)
    embed_sum = onehot.T @ flat_x  # (z, d)
    if sync_axis is not None:
        bins = jax.lax.psum(bins, sync_axis)
        embed_sum = jax.lax.psum(embed_sum, sync_axis)

    cluster_size = state.cluster_size * decay + bins * (1 - decay)
    embed_avg = state.embed_avg * decay + embed_sum * (1 - decay)

    n = cluster_size.sum()
    smoothed = (cluster_size + eps) / (n + state.embed.shape[0] * eps) * n
    embed = embed_avg / smoothed[:, None]
    return EMACodebookState(embed=embed, cluster_size=cluster_size, embed_avg=embed_avg)


def kmeans_init_codebook(
    flat_x: jnp.ndarray, codebook_size: int, rng: jax.Array, iters: int = 10
) -> jnp.ndarray:
    """k-means codebook init (reference vector_quantize.py:180-220)."""
    m = flat_x.shape[0]
    perm = jax.random.permutation(rng, m)[:codebook_size]
    means = flat_x[perm % m]

    def body(_, means):
        dists = _euclidean_sq_dist(flat_x, means)
        idx = jnp.argmin(dists, axis=-1)
        onehot = jax.nn.one_hot(idx, codebook_size, dtype=flat_x.dtype)
        bins = onehot.sum(axis=0)
        sums = onehot.T @ flat_x
        new_means = sums / jnp.clip(bins[:, None], 1.0, None)
        return jnp.where(bins[:, None] > 0, new_means, means)

    return jax.lax.fori_loop(0, iters, body, means)


def expire_dead_codes(
    state: EMACodebookState,
    flat_x: jnp.ndarray,
    rng: jax.Array,
    threshold: float = 2.0,
) -> EMACodebookState:
    """Replace codes with EMA usage below threshold by random batch samples
    (reference vector_quantize.py threshold_ema_dead_code machinery)."""
    m = flat_x.shape[0]
    z = state.embed.shape[0]
    dead = state.cluster_size < threshold
    samples = flat_x[jax.random.randint(rng, (z,), 0, m)]
    embed = jnp.where(dead[:, None], samples, state.embed)
    cluster_size = jnp.where(dead, threshold, state.cluster_size)
    embed_avg = jnp.where(dead[:, None], samples * threshold, state.embed_avg)
    return EMACodebookState(embed=embed, cluster_size=cluster_size, embed_avg=embed_avg)
