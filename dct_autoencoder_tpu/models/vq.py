"""Classic vector quantization (the reference's `vq_type='vq'` option).

The reference vendors vector-quantize-pytorch (reference:
dct_autoencoder/vector_quantize.py:680-1050) and instantiates it as
`VectorQuantize(dim, codebook_size, heads=16, kmeans_init=True,
sample_codebook_temp=20.0, codebook_dim=16, learnable_codebook=True,
affine_param=True, ema_update=False, threshold_ema_dead_code=15)`
(reference: modeling_dct_autoencoder.py:77).  This is a TPU-first re-design,
not a port:

  * distances/quantization are one MXU matmul per batch (`-2 x.C^T` trick);
  * the codebook trains by gradient (learnable_codebook=True/ema_update=False
    — exactly the reference's instantiation), the natural JAX formulation;
  * affine re-parameterization tracks EMA batch/codebook mean+variance in a
    flax `vq_stats` variable collection (reference vector_quantize.py:383-409)
    — apply with `mutable=['vq_stats']` during training;
  * per-code EMA usage (`cluster_size`) is tracked the same way so dead codes
    (usage < threshold_ema_dead_code) can be expired; the codebook surgery
    itself (k-means init from the first batch, dead-code replacement) is a
    pure-functional param update done by the train step
    (train/loop.py make_train_step), since flax params are immutable inside
    apply — the JAX counterpart of the reference's in-place buffer writes
    (vector_quantize.py:180-220, 489-507);
  * stochastic code sampling (gumbel at temperature 20,
    vector_quantize.py:61-98) fires when an rng reaches __call__ — pass
    `rngs={'vq': key}` to apply;
  * standalone functional EMA-codebook machinery (the reference's OTHER
    operating mode, ema_update=True) is provided at the bottom of this file;
  * distributed codebook statistics use `jax.lax.psum` over a named mesh axis
    instead of torch.distributed all_reduce (reference vector_quantize.py:
    135-171, 489-494) — pass `sync_axis` inside shard_map/pjit.  Under plain
    pjit with globally-sharded inputs the batch statistics are already
    global, so sync_axis is only needed inside shard_map.
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
    # affine codebook re-parameterization with EMA-tracked batch/codebook
    # mean+variance (reference vector_quantize.py:340-409): the codebook is
    # standardized by its own running stats and rescaled to the batch's.
    # Stats live in the 'vq_stats' variable collection.
    affine_param: bool = False
    affine_param_batch_decay: float = 0.99
    affine_param_codebook_decay: float = 0.9
    # k-means init + dead-code expiry (reference modeling...py:77 passes
    # kmeans_init=True, threshold_ema_dead_code=15).  The module only TRACKS
    # EMA code usage here; the codebook surgery is the train step's job
    # (flax params are immutable inside apply) — see train/loop.py.
    kmeans_init: bool = False
    threshold_ema_dead_code: float = 0.0
    ema_cluster_decay: float = 0.8
    # EMA-trained codebook (the reference library's OTHER operating mode,
    # ema_update=True — EuclideanCodebook, vector_quantize.py:239-507): the
    # codebook lives in the 'vq_stats' collection (embed / embed_avg /
    # cluster_size) and updates by exponential moving average of assigned
    # encoder outputs instead of by gradient.  Mutually exclusive with the
    # gradient codebook; the flagship instantiation uses ema_update=False.
    ema_update: bool = False
    ema_decay: float = 0.8
    ema_eps: float = 1e-5
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
        if self.ema_update:
            # EMA codebook: non-param state in vq_stats
            init = nn.initializers.normal(stddev=1.0)
            self.v_embed = self.variable(
                "vq_stats", "embed", lambda: init(jax.random.PRNGKey(0), cb_shape)
            )
            self.v_embed_avg = self.variable(
                "vq_stats", "embed_avg", lambda: self.v_embed.value.copy()
            )
            self.v_ema_cluster = self.variable(
                "vq_stats",
                "ema_cluster_size",
                lambda: jnp.zeros(cb_shape[:-1], jnp.float32),
            )
        else:
            self.codebook = self.param(
                "codebook", nn.initializers.normal(stddev=1.0), cb_shape
            )
        d = self.codebook_dim
        if self.affine_param:
            z32 = jnp.float32
            self.v_batch_mean = self.variable(
                "vq_stats", "batch_mean", lambda: jnp.zeros((d,), z32)
            )
            self.v_batch_variance = self.variable(
                "vq_stats", "batch_variance", lambda: jnp.ones((d,), z32)
            )
            self.v_codebook_mean = self.variable(
                "vq_stats", "codebook_mean", lambda: jnp.zeros((d,), z32)
            )
            self.v_codebook_variance = self.variable(
                "vq_stats", "codebook_variance", lambda: jnp.ones((d,), z32)
            )
        if self.threshold_ema_dead_code > 0:
            self.v_cluster_size = self.variable(
                "vq_stats",
                "cluster_size",
                lambda: jnp.zeros(cb_shape[:-1], jnp.float32),
            )

    def _affine_stats(self):
        eps = 1e-5
        cb_std = jnp.sqrt(self.v_codebook_variance.value + eps)
        b_std = jnp.sqrt(self.v_batch_variance.value + eps)
        return self.v_codebook_mean.value, cb_std, self.v_batch_mean.value, b_std

    def _codebook_value(self) -> jnp.ndarray:
        return self.v_embed.value if self.ema_update else self.codebook

    def _normed_codebook(self) -> jnp.ndarray:
        cb = self._codebook_value()
        if self.affine_param:
            # (cb - cb_mean) / cb_std * batch_std + batch_mean
            # (reference vector_quantize.py:411-424 affine transform)
            cm, cs, bm, bs = self._affine_stats()
            cb = (cb - cm) / cs * bs + bm
        if self.use_cosine_sim:
            cb = cb / (jnp.linalg.norm(cb, axis=-1, keepdims=True) + 1e-8)
        return cb

    def _update_affine_stats(self, z: jnp.ndarray, mask: jnp.ndarray) -> None:
        """EMA-update codebook stats (from the raw codebook) then batch stats
        (from masked encoder outputs) — reference vector_quantize.py:340-409."""

        def ema(var, new, decay):
            var.value = var.value * decay + new.astype(jnp.float32) * (1 - decay)

        cb = self._codebook_value().reshape(-1, self.codebook_dim)
        ema(self.v_codebook_mean, cb.mean(axis=0), self.affine_param_codebook_decay)
        ema(self.v_codebook_variance, cb.var(axis=0), self.affine_param_codebook_decay)

        m = mask[..., None, None].astype(jnp.float32)  # (b, n, 1, 1)
        denom = jnp.maximum(m.sum() * self.heads, 1.0)
        zsum = (z.astype(jnp.float32) * m).sum(axis=(0, 1, 2))
        if self.sync_axis is not None:
            zsum = jax.lax.psum(zsum, self.sync_axis)
            denom = jax.lax.psum(denom, self.sync_axis)
        mean = zsum / denom
        vsum = (((z.astype(jnp.float32) - mean) ** 2) * m).sum(axis=(0, 1, 2))
        if self.sync_axis is not None:
            vsum = jax.lax.psum(vsum, self.sync_axis)
        ema(self.v_batch_mean, mean, self.affine_param_batch_decay)
        ema(self.v_batch_variance, vsum / denom, self.affine_param_batch_decay)

    def _ema_update_codebook(
        self, z: jnp.ndarray, indices: jnp.ndarray, mask: jnp.ndarray
    ) -> None:
        """EMA codebook step (reference EuclideanCodebook.forward with
        ema_update=True, vector_quantize.py:460-507): cluster sizes and
        per-code embed sums decay toward the batch's masked assignments; the
        embed is their Laplace-smoothed ratio.  Stats psum over sync_axis."""
        valid = mask[..., None].astype(jnp.float32)  # (b, n, 1)
        onehot = jax.nn.one_hot(indices, self.codebook_size, dtype=jnp.float32)
        onehot = onehot * valid[..., None]  # (b, n, h, z)
        bins = onehot.sum(axis=(0, 1))  # (h, z)
        sums = jnp.einsum(
            "bnhz,bnhd->hzd", onehot, z.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        if not self.separate_codebook_per_head:
            bins = bins.sum(axis=0)  # (z,)
            sums = sums.sum(axis=0)  # (z, d)
        if self.sync_axis is not None:
            bins = jax.lax.psum(bins, self.sync_axis)
            sums = jax.lax.psum(sums, self.sync_axis)

        d = self.ema_decay
        cluster = self.v_ema_cluster.value * d + bins * (1 - d)
        embed_avg = self.v_embed_avg.value * d + sums.astype(
            self.v_embed_avg.value.dtype
        ) * (1 - d)
        n = cluster.sum(axis=-1, keepdims=True)
        smoothed = (
            (cluster + self.ema_eps)
            / (n + self.codebook_size * self.ema_eps)
            * n
        )
        self.v_ema_cluster.value = cluster
        self.v_embed_avg.value = embed_avg
        self.v_embed.value = embed_avg / jnp.maximum(smoothed[..., None], 1e-9)

    def _update_cluster_size(self, indices: jnp.ndarray, mask: jnp.ndarray) -> None:
        """EMA code-usage histogram feeding dead-code expiry (reference
        vector_quantize.py:489-507 expire_codes_ machinery)."""
        valid = mask[..., None].astype(jnp.float32)  # (b, n, 1)
        onehot = jax.nn.one_hot(indices, self.codebook_size, dtype=jnp.float32)
        bins = (onehot * valid[..., None]).sum(axis=(0, 1))  # (h, z)
        if not self.separate_codebook_per_head:
            bins = bins.sum(axis=0)  # shared codebook: all heads count
        if self.sync_axis is not None:
            bins = jax.lax.psum(bins, self.sync_axis)
        d = self.ema_cluster_decay
        self.v_cluster_size.value = self.v_cluster_size.value * d + bins * (1 - d)

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
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """x: (b, n, dim); mask: (b, n) bool, False where padding.

        Returns (quantized (b, n, dim), indices (b, n, heads), loss scalar,
        z (b, n, heads, codebook_dim) pre-quantization projections — the
        train step uses z for k-means init / dead-code replacement samples).

        During training, apply with `mutable=['vq_stats']` to let the EMA
        affine/usage statistics update, and `rngs={'vq': key}` to enable
        stochastic code sampling (gumbel at sample_codebook_temp).
        """
        b, n, _ = x.shape
        h, d = self.heads, self.codebook_dim
        if mask is None:
            mask = jnp.ones((b, n), dtype=bool)
        if rng is None and self.has_rng("vq"):
            rng = self.make_rng("vq")

        z = self.project_in(x).reshape(b, n, h, d)
        if self.use_cosine_sim:
            z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)

        updating = training and self.is_mutable_collection("vq_stats")
        if updating and self.affine_param:
            self._update_affine_stats(z, mask)

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

        if updating and self.threshold_ema_dead_code > 0:
            self._update_cluster_size(indices, mask)
        if updating and self.ema_update:
            self._ema_update_codebook(jax.lax.stop_gradient(z), indices, mask)

        if self.separate_codebook_per_head:
            quantized = jnp.stack(
                [codebook[i][indices[..., i]] for i in range(h)], axis=-2
            )  # (b, n, h, d)
        else:
            quantized = codebook[indices]  # (b, n, h, d)

        if training:
            # commitment: pull encoder output toward frozen codes
            commit = (z - jax.lax.stop_gradient(quantized)) ** 2
            commit = masked_mean(commit, mask, dim=0).sum(axis=0).mean()
            loss = self.commitment_weight * commit
            if not self.ema_update:
                # codebook: pull codes toward frozen encoder output
                # (learnable_codebook=True; in EMA mode the codebook trains
                # by moving average, not by gradient)
                codebook_loss = (jax.lax.stop_gradient(z) - quantized) ** 2
                codebook_loss = (
                    masked_mean(codebook_loss, mask, dim=0).sum(axis=0).mean()
                )
                loss = loss + self.codebook_weight * codebook_loss
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
        return out, indices, loss, z


# --------------------------------------------------------------------------
# Pure-functional codebook surgery used by the train step (flax params are
# immutable inside apply; the reference writes buffers in place instead —
# vector_quantize.py:180-220 init_embed_, :489-507 expire_codes_)
# --------------------------------------------------------------------------


def sample_valid_vectors(
    z: jnp.ndarray,  # (..., d) encoder projections
    valid: jnp.ndarray,  # (...) bool
    m: int,
    rng: jax.Array,
) -> jnp.ndarray:
    """Draw m rows uniformly from the valid entries of z (with replacement)."""
    d = z.shape[-1]
    flat = z.reshape(-1, d)
    v = valid.reshape(-1).astype(jnp.float32)
    probs = v / jnp.maximum(v.sum(), 1.0)
    idx = jax.random.choice(rng, flat.shape[0], (m,), p=probs)
    return flat[idx]


def kmeans_init_from_batch(
    codebook: jnp.ndarray,  # (z, d) or (h, z, d) param codebook
    z: jnp.ndarray,  # (b, n, h, d) projections from the first batch
    mask: jnp.ndarray,  # (b, n) bool valid tokens
    rng: jax.Array,
    iters: int = 10,
    return_bins: bool = False,
):
    """k-means-initialize the codebook from the first batch's encoder outputs
    (reference vector_quantize.py:180-220 via kmeans_init=True).

    Runs k-means over a pool of valid samples (static pool size keeps the
    program shape-stable).  Shared codebooks pool all heads; per-head
    codebooks get an independent k-means per head.  return_bins=True also
    returns the assignment counts ((z,) or (h, z)) for seeding EMA buffers."""
    b, n, h, d = z.shape
    if codebook.ndim == 2:
        zsize = codebook.shape[0]
        pool_m = min(b * n * h, max(4 * zsize, 4096))
        valid = jnp.broadcast_to(mask[..., None], (b, n, h))
        pool = sample_valid_vectors(z, valid, pool_m, rng)
        if return_bins:
            means, bins = kmeans_init_codebook(
                pool, zsize, rng, iters=iters, return_bins=True
            )
            return means.astype(codebook.dtype), bins
        return kmeans_init_codebook(pool, zsize, rng, iters=iters).astype(
            codebook.dtype
        )
    zsize = codebook.shape[1]
    pool_m = min(b * n, max(4 * zsize, 4096))

    def per_head(zh, key):
        pool = sample_valid_vectors(zh, mask, pool_m, key)
        return kmeans_init_codebook(
            pool, zsize, key, iters=iters, return_bins=return_bins
        )

    keys = jax.random.split(rng, h)
    out = jax.vmap(per_head, in_axes=(2, 0))(z, keys)
    if return_bins:
        means, bins = out  # (h, z, d), (h, z)
        return means.astype(codebook.dtype), bins
    return out.astype(codebook.dtype)


def expire_dead_codes_params(
    codebook: jnp.ndarray,  # (z, d) or (h, z, d)
    cluster_size: jnp.ndarray,  # (z,) or (h, z) EMA usage (vq_stats)
    z: jnp.ndarray,  # (b, n, h, d)
    mask: jnp.ndarray,  # (b, n)
    rng: jax.Array,
    threshold: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Replace codes with EMA usage < threshold by random valid batch samples
    (reference vector_quantize.py:489-507); resets their usage to threshold
    (the reference's reset_cluster_size default).  Returns (codebook,
    cluster_size)."""
    b, n, h, d = z.shape
    if codebook.ndim == 2:
        dead = cluster_size < threshold  # (z,)
        valid = jnp.broadcast_to(mask[..., None], (b, n, h))
        samples = sample_valid_vectors(z, valid, codebook.shape[0], rng)
        new_cb = jnp.where(dead[:, None], samples.astype(codebook.dtype), codebook)
        new_cs = jnp.where(dead, threshold, cluster_size)
        return new_cb, new_cs

    def per_head(cb_h, cs_h, zh, key):
        dead = cs_h < threshold
        samples = sample_valid_vectors(zh, mask, cb_h.shape[0], key)
        return (
            jnp.where(dead[:, None], samples.astype(cb_h.dtype), cb_h),
            jnp.where(dead, threshold, cs_h),
        )

    keys = jax.random.split(rng, h)
    return jax.vmap(per_head, in_axes=(0, 0, 2, 0))(codebook, cluster_size, z, keys)


def expire_dead_codes_ema_stats(
    stats: dict,  # the 'vq_model' vq_stats subtree (EMA-codebook mode)
    z: jnp.ndarray,  # (b, n, h, d)
    mask: jnp.ndarray,  # (b, n)
    rng: jax.Array,
    threshold: float,
) -> dict:
    """Dead-code expiry for the EMA-codebook operating mode (ema_update=True).

    The codebook lives in vq_stats (embed / embed_avg / ema_cluster_size),
    so expiry edits the stats: dead rows get random valid batch samples,
    embed_avg is reset to sample * reset_cluster_size and the cluster sizes
    to the threshold (reference EuclideanCodebook.expire_codes_ +
    replace_, vector_quantize.py:489-507, reset_cluster_size default =
    threshold_ema_dead_code).  Other keys (affine stats) pass through."""
    embed = stats["embed"]
    usage = stats["cluster_size"]
    b, n, h, d = z.shape

    if embed.ndim == 2:
        dead = usage < threshold
        valid = jnp.broadcast_to(mask[..., None], (b, n, h))
        samples = sample_valid_vectors(z, valid, embed.shape[0], rng)
        rep = lambda x, new: jnp.where(dead[:, None], new.astype(x.dtype), x)
        return dict(
            stats,
            embed=rep(embed, samples),
            embed_avg=rep(stats["embed_avg"], samples * threshold),
            ema_cluster_size=jnp.where(dead, threshold, stats["ema_cluster_size"]),
            cluster_size=jnp.where(dead, threshold, usage),
        )

    def per_head(emb_h, avg_h, emac_h, use_h, zh, key):
        dead = use_h < threshold
        samples = sample_valid_vectors(zh, mask, emb_h.shape[0], key)
        rep = lambda x, new: jnp.where(dead[:, None], new.astype(x.dtype), x)
        return (
            rep(emb_h, samples),
            rep(avg_h, samples * threshold),
            jnp.where(dead, threshold, emac_h),
            jnp.where(dead, threshold, use_h),
        )

    keys = jax.random.split(rng, h)
    emb, avg, emac, use = jax.vmap(per_head, in_axes=(0, 0, 0, 0, 2, 0))(
        embed, stats["embed_avg"], stats["ema_cluster_size"], usage, z, keys
    )
    return dict(
        stats, embed=emb, embed_avg=avg, ema_cluster_size=emac, cluster_size=use
    )


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
    flat_x: jnp.ndarray,
    codebook_size: int,
    rng: jax.Array,
    iters: int = 10,
    return_bins: bool = False,
):
    """k-means codebook init (reference vector_quantize.py:180-220).

    return_bins=True also returns the final assignment counts (z,) — the
    reference's init_embed_ seeds the EMA buffers with them (cluster_size =
    bins, embed_avg = embed * bins)."""
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

    means = jax.lax.fori_loop(0, iters, body, means)
    if not return_bins:
        return means
    idx = jnp.argmin(_euclidean_sq_dist(flat_x, means), axis=-1)
    bins = jax.nn.one_hot(idx, codebook_size, dtype=flat_x.dtype).sum(axis=0)
    return means, bins


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
