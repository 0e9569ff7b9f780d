"""Masked statistics, MaskGIT-style entropy loss, codebook perplexity.

Pure-JAX ports of the reference's loss/metric numerics
(reference: dct_autoencoder/util.py:341-410).  All functions are jit-safe with
static shapes; the perplexity histogram uses segment_sum instead of
scatter_add_.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def mult_along_first_dims(x: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """x * m where m broadcasts over x's leading dims (reference util.py:341-344)."""
    ndim_to_expand = x.ndim - m.ndim
    return x * m.reshape(m.shape + (1,) * ndim_to_expand)


def masked_mean(x: jnp.ndarray, m: jnp.ndarray, dim=None) -> jnp.ndarray:
    """Mean of x over entries where m (a 0/1 or bool mask on leading dims) is set.

    Mirrors reference util.py:346-353 exactly, including its convention that
    with `dim` given, the division is still by the *total* mask count.
    One guard beyond the reference: an all-zero mask yields 0, not 0/0 NaN —
    grad accumulation + pipeline row padding can produce fully-padded
    micro-batches, whose (zero-weighted) loss must stay finite.
    """
    m = m.astype(x.dtype)
    x = mult_along_first_dims(x, m)
    x = x / jnp.maximum(jnp.sum(m), 1)
    if dim is None:
        return jnp.sum(x)
    return jnp.sum(x, axis=dim)


def compute_entropy_loss(
    affinity: jnp.ndarray,
    mask: jnp.ndarray,
    temperature: float = 0.01,
    eps: float = 1e-9,
) -> jnp.ndarray:
    """MaskGIT-style codebook entropy loss (reference util.py:355-387).

    affinity: (b, s, c, z) code affinities (last dim over codebook entries).
    mask: (b, s) bool, False where padding is.
    Returns sample_entropy - avg_entropy, computed in float32.
    """
    og_dtype = affinity.dtype
    affinity = affinity.astype(jnp.float32)

    b, s = mask.shape
    mask = mask.reshape(b * s)
    affinity = affinity.reshape((b * s,) + affinity.shape[2:])

    logits = affinity / temperature + eps
    probs = jax.nn.softmax(logits, axis=-1)
    log_probs = jax.nn.log_softmax(logits, axis=-1)

    # masked mean over tokens, then mean over codebook heads
    avg_probs = masked_mean(probs, mask, dim=0).mean(axis=0)

    avg_entropy = -jnp.sum(avg_probs * jnp.log(avg_probs + eps))
    sample_entropy = -masked_mean(jnp.sum(probs * log_probs, axis=-1), mask)
    loss = sample_entropy - avg_entropy
    return loss.astype(og_dtype)


def calculate_perplexity(
    codes: jnp.ndarray, codebook_size: int, null_index: int = -1
) -> jnp.ndarray:
    """2^H(p) over the empirical code histogram (reference util.py:391-410).

    Entries equal to `null_index` are excluded.  jit-safe: instead of boolean
    filtering (dynamic shape), null codes are routed to an overflow bucket that
    is dropped from the histogram.
    """
    codes = codes.reshape(-1)
    valid = codes != null_index
    n_valid = jnp.sum(valid)
    bucket = jnp.where(valid, codes, codebook_size)
    counts = jax.ops.segment_sum(
        jnp.ones_like(bucket, dtype=jnp.float32), bucket, num_segments=codebook_size + 1
    )[:codebook_size]
    probs = counts / jnp.maximum(n_valid, 1)
    logits = jnp.where(probs > 0.0, jnp.log2(jnp.maximum(probs, 1e-30)), 0.0)
    entropy = -jnp.sum(probs * logits)
    return 2.0**entropy


def pad_sequence(seqs, max_seq_len: int) -> jnp.ndarray:
    """Right-pad a list of (k_i, ...) arrays to (n, max_seq_len, ...)
    (reference util.py:149-164)."""
    import numpy as np

    back = np.asarray(seqs[0]).shape[1:]
    out = np.zeros((len(seqs), max_seq_len, *back), dtype=np.asarray(seqs[0]).dtype)
    for i, s in enumerate(seqs):
        s = np.asarray(s)
        assert s.shape[0] <= max_seq_len
        out[i, : s.shape[0]] = s
    return jnp.asarray(out)


def ema_update_2d(old: jnp.ndarray, new: jnp.ndarray, alpha: float = 0.8) -> jnp.ndarray:
    """EMA over the overlapping top-left region (reference util.py:208-210);
    functional: returns the updated array."""
    h, w = new.shape[-2], new.shape[-1]
    blended = alpha * new[..., :h, :w] + (1 - alpha) * old[..., :h, :w]
    return old.at[..., :h, :w].set(blended)


def get_decay_fn(start_val: float, end_value: float, n: int):
    """Linear decay schedule fn (reference util.py:609-615)."""

    def fn(i: int) -> float:
        if i > n:
            return end_value
        return ((n - i) / n) * start_val + (i / n) * end_value

    return fn


def psnr(a, b) -> float:
    """RGB-space PSNR in dB between two [0,1] images (clipped; mse floored
    at 1e-12 -> 120 dB cap).  The ONE shared definition — the eval harness
    and the reference-parity tool must report comparable numbers."""
    import numpy as np

    mse = float(np.mean((np.clip(a, 0, 1) - np.clip(b, 0, 1)) ** 2))
    return 10.0 * float(np.log10(1.0 / max(mse, 1e-12)))
