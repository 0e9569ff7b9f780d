"""Pallas TPU kernel: packed-sequence attention with block-diagonal masking.

The model attends within packed rows where tokens of different images must not
mix (NaViT packing; reference builds an explicit (b, 1, s, s) boolean mask,
feature_extraction...py:580-584, consumed by HF CLIP attention).  The XLA
einsum path materializes (b, heads, s, s) float32 logits in HBM per layer —
at (64 rows, 16 heads, 256 tokens) that is ~270 MB of HBM traffic per matmul
stack.  This kernel instead:

  * derives the mask on the fly from per-token segment ids (image id, with
    padding forced to a sentinel) — the (s, s) mask never exists in memory;
  * computes logits, softmax, and the value matmul in one VMEM-resident pass
    per (batch, head, q-block) grid cell.  The full k/v stripe plus (bq, s)
    logits fit the raised 100 MB VMEM scope up to s ~ 16k — far beyond the
    3072-token cap the packing pipeline produces (factory.py CDF formula) —
    so no online-softmax second pass is needed; HBM traffic would be the
    same either way (both stream the k/v stripe once per q block);
  * runs matmuls on the MXU in bf16 with float32 accumulation, softmax in
    float32 on the VPU.

Gradients: custom_vjp with pallas kernels on BOTH sides.  The backward is the
standard flash decomposition — attention weights are recomputed block-wise
from the saved log-sum-exp, so the (b, h, s, s) probability tensor never
exists in HBM:
  * a dq kernel over (batch*head, q-block) cells: p = exp(qk*scale - lse),
    ds = p * (do.v^T - delta) * scale, dq = ds.k  (delta = rowsum(do*o));
  * a dk/dv kernel over (batch*head, k-block) cells computing the transposed
    quantities: dv = p^T.do, dk = ds^T.q.
Like the forward, each cell loads the full opposite stripe (stripes fit the
raised VMEM scope; see forward notes) — no online-softmax second pass needed.
Matmul operands stay in the training dtype (bf16) with f32 accumulation.

Measured on v5e, bf16, full fwd+bwd via value_and_grad (grad outputs consumed
by sums of squares so XLA cannot DCE or reassociate anything):
  s=1024 (b=8,h=16,d=64): pallas 2.63 ms vs XLA einsum path 8.76 ms (3.34x)
  s=3072 (b=2,h=16,d=64): pallas 4.47 ms vs XLA 18.15 ms (4.06x)
with grad rel-diffs <= 8e-3 (bf16 rounding).  f32 dq/dk/dv match the XLA
recompute backward bit-for-bit on-chip.

causal=True (AR training over token dumps, models/ar.py) ANDs a k_pos <=
q_pos constraint into the segment mask; positions derive from the grid
indices, so the kernels gain no operands.  Same-session A/B, same shapes:
  s=1024: pallas 2.75 ms vs XLA causal 8.57 ms (3.12x)
  s=3072: pallas 4.35 ms vs XLA 18.18 ms (4.17x)
(grad rel-diffs <= 2e-2 in bf16).  The full k stripe is still loaded per
q-block — skipping above-diagonal k blocks needs an online-softmax second
pass for ~2x more; at these lengths the HBM win over XLA already dominates.

`mode='bias'` replicates the reference's effective +1-logit-bias semantics
(see models/transformer.py docstring) instead of true masking.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _q_block_size(s: int) -> int:
    """Largest q block <= 512 that divides s AND is lane-aligned (%128).

    Mosaic requires the trailing block dim of the (b, 1, s) id arrays to be a
    multiple of 128 or equal to s, so only 128-multiples qualify.  Lengths
    with no such divisor (e.g. s=2352 from a 28x28x3 lossless grid) fall back
    to bq=s — the (s, s) logits then need the raised VMEM scope below, which
    covers packed sequences up to the 3072 cap."""
    for bq in (512, 384, 256, 128):
        if s % bq == 0:
            return bq
    return s


def _causal_allowed(allowed, q_block_start, bq, s):
    """AND the packed-segment mask with k_pos <= q_pos (row positions).

    Causality in packed AR rows is positional within the row: token i may
    attend tokens 0..i of its own image block.  Positions are the row
    indices, so the mask derives from the grid — no extra operands."""
    q_pos = jax.lax.broadcasted_iota(jnp.int32, (bq, s), 0) + q_block_start
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (bq, s), 1)
    return allowed & (k_pos <= q_pos)


def _attn_fwd_kernel(
    qid_ref, kid_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, mode, causal, bq
):
    """One (batch*head, q-block) cell: full-stripe softmax attention.

    qid/kid: (1, 1, bq) / (1, 1, s) int32 segment ids (padding = -1 on the k
    side, -2 on the q side so padded queries match nothing and yield zeros).
    q: (bq, d); k, v: (s, d); o: (bq, d); lse: (1, bq).
    """
    q = q_ref[0, 0]  # (bq, d)
    k = k_ref[0, 0]  # (s, d)
    v = v_ref[0, 0]
    s = k.shape[0]

    logits = jax.lax.dot_general(
        q,
        k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = logits * scale

    allowed = qid_ref[0, 0, :][:, None] == kid_ref[0, 0, :][None, :]
    if causal:
        allowed = _causal_allowed(allowed, pl.program_id(1) * bq, bq, s)
    if mode == "bias":
        # reference parity: boolean mask added to logits (+1 inside block)
        logits = logits + allowed.astype(jnp.float32)
    else:
        logits = jnp.where(allowed, logits, NEG_INF)

    m = jnp.max(logits, axis=-1, keepdims=True)
    # guard fully-masked rows (padded queries): exp(NEG_INF - NEG_INF) would
    # be 1; shift by a safe max instead and renormalize with an epsilon
    m = jnp.maximum(m, NEG_INF * 0.5)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o = o / jnp.maximum(denom, 1e-9)
    o_ref[0, 0] = o.astype(o_ref.dtype)
    lse_ref[0, 0, 0, :] = (m[:, 0] + jnp.log(jnp.maximum(denom[:, 0], 1e-9))).astype(
        jnp.float32
    )


def _flash_attention_fwd_impl(q, k, v, q_ids, kv_ids, scale, mode, causal, interpret):
    b, h, s, d = q.shape
    bq = _q_block_size(s)
    n_q = s // bq

    grid = (b * h, n_q)

    def qkv_index(ib, iq):
        return (ib // h, ib % h, iq, 0)

    def kv_index(ib, iq):
        return (ib // h, ib % h, 0, 0)

    def qid_index(ib, iq):
        return (ib // h, 0, iq)

    def kid_index(ib, iq):
        return (ib // h, 0, 0)

    # ids as (b, 1, s): TPU block shapes need the last-two dims tiled (8, 128)
    # or equal to the array dims; (1, bq) over (b, s) violates the sublane rule
    q_ids = q_ids.reshape(b, 1, s)
    kv_ids = kv_ids.reshape(b, 1, s)

    kernel = functools.partial(
        _attn_fwd_kernel, scale=scale, mode=mode, causal=causal, bq=bq
    )
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq), qid_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), kid_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, d), qkv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, d), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, d), kv_index, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, d), qkv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, bq), lambda ib, iq: (ib // h, ib % h, 0, iq), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, 1, s), jnp.float32),
        ],
        # the full k/v stripe + (bq, s) logits exceed the 16 MB default scope
        # beyond s~2048; v5e physical VMEM comfortably allows 100 MB scopes
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q_ids, kv_ids, q, k, v)
    return o, lse.reshape(b, h, s)


def _attn_dq_kernel(
    qid_ref, kid_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, scale, mode, causal, bq
):
    """One (batch*head, q-block) cell: dq for the block from full k/v stripes.

    q/do/dq: (bq, d); k/v: (s, d); lse/delta: (1, bq) f32.
    p is recomputed from lse (flash bwd): p = exp(logits - lse);
    ds = p * (do.v^T - delta) * scale; dq = ds.k.
    """
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]

    # matmul operands stay in their NATIVE dtype (bf16 in training) with f32
    # accumulation — upcasting operands to f32 would force slow multi-pass
    # f32 MXU matmuls; f32 softmax/ds math happens on the VPU
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    allowed = qid_ref[0, 0, :][:, None] == kid_ref[0, 0, :][None, :]
    if causal:
        allowed = _causal_allowed(allowed, pl.program_id(1) * bq, bq, k.shape[0])
    if mode == "bias":
        logits = logits + allowed.astype(jnp.float32)
    else:
        logits = jnp.where(allowed, logits, NEG_INF)

    p = jnp.exp(logits - lse_ref[0, 0, 0, :][:, None])  # (bq, s) f32
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, s)
    ds = p * (dp - delta_ref[0, 0, 0, :][:, None]) * scale
    dq = jax.lax.dot_general(
        ds.astype(q.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _attn_dkv_kernel(
    qid_ref, kid_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, *, scale, mode, causal, bq
):
    """One (batch*head, k-block) cell: dk/dv for the block from full q stripes.

    k/v/dk/dv: (bk, d); q/do: (s, d); lse/delta: (1, s) f32.
    Transposed recompute: p^T (bk, s); dv = p^T.do; ds^T = p^T * (v.do^T -
    delta) * scale; dk = ds^T.q.
    """
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]

    logits_t = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bk, s)
    allowed_t = kid_ref[0, 0, :][:, None] == qid_ref[0, 0, :][None, :]
    if causal:
        # transposed orientation: rows are k positions, cols are q positions
        s = q.shape[0]
        bk = k.shape[0]
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (bk, s), 0) + pl.program_id(1) * bq
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (bk, s), 1)
        allowed_t = allowed_t & (k_pos <= q_pos)
    if mode == "bias":
        logits_t = logits_t + allowed_t.astype(jnp.float32)
    else:
        logits_t = jnp.where(allowed_t, logits_t, NEG_INF)

    p_t = jnp.exp(logits_t - lse_ref[0, 0, 0, :][None, :])  # (bk, s) f32
    dv = jax.lax.dot_general(
        p_t.astype(do.dtype), do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp_t = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bk, s)
    ds_t = p_t * (dp_t - delta_ref[0, 0, 0, :][None, :]) * scale
    dk = jax.lax.dot_general(
        ds_t.astype(q.dtype), q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _flash_attention_bwd_impl(
    q, k, v, q_ids, kv_ids, o, lse, do, scale, mode, causal, interpret
):
    b, h, s, d = q.shape
    bq = _q_block_size(s)
    n_q = s // bq

    # delta = rowsum(do * o) — one cheap fused XLA reduction
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = delta.reshape(b, h, 1, s)
    lse = lse.reshape(b, h, 1, s)
    q_ids3 = q_ids.reshape(b, 1, s)
    kv_ids3 = kv_ids.reshape(b, 1, s)

    qkv_blk = lambda ib, i: (ib // h, ib % h, i, 0)
    qkv_full = lambda ib, i: (ib // h, ib % h, 0, 0)
    ids_full = lambda ib, i: (ib // h, 0, 0)
    vec_blk = lambda ib, i: (ib // h, ib % h, 0, i)
    vec_full = lambda ib, i: (ib // h, ib % h, 0, 0)

    common = dict(
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def ids_spec_blk(i_axis_blocked):
        # (b, 1, s) ids: block over the last dim only when lane-aligned
        if i_axis_blocked:
            return pl.BlockSpec((1, 1, bq), lambda ib, i: (ib // h, 0, i), memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, 1, s), ids_full, memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_attn_dq_kernel, scale=scale, mode=mode, causal=causal, bq=bq),
        grid=(b * h, n_q),
        in_specs=[
            ids_spec_blk(True),
            ids_spec_blk(False),
            pl.BlockSpec((1, 1, bq, d), qkv_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, d), qkv_full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, d), qkv_full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, d), qkv_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, bq), vec_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, bq), vec_blk, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), qkv_blk, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        **common,
    )(q_ids3, kv_ids3, q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_attn_dkv_kernel, scale=scale, mode=mode, causal=causal, bq=bq),
        grid=(b * h, n_q),
        in_specs=[
            ids_spec_blk(False),
            ids_spec_blk(True),
            pl.BlockSpec((1, 1, s, d), qkv_full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, d), qkv_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, d), qkv_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, d), qkv_full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, s), vec_full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, s), vec_full, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, d), qkv_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, d), qkv_blk, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, s, d), v.dtype),
        ],
        **common,
    )(q_ids3, kv_ids3, q, k, v, do, lse, delta)
    return dq, dk, dv


def _allowed_xla(q_ids, kv_ids, causal):
    allowed = q_ids[:, None, :, None] == kv_ids[:, None, None, :]
    if causal:
        s = q_ids.shape[-1]
        tri = jnp.arange(s)[:, None] >= jnp.arange(s)[None, :]
        allowed = allowed & tri[None, None]
    return allowed


def _reference_attention(q, k, v, q_ids, kv_ids, scale, mode, causal=False):
    """XLA einsum attention over segment ids (used for backward + CPU path)."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    allowed = _allowed_xla(q_ids, kv_ids, causal)
    if mode == "bias":
        logits = logits + allowed.astype(jnp.float32)
    else:
        logits = jnp.where(allowed, logits, NEG_INF)
    m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), NEG_INF * 0.5)
    p = jnp.exp(logits - m)
    denom = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-9)
    w = (p / denom).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash_attention(q, k, v, q_ids, kv_ids, scale, mode, causal, interpret):
    o, _ = _flash_attention_fwd_impl(q, k, v, q_ids, kv_ids, scale, mode, causal, interpret)
    return o


def _fwd(q, k, v, q_ids, kv_ids, scale, mode, causal, interpret):
    o, lse = _flash_attention_fwd_impl(q, k, v, q_ids, kv_ids, scale, mode, causal, interpret)
    return o, (q, k, v, q_ids, kv_ids, o, lse)


def _bwd(scale, mode, causal, interpret, res, do):
    q, k, v, q_ids, kv_ids, o, lse = res
    dq, dk, dv = _flash_attention_bwd_impl(
        q, k, v, q_ids, kv_ids, o, lse, do, scale, mode, causal, interpret
    )
    return dq, dk, dv, None, None


def _xla_recompute_bwd(q, k, v, q_ids, kv_ids, o, lse, do, scale, mode, causal=False):
    """The round-1 XLA backward (materializes (b,h,s,s) twice in HBM) — kept
    as the numerical reference for the pallas bwd kernels (tests) and for
    on-chip A/B measurement."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    allowed = _allowed_xla(q_ids, kv_ids, causal)
    if mode == "bias":
        logits = logits + allowed.astype(jnp.float32)
    else:
        logits = jnp.where(allowed, logits, NEG_INF)
    p = jnp.exp(logits - lse[..., None])  # (b,h,q,k), rows of padded q ~ 0

    do32 = do.astype(jnp.float32)
    o32 = o.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, do32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", do32, v.astype(jnp.float32))
    delta = jnp.sum(do32 * o32, axis=-1, keepdims=True)
    ds = p * (dp - delta) * scale
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32))
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_flash_attention.defvjp(_fwd, _bwd)


def packed_flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    image_ids: jnp.ndarray,
    key_pad_mask: jnp.ndarray,
    scale: float,
    mode: str = "block",
    causal: bool = False,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Attention over packed rows; (b, h, s, d) q/k/v, (b, s) ids and padding.

    Tokens attend only within their image block (mode='block') or get the
    reference's +1 bias (mode='bias').  causal=True additionally restricts
    attention to k_pos <= q_pos within the row (decoder-only AR training over
    token dumps, models/ar.py — the reference's declared downstream,
    prepare_autoregressive_dataset.py:14-71).  Padded keys never receive
    attention; padded queries produce zeros.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ids = image_ids.astype(jnp.int32)
    kv_ids = jnp.where(key_pad_mask, -1, ids)
    q_ids = jnp.where(key_pad_mask, -2, ids)
    return _flash_attention(q, k, v, q_ids, kv_ids, scale, mode, causal, interpret)
