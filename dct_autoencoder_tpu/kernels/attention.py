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
    per (batch, head, q-block) grid cell (sequence lengths here are <= 3072,
    so a full k/v stripe fits VMEM and no online-softmax pass is needed);
  * runs matmuls on the MXU in bf16 with float32 accumulation, softmax in
    float32 on the VPU.

Gradients: custom_vjp with a pallas forward (saving the log-sum-exp) and an
XLA recompute backward — training memory matches the einsum path while the
forward (the serving hot path) stays fused.

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
    for bq in (512, 256, 128):
        if s % bq == 0:
            return bq
    return s


def _attn_fwd_kernel(qid_ref, kid_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, mode):
    """One (batch*head, q-block) cell: full-stripe softmax attention.

    qid/kid: (1, 1, bq) / (1, 1, s) int32 segment ids (padding = -1 on the k
    side, -2 on the q side so padded queries match nothing and yield zeros).
    q: (bq, d); k, v: (s, d); o: (bq, d); lse: (1, bq).
    """
    q = q_ref[0, 0]  # (bq, d)
    k = k_ref[0, 0]  # (s, d)
    v = v_ref[0, 0]

    logits = jax.lax.dot_general(
        q,
        k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = logits * scale

    allowed = qid_ref[0, 0, :][:, None] == kid_ref[0, 0, :][None, :]
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


def _flash_attention_fwd_impl(q, k, v, q_ids, kv_ids, scale, mode, interpret):
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

    kernel = functools.partial(_attn_fwd_kernel, scale=scale, mode=mode)
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
        interpret=interpret,
    )(q_ids, kv_ids, q, k, v)
    return o, lse.reshape(b, h, s)


def _reference_attention(q, k, v, q_ids, kv_ids, scale, mode):
    """XLA einsum attention over segment ids (used for backward + CPU path)."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    allowed = q_ids[:, None, :, None] == kv_ids[:, None, None, :]
    if mode == "bias":
        logits = logits + allowed.astype(jnp.float32)
    else:
        logits = jnp.where(allowed, logits, NEG_INF)
    m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), NEG_INF * 0.5)
    p = jnp.exp(logits - m)
    denom = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-9)
    w = (p / denom).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash_attention(q, k, v, q_ids, kv_ids, scale, mode, interpret):
    o, _ = _flash_attention_fwd_impl(q, k, v, q_ids, kv_ids, scale, mode, interpret)
    return o


def _fwd(q, k, v, q_ids, kv_ids, scale, mode, interpret):
    o, lse = _flash_attention_fwd_impl(q, k, v, q_ids, kv_ids, scale, mode, interpret)
    return o, (q, k, v, q_ids, kv_ids, o, lse)


def _bwd(scale, mode, interpret, res, do):
    q, k, v, q_ids, kv_ids, o, lse = res
    # recompute attention weights from the saved log-sum-exp (flash-style)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    allowed = q_ids[:, None, :, None] == kv_ids[:, None, None, :]
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
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None, None


_flash_attention.defvjp(_fwd, _bwd)


def packed_flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    image_ids: jnp.ndarray,
    key_pad_mask: jnp.ndarray,
    scale: float,
    mode: str = "block",
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Attention over packed rows; (b, h, s, d) q/k/v, (b, s) ids and padding.

    Tokens attend only within their image block (mode='block') or get the
    reference's +1 bias (mode='bias').  Padded keys never receive attention;
    padded queries produce zeros.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ids = image_ids.astype(jnp.int32)
    kv_ids = jnp.where(key_pad_mask, -1, ids)
    q_ids = jnp.where(key_pad_mask, -2, ids)
    return _flash_attention(q, k, v, q_ids, kv_ids, scale, mode, interpret)
