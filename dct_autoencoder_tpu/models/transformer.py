"""CLIP-architecture transformer encoder stack (flax.linen).

Re-implements the behavior of HF's CLIPEncoder as used by the reference
(reference: dct_autoencoder/modeling_dct_autoencoder.py:66-68,81-83):
pre-LayerNorm residual blocks, separate q/k/v/out projections (so CLIP weight
transplants map 1:1), quick-gelu MLP.  Attention logits and softmax run in
float32 regardless of the compute dtype; matmuls target the MXU in the
caller's dtype (bfloat16 for training/serving).

Masking: callers pass an additive float bias `attn_bias` of shape
(b, 1, s, s) built by `make_attn_bias`.  The default 'block' mode applies the
packed block-diagonal mask properly (large negative outside the allowed
block).  'bias' mode replicates the reference's *effective* behavior — HF CLIP
adds the boolean mask to the logits, i.e. a +1.0 logit bias inside the block
and 0 outside (see the reference's open TODO at modeling...py:143-144).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .config import TransformerConfig

NEG_INF = -1e9


def make_attn_bias(attn_mask: jnp.ndarray, mode: str = "block") -> jnp.ndarray:
    """(b, 1, s, s) bool allowed-mask -> additive float32 logit bias."""
    if mode == "block":
        return jnp.where(attn_mask, 0.0, NEG_INF).astype(jnp.float32)
    if mode == "bias":
        return attn_mask.astype(jnp.float32)
    raise ValueError(f"unknown attn mask mode: {mode}")


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


_ACTS = {
    "quick_gelu": quick_gelu,
    "gelu": jax.nn.gelu,
    "relu": jax.nn.relu,
}


class MultiHeadAttention(nn.Module):
    config: TransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_bias: Optional[jnp.ndarray]) -> jnp.ndarray:
        cfg = self.config
        d = cfg.hidden_size
        h = cfg.num_attention_heads
        head_dim = d // h
        scale = head_dim**-0.5

        dense = lambda name: nn.Dense(d, dtype=self.dtype, name=name)
        q = dense("q_proj")(x) * scale
        k = dense("k_proj")(x)
        v = dense("v_proj")(x)

        b, s, _ = x.shape
        split = lambda t: t.reshape(b, s, h, head_dim).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)

        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        if attn_bias is not None:
            logits = logits + attn_bias  # (b, 1, s, s) broadcasts over heads
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, d)
        return dense("out_proj")(out)


class EncoderLayer(nn.Module):
    config: TransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_bias: Optional[jnp.ndarray]) -> jnp.ndarray:
        cfg = self.config
        act = _ACTS[cfg.hidden_act]
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name=name)

        residual = x
        x = ln("layer_norm1")(x)
        x = MultiHeadAttention(cfg, dtype=self.dtype, name="self_attn")(x, attn_bias)
        x = residual + x

        residual = x
        x = ln("layer_norm2")(x)
        x = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(x)
        x = act(x)
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(x)
        return residual + x


class TransformerEncoder(nn.Module):
    """Stack of pre-LN CLIP encoder layers."""

    config: TransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_bias: Optional[jnp.ndarray]) -> jnp.ndarray:
        for i in range(self.config.num_hidden_layers):
            x = EncoderLayer(self.config, dtype=self.dtype, name=f"layers_{i}")(x, attn_bias)
        return x
