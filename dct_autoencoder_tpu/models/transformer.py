"""CLIP-architecture transformer encoder stack (flax.linen).

Re-implements the behavior of HF's CLIPEncoder as used by the reference
(reference: dct_autoencoder/modeling_dct_autoencoder.py:66-68,81-83):
pre-LayerNorm residual blocks, separate q/k/v/out projections (so CLIP weight
transplants map 1:1), quick-gelu MLP.  Attention logits and softmax run in
float32 regardless of the compute dtype; matmuls target the MXU in the
caller's dtype (bfloat16 for training/serving).

Masking is derived from packing metadata (per-token image ids + padding), not
from a materialized (b, 1, s, s) mask tensor (which the reference builds at
feature_extraction...py:580-584 and ships through every layer).  Two
implementations:
  * 'pallas' — fused packed flash-attention kernel (kernels/attention.py);
    the mask never exists in memory;
  * 'xla'    — einsum attention with an additive bias built from the ids.
'auto' picks pallas on TPU backends.

Mask semantics ('block' vs the reference-parity 'bias' mode) are documented in
models/config.py.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..kernels.attention import packed_flash_attention
from .config import TransformerConfig

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class AttentionContext:
    """Packing metadata driving the attention mask."""

    image_ids: jnp.ndarray  # (b, s) int
    key_pad_mask: jnp.ndarray  # (b, s) bool, True where padding
    mode: str = "block"  # 'block' | 'bias' (see config.attn_mask_mode)
    impl: str = "auto"  # 'auto' | 'pallas' | 'xla'
    # additionally require k-position <= q-position (decoder-only LMs over
    # token dumps, models/ar.py); supported by both the pallas kernel (the
    # causal mask derives from grid positions) and the XLA path
    causal: bool = False

    def resolved_impl(self, seq_len: Optional[int] = None) -> str:
        if self.impl != "auto":
            return self.impl
        if jax.default_backend() != "tpu":
            return "xla"
        # measured crossover on v5e: XLA's fused attention edges out the
        # kernel at s=256 (5.5 vs 5.9 ms) while the kernel wins 1.3x at 1024
        # and 2.2x at 3072 (where XLA materializes (b,h,s,s) logits in HBM)
        if seq_len is not None and seq_len < 512:
            return "xla"
        return "pallas"

    def xla_bias(self) -> jnp.ndarray:
        """(b, 1, s, s) additive float32 bias (same semantics as the packed
        block-diagonal mask (ids_i == ids_j) & ~pad_j)."""
        ids = self.image_ids
        allowed = (ids[:, None, :, None] == ids[:, None, None, :]) & (
            ~self.key_pad_mask[:, None, None, :]
        )
        if self.causal:
            s = ids.shape[-1]
            tri = jnp.arange(s)[:, None] >= jnp.arange(s)[None, :]
            allowed = allowed & tri[None, None]
        if self.mode == "bias":
            return allowed.astype(jnp.float32)
        return jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)


# pytree registration so AttentionContext flows through jit without becoming static
jax.tree_util.register_dataclass(
    AttentionContext,
    data_fields=["image_ids", "key_pad_mask"],
    meta_fields=["mode", "impl", "causal"],
)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


_ACTS = {
    "quick_gelu": quick_gelu,
    "gelu": jax.nn.gelu,
    "relu": jax.nn.relu,
}


def _dense(cfg: TransformerConfig, features: int, dtype, name: str):
    """nn.Dense, or the int8-serving Int8Dense when cfg.quantize_int8
    (models/quant.py — per-channel int8 weights + dynamic per-token
    activation quant on the int8 MXU path)."""
    if getattr(cfg, "quantize_int8", False):
        from .quant import Int8Dense

        return Int8Dense(
            features,
            dtype=dtype,
            mode=getattr(cfg, "quantize_int8_mode", "weight_only"),
            group_size=getattr(cfg, "quantize_int8_group_size", 0),
            name=name,
        )
    return nn.Dense(features, dtype=dtype, name=name)


class MultiHeadAttention(nn.Module):
    config: TransformerConfig
    dtype: jnp.dtype = jnp.float32
    # KV-cache length for single-token autoregressive decoding (0 = off).
    # With cache_size > 0 and x of length 1, keys/values append into 'cache'
    # collection variables and attention runs over the cached prefix — apply
    # with mutable=['cache'] per step (used by models/ar.py sampling).
    cache_size: int = 0

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, attn: AttentionContext, deterministic: bool = True
    ) -> jnp.ndarray:
        cfg = self.config
        d = cfg.hidden_size
        h = cfg.num_attention_heads
        head_dim = d // h
        scale = head_dim**-0.5

        dense = lambda name: _dense(cfg, d, self.dtype, name)
        q = dense("q_proj")(x)
        k = dense("k_proj")(x)
        v = dense("v_proj")(x)

        b, s, _ = x.shape
        split = lambda t: t.reshape(b, s, h, head_dim).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)

        if self.cache_size > 0:
            assert s == 1, "KV-cached decode consumes one token at a time"
            S = self.cache_size
            ck = self.variable(
                "cache", "k", lambda: jnp.zeros((b, h, S, head_dim), self.dtype)
            )
            cv = self.variable(
                "cache", "v", lambda: jnp.zeros((b, h, S, head_dim), self.dtype)
            )
            ci = self.variable("cache", "idx", lambda: jnp.zeros((), jnp.int32))
            idx = ci.value
            ck.value = jax.lax.dynamic_update_slice(ck.value, k, (0, 0, idx, 0))
            cv.value = jax.lax.dynamic_update_slice(cv.value, v, (0, 0, idx, 0))
            ci.value = idx + 1
            # causal over the filled prefix (single sequence per row)
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", q, ck.value, preferred_element_type=jnp.float32
            ) * scale
            valid = (jnp.arange(S) <= idx)[None, None, None, :]
            logits = jnp.where(valid, logits, NEG_INF)
            weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", weights, cv.value)
        elif attn.resolved_impl(s) == "pallas":
            out = packed_flash_attention(
                q, k, v, attn.image_ids, attn.key_pad_mask, scale,
                mode=attn.mode, causal=attn.causal,
            )
        else:
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * scale
            logits = logits + attn.xla_bias()
            weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
            if cfg.attention_dropout > 0.0:
                weights = nn.Dropout(rate=cfg.attention_dropout)(
                    weights, deterministic=deterministic
                )
            out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)

        out = out.astype(self.dtype).transpose(0, 2, 1, 3).reshape(b, s, d)
        return dense("out_proj")(out)


class EncoderLayer(nn.Module):
    config: TransformerConfig
    dtype: jnp.dtype = jnp.float32
    cache_size: int = 0

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, attn: AttentionContext, deterministic: bool = True
    ) -> jnp.ndarray:
        cfg = self.config
        act = _ACTS[cfg.hidden_act]
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name=name)

        # Megatron-SP (config.sequence_parallel): layernorms, residual adds
        # and the MLP activation run with the token axis sharded over the
        # model axis; attention and the TP matmul blocks see the gathered
        # sequence. XLA SPMD turns the gather/scatter pair into
        # all-gather + reduce-scatter around each block (the classic SP
        # collective rewrite), cutting per-chip activation memory by tp.
        if cfg.sequence_parallel:
            from ..parallel.mesh import sp_scatter, sp_gather
        else:
            sp_scatter = sp_gather = lambda t: t

        residual = sp_scatter(x)
        x = ln("layer_norm1")(residual)
        x = MultiHeadAttention(
            cfg, dtype=self.dtype, cache_size=self.cache_size, name="self_attn"
        )(sp_gather(x), attn, deterministic=deterministic)
        x = residual + sp_scatter(x)

        residual = x
        x = ln("layer_norm2")(x)
        x = _dense(cfg, cfg.intermediate_size, self.dtype, "fc1")(sp_gather(x))
        x = act(x)
        if cfg.dropout > 0.0:
            x = nn.Dropout(rate=cfg.dropout)(x, deterministic=deterministic)
        x = _dense(cfg, cfg.hidden_size, self.dtype, "fc2")(x)
        return residual + sp_scatter(x)


class TransformerEncoder(nn.Module):
    """Stack of pre-LN CLIP encoder layers.

    With `pipeline` set (a parallel.pipeline.PipelineSpec), the stack runs as
    a GPipe pipeline: layers split into mesh-`model`-axis stages,
    microbatches streamed through with ppermute hops (see
    parallel/pipeline.py).  Params keep the plain per-layer `layers_{i}`
    layout (checkpoints unchanged); the (L,)-stacked view is built at trace
    time.  Requires homogeneous layers (no per-layer int8/bf16 mix) and no
    active dropout (pipeline stages carry no per-microbatch rng stream)."""

    config: TransformerConfig
    dtype: jnp.dtype = jnp.float32
    # KV-cache length for token-at-a-time decode (see MultiHeadAttention)
    cache_size: int = 0
    # GPipe pipeline parallelism (parallel.pipeline.PipelineSpec) — static
    # hashable module attr, None = ordinary sequential stack
    pipeline: Optional[object] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, attn: AttentionContext, deterministic: bool = True
    ) -> jnp.ndarray:
        if self.pipeline is not None and not self.is_initializing():
            return self._pipelined(x, attn, deterministic)
        layer_cls = EncoderLayer
        if self.config.remat:
            # static_argnums: deterministic is static; AttentionContext's meta
            # fields are static; the pytree itself is a valid traced arg
            layer_cls = nn.remat(EncoderLayer, static_argnums=(2,))
        bf16_layers = getattr(self.config, "quantize_int8_bf16_layers", ())
        for i in range(self.config.num_hidden_layers):
            cfg_i = self.config
            if getattr(cfg_i, "quantize_int8", False) and i in bf16_layers:
                # per-layer bf16 fallback inside an int8 stack (the int8
                # sensitivity lever — see models/quant.py)
                cfg_i = dataclasses.replace(cfg_i, quantize_int8=False)
            x = layer_cls(
                cfg_i, dtype=self.dtype, cache_size=self.cache_size,
                name=f"layers_{i}",
            )(x, attn, deterministic)
        return x

    def _pipelined(
        self, x: jnp.ndarray, attn: AttentionContext, deterministic: bool
    ) -> jnp.ndarray:
        from ..parallel.pipeline import pipeline_stack_apply, stack_layer_params

        cfg = self.config
        assert not getattr(cfg, "quantize_int8_bf16_layers", ()) or not getattr(
            cfg, "quantize_int8", False
        ), "pipeline requires homogeneous layers (no per-layer bf16 fallback)"
        assert deterministic or (cfg.dropout == 0.0 and cfg.attention_dropout == 0.0), (
            "pipelined stack does not thread dropout rngs"
        )
        assert self.cache_size == 0, "pipeline is a training/encode path, not KV decode"
        stacked = stack_layer_params(
            self.variables["params"], cfg.num_hidden_layers
        )
        layer = EncoderLayer(cfg, dtype=self.dtype)
        meta = dict(mode=attn.mode, impl=attn.impl, causal=attn.causal)

        def layer_apply(p, xm, ids, pad):
            ctx = AttentionContext(image_ids=ids, key_pad_mask=pad, **meta)
            return layer.apply({"params": p}, xm, ctx, deterministic)

        return pipeline_stack_apply(
            layer_apply,
            stacked,
            x,
            attn.image_ids,
            attn.key_pad_mask,
            self.pipeline,
            remat=cfg.remat,
        )


def make_attn_bias(attn_mask: jnp.ndarray, mode: str = "block") -> jnp.ndarray:
    """(b, 1, s, s) bool allowed-mask -> additive float32 logit bias.

    Retained for API parity with callers holding an explicit mask; the model
    itself now derives masking from packing metadata (AttentionContext).
    """
    if mode == "block":
        return jnp.where(attn_mask, 0.0, NEG_INF).astype(jnp.float32)
    if mode == "bias":
        return attn_mask.astype(jnp.float32)
    raise ValueError(f"unknown attn mask mode: {mode}")
