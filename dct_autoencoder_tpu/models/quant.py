"""int8 quantized serving path for the transformer stacks.

The serving forward is matmul-bound (two CLIP stacks over packed tokens —
SURVEY §3.1 hot loops); v5e's MXU runs int8 x int8 -> int32 at 2x the bf16
rate (394 TOPS vs 197 TFLOPS).  This module provides:

  * `Int8Dense` — drop-in Dense with per-OUTPUT-channel symmetric int8
    weights and DYNAMIC per-token symmetric activation quantization.  Both
    matmul operands are int8, so XLA lowers onto the int8 MXU path; scales
    are applied to the int32 accumulator.
  * `quantize_dense_params` — converts trained f32/bf16 Dense kernels into
    the (kernel_q int8, kernel_scale f32) pair Int8Dense expects.

Swap-in is config-driven: `TransformerConfig.quantize_int8=True` makes the
transformer stacks build Int8Dense instead of nn.Dense (models/
transformer.py), and `quantize_model_for_serving` rewrites a trained
DCTAutoencoder into the quantized serving form.  LFQ/patch-embed/proj-out
projections stay bf16 — they are <2% of the FLOPs and LFQ bit-exactness of
the token stream is sensitive to the quantizer input.

No counterpart in the reference (its 8-bit machinery is the PagedAdamW8bit
OPTIMIZER, a CUDA memory workaround — main.py:420-425); this is a serving
capability upgrade.

Measured (v5e, headline bench shapes, BENCH_MODE=int8 INT8_MODE=dynamic,
same-session A/B): **5,571 img/s vs 5,329 bf16 at 64 rows (+4.5%)** and
**5,124 vs 4,692 at 128 rows (+9%)** — the int8 MXU rate wins over the
per-token quantization overhead, more so as the batch grows.  The round-3
sensitivity study (docs/int8_study_r3.md) showed the best operating point is
`dynamic` + `quantize_int8_bf16_layers=(0, 1)`: **+5.7 to +6.9% over bf16**
AND at the 8-bit weight-rounding flip floor (~2.5% on the lightly-trained
study checkpoint; margin-limited, proven by a noise-equivalence probe).
Since flipped tokens change the serving contract of a TOKENIZER,
`weight_only` (bit-identical activations math in bf16, half weight HBM,
~bf16 speed) stays the default and dynamic+first2-bf16 is the explicit
max-throughput opt-in.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _quantize_weight(w: np.ndarray, group_size: int = 0):
    """(in, out) float kernel -> int8 kernel + f32 scales.

    group_size=0: per-output-channel scales, shape (out,).
    group_size=g: group-wise scales over the INPUT dim, shape (in//g, out) —
    each scale covers a (g, out-channel) block, cutting weight rounding error
    roughly by the local/global amax ratio.  `in` must divide by g.
    """
    w = np.asarray(w, dtype=np.float32)
    if group_size:
        d_in, d_out = w.shape
        assert d_in % group_size == 0, (d_in, group_size)
        wg = w.reshape(d_in // group_size, group_size, d_out)
        scale = np.abs(wg).max(axis=1) / 127.0  # (groups, out)
        scale = np.where(scale == 0.0, 1.0, scale)
        q = np.clip(np.round(wg / scale[:, None, :]), -127, 127)
        return q.reshape(d_in, d_out).astype(np.int8), scale.astype(np.float32)
    scale = np.abs(w).max(axis=0) / 127.0
    scale = np.where(scale == 0.0, 1.0, scale)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


class Int8Dense(nn.Module):
    """Dense with per-output-channel int8 weights; two activation modes.

    mode='weight_only' (default): weights dequantize on the fly
      (w_q * scale -> compute dtype) and the matmul runs at full bf16 MXU
      rate — dequant is O(in*out), negligible next to the O(tokens*in*out)
      matmul.  Weight HBM halves; speed ~= bf16.
    mode='dynamic': per-token symmetric activation quantization so BOTH
      operands are int8 (int8 MXU path).  Measured FASTER than bf16 at the
      headline shapes (+4.5% at 64 rows, +9% at 128 — see module docstring)
      but ~2% of tokens flip, so it is the explicit opt-in, not the default.

    Weight params are expected to be REWRITTEN from a trained model by
    `quantize_dense_params` — the random init here only exists so
    module.init produces the right shapes/dtypes.
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    mode: str = "weight_only"
    # >0: group-wise weight scales over the input dim (scale per
    # (group_size, out-channel) block).  Finer scales cut the weight rounding
    # error — the DOMINANT source of token flips (docs/int8_study_r3.md) —
    # at the cost of a (in//g, out) scale tensor and, in dynamic mode, a
    # G-batched int8 matmul instead of one flat one.
    group_size: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.mode in ("weight_only", "dynamic"), (
            f"quantize_int8_mode must be 'weight_only' or 'dynamic', got "
            f"{self.mode!r}"
        )
        in_dim = x.shape[-1]
        g = self.group_size
        assert g == 0 or in_dim % g == 0, (in_dim, g)
        kernel_q = self.param(
            "kernel_q",
            lambda rng, shape: jnp.zeros(shape, jnp.int8),
            (in_dim, self.features),
        )
        scale_shape = (in_dim // g, self.features) if g else (self.features,)
        kernel_scale = self.param("kernel_scale", nn.initializers.ones, scale_shape)

        if self.mode == "weight_only":
            if g:
                w = kernel_q.astype(jnp.float32).reshape(-1, g, self.features)
                w = (w * kernel_scale[:, None, :]).reshape(in_dim, self.features)
            else:
                w = kernel_q.astype(jnp.float32) * kernel_scale
            y = jax.lax.dot_general(
                x.astype(self.dtype),
                w.astype(self.dtype),
                (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            # dynamic symmetric per-token activation quantization
            xf = x.astype(jnp.float32)
            amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
            x_scale = jnp.maximum(amax, 1e-8) / 127.0
            xq = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
            if g:
                # G-batched int8 matmul: per-group int32 accumulators so each
                # group's scale applies before the cross-group sum
                lead = xq.shape[:-1]
                xg = xq.reshape(*lead, in_dim // g, g)
                wg = kernel_q.reshape(in_dim // g, g, self.features)
                acc = jnp.einsum(
                    "...Gg,Ggo->...Go", xg, wg, preferred_element_type=jnp.int32
                )
                y = (acc.astype(jnp.float32) * kernel_scale).sum(axis=-2) * x_scale
            else:
                acc = jax.lax.dot_general(
                    xq,
                    kernel_q,
                    (((x.ndim - 1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                y = acc.astype(jnp.float32) * x_scale * kernel_scale
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y.astype(self.dtype)


def quantize_dense_params(params: Any, group_size: int = 0) -> Any:
    """Rewrite every Dense {kernel, bias} subtree into Int8Dense params.

    Only applies to subtrees that look like Dense params (a 2-D 'kernel'
    leaf); everything else passes through unchanged.
    """
    return _quantize_stack(params, group_size)


def quantize_transformer_params(
    params: Any, encoder_bf16_layers=(), decoder_bf16_layers=(), group_size: int = 0
) -> Any:
    """Quantize ONLY the encoder/decoder transformer stacks of a
    DCTAutoencoder param tree (patch embed / LFQ / proj_out stay bf16).
    Layers listed in *_bf16_layers keep their fp Dense params (must match
    config.quantize_int8_bf16_layers)."""
    out = dict(params)
    for stack, bf16 in (("encoder", encoder_bf16_layers), ("decoder", decoder_bf16_layers)):
        if stack in out:
            skip = frozenset(f"layers_{i}" for i in bf16)
            out[stack] = {
                k: (v if k in skip else _quantize_stack(v, group_size))
                for k, v in out[stack].items()
            }
    return out


def _quantize_stack(node: Any, group_size: int = 0) -> Any:
    if isinstance(node, dict):
        if "kernel" in node and getattr(node["kernel"], "ndim", 0) == 2:
            q, scale = _quantize_weight(np.asarray(node["kernel"]), group_size)
            out = {"kernel_q": jnp.asarray(q), "kernel_scale": jnp.asarray(scale)}
            if "bias" in node:
                out["bias"] = jnp.asarray(np.asarray(node["bias"], np.float32))
            return out
        return {k: _quantize_stack(v, group_size) for k, v in node.items()}
    return node


def quantize_model_for_serving(
    model,
    mode: str = None,
    encoder_bf16_layers=(),
    decoder_bf16_layers=(),
    group_size: int = 0,
) -> "Any":
    """Trained DCTAutoencoder -> int8-serving DCTAutoencoder.

    Builds a sibling model whose transformer stacks use Int8Dense
    (config.encoder_config.quantize_int8=True) and rewrites the trained
    params into quantized form.  Same API surface (forward/encode/decode).
    mode overrides quantize_int8_mode ('weight_only'/'dynamic');
    *_bf16_layers keep those layer indices fp — the measured sensitivity
    (docs/int8_study_r3.md) is that EARLY encoder layers dominate token
    flips (quant noise amplifies through the stack), so protect low indices
    first; group_size>0 uses group-wise weight scales (the weight rounding
    error is the dominant flip source).
    """
    import copy

    from .autoencoder import DCTAutoencoder

    cfg = copy.deepcopy(model.config)
    cfg.encoder_config.quantize_int8 = True
    cfg.decoder_config.quantize_int8 = True
    cfg.encoder_config.quantize_int8_bf16_layers = tuple(encoder_bf16_layers)
    cfg.decoder_config.quantize_int8_bf16_layers = tuple(decoder_bf16_layers)
    cfg.encoder_config.quantize_int8_group_size = group_size
    cfg.decoder_config.quantize_int8_group_size = group_size
    if mode is not None:
        cfg.encoder_config.quantize_int8_mode = mode
        cfg.decoder_config.quantize_int8_mode = mode
    qmodel = DCTAutoencoder(cfg, dtype=model.dtype)
    qparams = quantize_transformer_params(
        model.params, encoder_bf16_layers, decoder_bf16_layers, group_size
    )
    assert jax.tree_util.tree_structure(qparams) == jax.tree_util.tree_structure(
        qmodel.params
    ), "quantized param tree does not match the Int8Dense module structure"
    qmodel.params = qparams
    qmodel.patchnorm = model.patchnorm
    qmodel.vq_stats = model.vq_stats
    return qmodel
