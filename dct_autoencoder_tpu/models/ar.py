"""Autoregressive model over DCT token dumps — the downstream the tokenizer
exists for.

The reference exports token streams specifically "for training downstream
autoregressive models" (reference prepare_autoregressive_dataset.py:14-71)
but contains no AR model itself; this module supplies a working decoder-only
transformer over those records so the export->train->sample->decode loop
closes inside this framework.

Formulation: each timestep is one tokenizer token — 16 LFQ codebook indices
plus its (channel, row, col) grid position.  The model conditions on the
POSITION LAYOUT (positions come from the importance sampler and are known at
decode time from the record being completed) and predicts the code indices:

  logits_t = f(codes_<t, positions_<=t)          # teacher-forced training
  p(codes_t) = prod_c softmax(logits_t[c])       # independent per codebook

Embeddings mirror the autoencoder's factorized scheme (sum of per-codebook
code embeds + channel/row/col position embeds, modeling...py:41-59); the
stack is the same TransformerEncoder with causal+block masking (packed rows
of multiple images work unchanged — image ids keep sequences separate, the
causal flag adds the triangular constraint).  Sampling is coarse-to-fine for
free: the token order is the importance order, so prefix-sampling yields the
progressive decode the tokenizer is known for (reference decode_gif.py).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .config import TransformerConfig
from .transformer import AttentionContext, TransformerEncoder


@dataclasses.dataclass
class ARConfig:
    codebook_size: int = 8192
    num_codebooks: int = 16
    image_channels: int = 3
    max_patch_h: int = 32
    max_patch_w: int = 32
    transformer: TransformerConfig = dataclasses.field(
        default_factory=lambda: TransformerConfig(
            hidden_size=512, intermediate_size=2048, num_hidden_layers=6,
            num_attention_heads=8,
        )
    )


class ARTokenModel(nn.Module):
    config: ARConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        h = cfg.transformer.hidden_size
        emb = nn.initializers.normal(stddev=0.02)
        # one embedding table per codebook (indices are per-codebook spaces)
        self.code_embed = self.param(
            "code_embed", emb, (cfg.num_codebooks, cfg.codebook_size, h)
        )
        self.pos_embed_channel = self.param("pos_embed_channel", emb, (cfg.image_channels, h))
        self.pos_embed_height = self.param("pos_embed_height", emb, (cfg.max_patch_h, h))
        self.pos_embed_width = self.param("pos_embed_width", emb, (cfg.max_patch_w, h))
        self.bos = self.param("bos", emb, (h,))
        self.decoder = TransformerEncoder(cfg.transformer, dtype=self.dtype)
        self.out_norm = nn.LayerNorm(dtype=self.dtype)
        self.head = nn.Dense(cfg.num_codebooks * cfg.codebook_size, use_bias=False, dtype=self.dtype)

    def _pos(self, channels, positions):
        return (
            self.pos_embed_channel[channels]
            + self.pos_embed_height[positions[..., 0]]
            + self.pos_embed_width[positions[..., 1]]
        )

    def __call__(
        self,
        codes: jnp.ndarray,  # (b, s, C) int indices
        channels: jnp.ndarray,  # (b, s)
        positions: jnp.ndarray,  # (b, s, 2)
        key_pad_mask: jnp.ndarray,  # (b, s) True where padding
        image_ids: Optional[jnp.ndarray] = None,  # (b, s) packed-image ids
        training: bool = True,
    ) -> jnp.ndarray:
        """Teacher-forced logits (b, s, C, codebook_size) for every position."""
        b, s, C = codes.shape
        cfg = self.config
        # per-codebook gather, summed: (b, s, h)
        x = jnp.zeros((b, s, self.config.transformer.hidden_size), self.dtype)
        for c in range(C):
            x = x + self.code_embed[c][codes[..., c]].astype(self.dtype)
        # shift right: position t sees codes < t (BOS at t=0) + its own
        # position embedding (the layout is conditioning, not a target)
        x = jnp.concatenate(
            [jnp.broadcast_to(self.bos.astype(self.dtype), (b, 1, x.shape[-1])), x[:, :-1]],
            axis=1,
        )
        x = x + self._pos(channels, positions).astype(self.dtype)

        ids = image_ids if image_ids is not None else jnp.zeros((b, s), jnp.int32)
        ctx = AttentionContext(
            image_ids=ids, key_pad_mask=key_pad_mask, causal=True, impl="xla"
        )
        x = self.decoder(x, ctx, deterministic=not training)
        logits = self.head(self.out_norm(x))
        return logits.reshape(b, s, C, cfg.codebook_size).astype(jnp.float32)


def ar_loss(logits: jnp.ndarray, codes: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Mean cross-entropy over valid tokens and codebooks."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = jnp.take_along_axis(logp, codes[..., None], axis=-1)[..., 0]  # (b, s, C)
    num = -(tgt * valid[..., None]).sum()
    return num / jnp.maximum(valid.sum() * codes.shape[-1], 1)


def sample_codes(
    model: ARTokenModel,
    params,
    channels: jnp.ndarray,  # (1, s) target layout
    positions: jnp.ndarray,  # (1, s, 2)
    rng: jax.Array,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Autoregressively sample a code sequence for a given position layout.

    Greedy at temperature 0.  O(s) re-forwards of the full prefix (no KV
    cache — this is the demonstration path, not a serving engine)."""
    s = channels.shape[1]
    C = model.config.num_codebooks
    codes = jnp.zeros((1, s, C), jnp.int32)
    pad = jnp.zeros((1, s), bool)

    @jax.jit
    def step(codes, rng, t):
        logits = model.apply(
            {"params": params}, codes, channels, positions, pad, training=False
        )
        lt = logits[0, t]  # (C, z)
        if temperature <= 0:
            nxt = jnp.argmax(lt, axis=-1)
        else:
            nxt = jax.random.categorical(rng, lt / temperature, axis=-1)
        return codes.at[0, t].set(nxt.astype(jnp.int32))

    for t in range(s):
        rng, sub = jax.random.split(rng)
        codes = step(codes, sub, t)
    return codes
