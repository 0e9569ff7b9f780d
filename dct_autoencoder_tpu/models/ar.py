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
    # attention kernel for the teacher-forced training forward: 'auto' routes
    # to the causal packed pallas kernel on TPU at long sequence lengths
    # (the (b,h,s,s) logits XLA would otherwise materialize are exactly the
    # HBM traffic the kernel eliminates); 'xla' | 'pallas' force a path
    attention_impl: str = "auto"


class ARTokenModel(nn.Module):
    config: ARConfig
    dtype: jnp.dtype = jnp.float32
    # > 0 builds the decoder with per-layer KV caches of this length for
    # token-at-a-time sampling (decode_step); params are identical either
    # way, so trained weights swap straight into a cached instance
    decode_cache: int = 0

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
        self.decoder = TransformerEncoder(
            cfg.transformer, dtype=self.dtype, cache_size=self.decode_cache
        )
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
        # shift right: position t sees codes < t + its own position embedding
        # (the layout is conditioning, not a target).  BOS at t=0 AND at every
        # packed-image boundary — the block mask restricts what t ATTENDS to,
        # not t's own input embedding, so without this the first token of
        # image k>0 would be conditioned on image k-1's last codes (a
        # train/sample mismatch: sampling always starts from BOS)
        ids = image_ids if image_ids is not None else jnp.zeros((b, s), jnp.int32)
        shifted = jnp.concatenate(
            [jnp.zeros((b, 1, x.shape[-1]), self.dtype), x[:, :-1]], axis=1
        )
        boundary = jnp.concatenate(
            [jnp.ones((b, 1), bool), ids[:, 1:] != ids[:, :-1]], axis=1
        )
        x = jnp.where(
            boundary[..., None], self.bos.astype(self.dtype)[None, None, :], shifted
        )
        x = x + self._pos(channels, positions).astype(self.dtype)
        ctx = AttentionContext(
            image_ids=ids,
            key_pad_mask=key_pad_mask,
            causal=True,
            impl=self.config.attention_impl,
        )
        x = self.decoder(x, ctx, deterministic=not training)
        logits = self.head(self.out_norm(x))
        return logits.reshape(b, s, C, cfg.codebook_size).astype(jnp.float32)


    def decode_step(
        self,
        prev_codes: jnp.ndarray,  # (b, 1, C) codes at t-1 (ignored at t=0)
        channel: jnp.ndarray,  # (b, 1) target-position channel at t
        position: jnp.ndarray,  # (b, 1, 2) target grid position at t
        t: jnp.ndarray,  # scalar step index
    ) -> jnp.ndarray:
        """One KV-cached decode step -> logits (b, C, codebook_size).

        Requires decode_cache > 0; apply with mutable=['cache'] and thread the
        returned cache collection between steps (see sample_codes_cached)."""
        assert self.decode_cache > 0, "build the model with decode_cache=seq_len"
        b = prev_codes.shape[0]
        C = self.config.num_codebooks
        x = jnp.zeros((b, 1, self.config.transformer.hidden_size), self.dtype)
        for c in range(C):
            x = x + self.code_embed[c][prev_codes[..., c]].astype(self.dtype)
        x = jnp.where(t == 0, self.bos.astype(self.dtype)[None, None, :], x)
        x = x + self._pos(channel, position).astype(self.dtype)

        ctx = AttentionContext(
            image_ids=jnp.zeros((b, 1), jnp.int32),
            key_pad_mask=jnp.zeros((b, 1), bool),
            causal=True,
            impl="xla",
        )
        x = self.decoder(x, ctx, deterministic=True)
        logits = self.head(self.out_norm(x))
        return logits.reshape(b, C, self.config.codebook_size).astype(jnp.float32)


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


def sample_codes_cached(
    config: ARConfig,
    params,
    channels: jnp.ndarray,  # (1, s) target layout
    positions: jnp.ndarray,  # (1, s, 2)
    rng: jax.Array,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """KV-cached autoregressive sampling: one O(1)-attention decode step per
    token instead of sample_codes' full-prefix re-forward (O(s) total vs
    O(s^2)).  Produces the same distribution (bit-identical to sample_codes
    given the same per-step rng stream; tested)."""
    s = channels.shape[1]
    C = config.num_codebooks
    model = ARTokenModel(config, decode_cache=s)

    @jax.jit
    def step(cache, prev, ch_t, pos_t, t, key):
        variables = {"params": params}
        if cache is not None:
            variables["cache"] = cache
        logits, new_vars = model.apply(
            variables, prev, ch_t, pos_t, t, method="decode_step", mutable=["cache"]
        )
        lt = logits[0]  # (C, z)
        if temperature <= 0:
            nxt = jnp.argmax(lt, axis=-1)
        else:
            nxt = jax.random.categorical(key, lt / temperature, axis=-1)
        return new_vars["cache"], nxt.astype(jnp.int32)

    codes = jnp.zeros((1, s, C), jnp.int32)
    prev = jnp.zeros((1, 1, C), jnp.int32)
    cache = None
    for t in range(s):
        rng, sub = jax.random.split(rng)
        cache, nxt = step(
            cache, prev, channels[:, t : t + 1], positions[:, t : t + 1],
            jnp.asarray(t), sub,
        )
        codes = codes.at[0, t].set(nxt)
        prev = nxt[None, None]
    return codes


# Bounded LRU: each entry holds a compiled runner plus a persistent initial
# KV-cache array (~100 MB at s=3072), so an unbounded dict keyed on
# client-chosen (temperature, s, batch) would leak host/device memory per
# distinct value (ADVICE r3).  8 entries covers a serving bucket ladder;
# eviction drops the cache0 array and lets the executable be collected.
_SCAN_RUNNERS_MAX = 8
_SCAN_RUNNERS: "dict" = {}  # insertion-ordered (py3.7+); oldest evicted first


def _scan_runner(config: ARConfig, s: int, temperature: float, batch: int):
    """Cached jitted decode-loop runner + initial KV cache for one
    (config, seq_len, temperature, batch) shape.

    Every call to a fresh `@jax.jit` closure retraces AND recompiles — on
    the remote-compile TPU that is 60-240 s per *request* (CLAUDE.md: touch
    as few distinct programs as possible).  Serving calls the sampler once
    per request at a fixed shape, so the runner must be built once and
    reused; this cache keys on everything that changes the program.  The
    initial cache zeros are passed as ARGUMENTS (closing over them would
    embed ~100 MB of constants into the HLO at s=3072 and trip the remote
    compiler's payload limit)."""
    # round temperature so float jitter (e.g. a client sending 0.70000001)
    # cannot mint a new program; serving layers should additionally bucket s
    key = (repr(config), s, round(float(temperature), 6), batch)
    hit = _SCAN_RUNNERS.get(key)
    if hit is not None:
        # refresh LRU order
        _SCAN_RUNNERS[key] = _SCAN_RUNNERS.pop(key)
        return hit

    C = config.num_codebooks
    model = ARTokenModel(config, decode_cache=s)

    # cache structure without running anything: eval_shape over flax init
    var_shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 1, C), jnp.int32),
            jnp.zeros((1, 1), jnp.int32),
            jnp.zeros((1, 1, 2), jnp.int32),
            jnp.zeros((), jnp.int32),
            method="decode_step",
        )
    )
    cache0 = jax.tree_util.tree_map(
        lambda sd: jnp.zeros(sd.shape, sd.dtype), var_shapes["cache"]
    )

    def one_row(params, cache, channels, positions, rng, prefix_codes, prefix_len):
        """channels (s,), positions (s, 2), rng key -> codes (s, C).

        Tokens t < prefix_len are FORCED to prefix_codes[t] (teacher-forced
        prefix conditioning: the forced token is what feeds step t+1), so the
        model samples a continuation of a given prefix — the serving
        /generate contract.  prefix_len=0 with zero prefix_codes is the
        unconditional path and compiles to the same single program."""
        ch_xs = channels[:, None, None]  # (s, 1, 1)
        pos_xs = positions[:, None, None, :]  # (s, 1, 1, 2)
        t_xs = jnp.arange(s)
        prev0 = jnp.zeros((1, 1, C), jnp.int32)

        def step(carry, xs):
            cache, prev, rng = carry
            ch_t, pos_t, t, forced = xs
            rng, sub = jax.random.split(rng)
            logits, new_vars = model.apply(
                {"params": params, "cache": cache},
                prev, ch_t, pos_t, t,
                method="decode_step", mutable=["cache"],
            )
            lt = logits[0]  # (C, z)
            if temperature <= 0:
                nxt = jnp.argmax(lt, axis=-1)
            else:
                nxt = jax.random.categorical(sub, lt / temperature, axis=-1)
            nxt = jnp.where(t < prefix_len, forced, nxt.astype(jnp.int32))
            return (new_vars["cache"], nxt[None, None, :], rng), nxt

        (_, _, _), codes = jax.lax.scan(
            step, (cache, prev0, rng), (ch_xs, pos_xs, t_xs, prefix_codes)
        )
        return codes  # (s, C)

    if batch == 1:
        run = jax.jit(
            lambda params, cache, channels, positions, rng, prefix_codes, prefix_len: one_row(
                params, cache, channels[0], positions[0], rng,
                prefix_codes[0], prefix_len[0],
            )[None]
        )
    else:
        def batched(params, cache, channels, positions, keys, prefix_codes, prefix_lens):
            return jax.vmap(one_row, in_axes=(None, None, 0, 0, 0, 0, 0))(
                params, cache, channels, positions, keys, prefix_codes, prefix_lens
            )

        run = jax.jit(batched)

    while len(_SCAN_RUNNERS) >= _SCAN_RUNNERS_MAX:
        _SCAN_RUNNERS.pop(next(iter(_SCAN_RUNNERS)))
    _SCAN_RUNNERS[key] = (run, cache0)
    return run, cache0


def canonical_layout(
    config: ARConfig,
    n_tokens: int,
    patch_h: Optional[int] = None,
    patch_w: Optional[int] = None,
    channel_importances=(8.0, 1.0, 1.0),
):
    """Static coarse-to-fine token layout for unconditional generation.

    Orders the (channel, row, col) grid by the STATIC part of the
    extractor's importance score (reference feature_extraction...py:401-416:
    0.1*|patch|_inf + (-(h+w))/channel_importances — the magnitude term is
    data-dependent, the rest is not): -(h+w)/importance(c), descending, ties
    broken by (c, h, w).  Matches the coarse-to-fine order trained token
    records follow on average, so an AR model trained on real records can
    sample onto this layout.  Returns (channels (1, n), positions (1, n, 2))
    int32 arrays ready for sample_codes_scan."""
    import numpy as np

    ph = patch_h or config.max_patch_h
    pw = patch_w or config.max_patch_w
    nc = config.image_channels
    ci = np.asarray(channel_importances[:nc], np.float64)
    cs, hs, ws = np.meshgrid(
        np.arange(nc), np.arange(ph), np.arange(pw), indexing="ij"
    )
    cs, hs, ws = cs.ravel(), hs.ravel(), ws.ravel()
    score = -(hs + ws) / ci[cs]
    # primary: score desc; ties: (c, h, w) asc (lexsort keys minor->major)
    order = np.lexsort((ws, hs, cs, -score))
    assert n_tokens <= order.size, (n_tokens, order.size)
    order = order[:n_tokens]
    channels = cs[order][None].astype(np.int32)
    positions = np.stack([hs[order], ws[order]], axis=-1)[None].astype(np.int32)
    return channels, positions


def _ar_path_str(path) -> str:
    return "/".join(
        str(getattr(p, "key", getattr(p, "idx", p))) for p in path
    )


def save_ar_model(path: str, config: ARConfig, params) -> None:
    """Persist an AR checkpoint (ar_config.json + ar_params.npz) so serving
    (/generate in tools/serve.py) can load what tools/train_ar_example.py
    trained — the same two-file split the tokenizer checkpoints use."""
    import json
    import os

    import numpy as np

    os.makedirs(path, exist_ok=True)
    cfg = dataclasses.asdict(config)
    with open(os.path.join(path, "ar_config.json"), "w") as f:
        json.dump(cfg, f, indent=2)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    np.savez(
        os.path.join(path, "ar_params.npz"),
        **{_ar_path_str(p): np.asarray(v) for p, v in flat},
    )


def load_ar_model(path: str):
    """Inverse of save_ar_model -> (ARConfig, params)."""
    import json
    import os

    import numpy as np

    with open(os.path.join(path, "ar_config.json")) as f:
        cfg = json.load(f)
    tr = cfg.pop("transformer")
    # json turns tuples into lists; tuple-typed fields must be hashable again
    tr = {k: tuple(v) if isinstance(v, list) else v for k, v in tr.items()}
    config = ARConfig(transformer=TransformerConfig(**tr), **cfg)

    model = ARTokenModel(config)
    C = config.num_codebooks
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 1, C), jnp.int32),
            jnp.zeros((1, 1), jnp.int32),
            jnp.zeros((1, 1, 2), jnp.int32),
            jnp.zeros((1, 1), bool),
            training=False,
        )
    )
    loaded = np.load(os.path.join(path, "ar_params.npz"))
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes["params"])
    leaves = []
    for p, sd in flat:
        key = _ar_path_str(p)
        arr = loaded[key]
        assert arr.shape == sd.shape, (key, arr.shape, sd.shape)
        leaves.append(jnp.asarray(arr))
    return config, jax.tree_util.tree_unflatten(treedef, leaves)


def sample_codes_scan(
    config: ARConfig,
    params,
    channels: jnp.ndarray,  # (1, s) target layout
    positions: jnp.ndarray,  # (1, s, 2)
    rng: jax.Array,
    temperature: float = 1.0,
    prefix_codes: Optional[jnp.ndarray] = None,  # (1, s, C)
    prefix_len: int = 0,
) -> jnp.ndarray:
    """KV-cached sampling with the WHOLE decode loop inside one compiled
    program (`lax.scan` carrying the cache) — the TPU serving sampler.

    prefix_codes + prefix_len force the first prefix_len tokens (teacher-
    forced conditioning) and sample the continuation; prefix_len rides as a
    traced scalar, so any prefix length reuses the same compiled runner.

    sample_codes_cached dispatches one device program per token; behind a
    remote-dispatch link (this environment's tunnel) or any host-bound
    serving box, s=3072 tokens means 3072 round trips.  Here the loop is a
    single dispatch: the per-layer KV caches, the previous token, and the rng
    ride the scan carry, so XLA pipelines the s steps back-to-back on-device.
    Same per-step rng stream as sample_codes_cached (split-before-step), so
    the two produce bit-identical codes given identical inputs (tested).
    The compiled runner is cached per (config, s, temperature) — repeat
    calls at a serving shape pay zero retrace/recompile (tested).  The cache
    is a bounded LRU of 8 entries (each holds a ~100 MB initial KV cache at
    s=3072): serving layers must bucket s and quantize temperature, or every
    distinct value pays a fresh compile when it falls out of the window."""
    s = channels.shape[1]
    run, cache0 = _scan_runner(config, s, temperature, batch=1)
    if prefix_codes is None:
        prefix_codes = jnp.zeros((1, s, config.num_codebooks), jnp.int32)
    plen = jnp.asarray([prefix_len], jnp.int32)
    return run(params, cache0, channels, positions, rng, prefix_codes, plen)


def sample_codes_scan_batched(
    config: ARConfig,
    params,
    channels: jnp.ndarray,  # (b, s) per-image target layouts (same s bucket)
    positions: jnp.ndarray,  # (b, s, 2)
    rng: Optional[jax.Array],
    temperature: float = 1.0,
    keys: Optional[jnp.ndarray] = None,  # (b,) per-row PRNG keys
    prefix_codes: Optional[jnp.ndarray] = None,  # (b, s, C)
    prefix_lens: Optional[jnp.ndarray] = None,  # (b,) int32
) -> jnp.ndarray:
    """Batched one-program sampling: vmap of the single-row scan sampler over
    b independent layouts.  Each row gets its own rng stream
    (`fold_in(rng, row)`, or the explicit per-row `keys` — a serving batcher
    passes per-request keys so a request's draw does not depend on which
    batch it landed in) and its own KV cache (the vmapped cache grows a
    leading b axis, so XLA batches the per-step GEMVs into GEMMs — the b=1
    sampler is per-step-latency-bound on TPU, so sampling N layouts together
    costs roughly the same wall clock as one).  Row i draws the same rng
    stream as `sample_codes_scan(..., fold_in(rng, i))`: bit-identical where
    the two compile to numerically identical programs (CPU/f32 — tested).
    On TPU the batched program's bf16 fusion order differs, so logits move
    at rounding level (~1e-2 measured) and a near-tie categorical draw can
    flip (measured 1 of 256 tokens on a random-init model, on-chip) — the
    sampled DISTRIBUTION is the same; only replay-exactness is per-program.
    The compiled runner is cached per (config, s, temperature, b).

    prefix_codes + per-row prefix_lens force each row's first tokens
    (teacher-forced prefix conditioning), sampling the continuations."""
    b, s = channels.shape
    run, cache0 = _scan_runner(config, s, temperature, batch=b)
    if keys is None:
        assert rng is not None, "pass rng or per-row keys"
        keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(jnp.arange(b))
    if prefix_codes is None:
        prefix_codes = jnp.zeros((b, s, config.num_codebooks), jnp.int32)
    if prefix_lens is None:
        prefix_lens = jnp.zeros((b,), jnp.int32)
    if b == 1:
        # the batch=1 runner takes a single key, not a (1,)-keys array
        return run(params, cache0, channels, positions, keys[0], prefix_codes, prefix_lens)
    return run(params, cache0, channels, positions, keys, prefix_codes, prefix_lens)
