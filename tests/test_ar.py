"""AR-over-token-dumps model tests (models/ar.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from dct_autoencoder_tpu.models.ar import ARConfig, ARTokenModel, ar_loss, sample_codes
from dct_autoencoder_tpu.models.config import TransformerConfig


def tiny_ar(codebook=32, C=4):
    return ARConfig(
        codebook_size=codebook,
        num_codebooks=C,
        image_channels=3,
        max_patch_h=8,
        max_patch_w=8,
        transformer=TransformerConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4,
        ),
    )


def make_data(rng, b=4, s=24, codebook=32, C=4):
    codes = rng.integers(0, codebook, (b, s, C)).astype(np.int32)
    chans = rng.integers(0, 3, (b, s)).astype(np.int32)
    poss = rng.integers(0, 8, (b, s, 2)).astype(np.int32)
    pad = np.zeros((b, s), bool)
    pad[:, -4:] = True
    return (jnp.asarray(codes), jnp.asarray(chans), jnp.asarray(poss), jnp.asarray(pad))


def test_ar_causality():
    """Logits at position t must not depend on codes at positions >= t."""
    cfg = tiny_ar()
    model = ARTokenModel(cfg)
    rng = np.random.default_rng(0)
    codes, chans, poss, pad = make_data(rng, b=1)
    params = model.init(jax.random.PRNGKey(0), codes, chans, poss, pad, training=False)["params"]

    l1 = model.apply({"params": params}, codes, chans, poss, pad, training=False)
    t = 10
    codes2 = codes.at[0, t:].set((codes[0, t:] + 1) % cfg.codebook_size)
    l2 = model.apply({"params": params}, codes2, chans, poss, pad, training=False)
    # positions <= t unaffected (logits at t depend on codes < t only)
    np.testing.assert_allclose(np.asarray(l1)[0, : t + 1], np.asarray(l2)[0, : t + 1], atol=1e-5)
    assert not np.allclose(np.asarray(l1)[0, t + 1], np.asarray(l2)[0, t + 1])


def test_ar_trains_on_memorizable_data():
    """Loss drops toward zero on a tiny repeated dataset (memorization)."""
    import optax

    cfg = tiny_ar()
    model = ARTokenModel(cfg)
    rng = np.random.default_rng(1)
    codes, chans, poss, pad = make_data(rng, b=2, s=16)
    params = model.init(jax.random.PRNGKey(0), codes, chans, poss, pad, training=False)["params"]
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = model.apply({"params": p}, codes, chans, poss, pad, training=True)
            return ar_loss(logits, codes, ~pad)

        loss, g = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, loss

    losses = []
    for _ in range(60):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])


def test_ar_sampling_shapes_and_determinism():
    cfg = tiny_ar()
    model = ARTokenModel(cfg)
    rng = np.random.default_rng(2)
    codes, chans, poss, pad = make_data(rng, b=1, s=8)
    params = model.init(jax.random.PRNGKey(0), codes, chans, poss, pad, training=False)["params"]

    s1 = sample_codes(model, params, chans[:, :8], poss[:, :8], jax.random.PRNGKey(3))
    s2 = sample_codes(model, params, chans[:, :8], poss[:, :8], jax.random.PRNGKey(3))
    s3 = sample_codes(model, params, chans[:, :8], poss[:, :8], jax.random.PRNGKey(4))
    assert s1.shape == (1, 8, cfg.num_codebooks)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    assert (np.asarray(s1) != np.asarray(s3)).any()
    assert (np.asarray(s1) >= 0).all() and (np.asarray(s1) < cfg.codebook_size).all()


def test_ar_example_end_to_end(tmp_path):
    """tokenize -> AR train -> sample -> decode, on a tiny tokenizer."""
    import jax.numpy as jnp2

    from dct_autoencoder_tpu.tools.train_ar_example import main as ar_main
    from test_model import tiny_config
    from dct_autoencoder_tpu.pipeline import DCTPipeline
    import os
    from PIL import Image

    # build + save a tiny tokenizer and a small image dir
    pipe = DCTPipeline.from_config(tiny_config("lfq"), sample_patches_beta=0.0, dtype=jnp2.float32)
    mp = str(tmp_path / "tok")
    pipe.model.save_pretrained(mp)
    img_dir = str(tmp_path / "imgs")
    os.makedirs(img_dir)
    rng = np.random.default_rng(4)
    for i in range(3):
        arr = (rng.uniform(0.1, 0.9, (32, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, f"{i}.png"))

    losses = ar_main(
        model_path=mp, image_dir=img_dir, steps=25, batch_size=4, max_len=32,
        hidden=64, layers=2, out=str(tmp_path / "out_ar"), seed=0,
    )
    assert losses[-1] < losses[0]
    assert os.path.exists(str(tmp_path / "out_ar" / "ar_sample.png"))


def test_cached_sampling_matches_full_reforward():
    """KV-cached decode == full-prefix re-forward, token for token."""
    from dct_autoencoder_tpu.models.ar import sample_codes_cached

    cfg = tiny_ar()
    model = ARTokenModel(cfg)
    rng = np.random.default_rng(6)
    codes, chans, poss, pad = make_data(rng, b=1, s=12)
    params = model.init(jax.random.PRNGKey(0), codes, chans, poss, pad, training=False)["params"]

    key = jax.random.PRNGKey(9)
    full = sample_codes(model, params, chans[:, :12], poss[:, :12], key, temperature=1.0)
    cached = sample_codes_cached(cfg, params, chans[:, :12], poss[:, :12], key, temperature=1.0)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(cached))

    # greedy too
    g1 = sample_codes(model, params, chans[:, :12], poss[:, :12], key, temperature=0)
    g2 = sample_codes_cached(cfg, params, chans[:, :12], poss[:, :12], key, temperature=0)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_scan_sampling_bit_identical_to_cached():
    """The one-program scan sampler (serving path) reproduces the per-step
    KV-cached sampler bit for bit — same rng stream, same codes."""
    from dct_autoencoder_tpu.models.ar import sample_codes_cached, sample_codes_scan

    cfg = tiny_ar()
    model = ARTokenModel(cfg)
    rng = np.random.default_rng(8)
    codes, chans, poss, pad = make_data(rng, b=1, s=12)
    params = model.init(
        jax.random.PRNGKey(0), codes, chans, poss, pad, training=False
    )["params"]

    key = jax.random.PRNGKey(4)
    for temp in (1.0, 0.0):
        cached = sample_codes_cached(cfg, params, chans, poss, key, temperature=temp)
        scanned = sample_codes_scan(cfg, params, chans, poss, key, temperature=temp)
        np.testing.assert_array_equal(np.asarray(cached), np.asarray(scanned))


def test_scan_sampler_runner_is_cached():
    """Repeat sampler calls at the same (config, s, temperature, b) must hit
    one cached jitted runner — a fresh @jax.jit per call retraces AND
    recompiles (60-240 s per request on the remote-compile TPU)."""
    from dct_autoencoder_tpu.models.ar import _scan_runner, sample_codes_scan

    cfg = tiny_ar()
    model = ARTokenModel(cfg)
    rng = np.random.default_rng(2)
    codes, chans, poss, pad = make_data(rng, b=1, s=8)
    params = model.init(
        jax.random.PRNGKey(0), codes, chans, poss, pad, training=False
    )["params"]

    a = sample_codes_scan(cfg, params, chans, poss, jax.random.PRNGKey(1))
    b = sample_codes_scan(cfg, params, chans, poss, jax.random.PRNGKey(2))
    assert a.shape == b.shape
    r1, c1 = _scan_runner(cfg, 8, 1.0, 1)
    r2, c2 = _scan_runner(cfg, 8, 1.0, 1)
    assert r1 is r2 and c1 is c2
    assert r1._cache_size() == 1  # one trace, reused
    # float-jitter temperatures must not mint a new program
    r3, _ = _scan_runner(cfg, 8, 1.0 + 1e-9, 1)
    assert r3 is r1


def test_scan_runner_cache_is_bounded():
    """The runner cache is a small LRU: each entry pins a compiled program
    plus an initial KV-cache array, so unbounded client-chosen keys would
    leak memory per distinct value (ADVICE r3)."""
    from dct_autoencoder_tpu.models import ar as ar_mod

    cfg = tiny_ar()
    saved = dict(ar_mod._SCAN_RUNNERS)
    ar_mod._SCAN_RUNNERS.clear()
    try:
        for k in range(ar_mod._SCAN_RUNNERS_MAX + 3):
            ar_mod._scan_runner(cfg, 8, 0.5 + 0.01 * k, 1)
        assert len(ar_mod._SCAN_RUNNERS) == ar_mod._SCAN_RUNNERS_MAX
        # most-recently-used survives; the oldest keys were evicted
        r_last, _ = ar_mod._scan_runner(
            cfg, 8, 0.5 + 0.01 * (ar_mod._SCAN_RUNNERS_MAX + 2), 1
        )
        assert len(ar_mod._SCAN_RUNNERS) == ar_mod._SCAN_RUNNERS_MAX
        # a cache hit refreshes LRU order: hit the oldest surviving entry,
        # insert a new one, and the hit entry must still be present
        keys = list(ar_mod._SCAN_RUNNERS)
        oldest = keys[0]
        ar_mod._scan_runner(cfg, oldest[1], oldest[2], oldest[3])
        ar_mod._scan_runner(cfg, 8, 0.99, 1)
        assert oldest in ar_mod._SCAN_RUNNERS
    finally:
        ar_mod._SCAN_RUNNERS.clear()
        ar_mod._SCAN_RUNNERS.update(saved)


def test_batched_scan_sampling_matches_per_row():
    """vmapped batched sampling: row i == the single-row scan sampler run
    with fold_in(rng, i), bit for bit."""
    from dct_autoencoder_tpu.models.ar import (
        sample_codes_scan,
        sample_codes_scan_batched,
    )

    cfg = tiny_ar()
    model = ARTokenModel(cfg)
    rng = np.random.default_rng(12)
    codes, chans, poss, pad = make_data(rng, b=3, s=10)
    params = model.init(
        jax.random.PRNGKey(0), codes[:1], chans[:1], poss[:1], pad[:1], training=False
    )["params"]

    key = jax.random.PRNGKey(7)
    batched = sample_codes_scan_batched(cfg, params, chans, poss, key, temperature=1.0)
    assert batched.shape == (3, 10, cfg.num_codebooks)
    for i in range(3):
        single = sample_codes_scan(
            cfg, params, chans[i : i + 1], poss[i : i + 1],
            jax.random.fold_in(key, i), temperature=1.0,
        )
        np.testing.assert_array_equal(np.asarray(batched[i]), np.asarray(single[0]))


def test_ar_packed_rows_no_cross_image_leakage():
    """In packed rows, the first token of image k>0 must take BOS as its
    input — changing EVERYTHING about image 0 must not move image 1's
    logits (block mask handles attention; the boundary-BOS handles the
    shifted input embedding)."""
    cfg = tiny_ar()
    model = ARTokenModel(cfg)
    rng = np.random.default_rng(7)
    b, s = 1, 16
    codes = jnp.asarray(rng.integers(0, 32, (b, s, 4)).astype(np.int32))
    chans = jnp.asarray(rng.integers(0, 3, (b, s)).astype(np.int32))
    poss = jnp.asarray(rng.integers(0, 8, (b, s, 2)).astype(np.int32))
    pad = jnp.zeros((b, s), bool)
    ids = jnp.asarray(np.concatenate([np.zeros(8), np.ones(8)]).astype(np.int32))[None]
    params = model.init(jax.random.PRNGKey(0), codes, chans, poss, pad,
                        image_ids=ids, training=False)["params"]

    l1 = model.apply({"params": params}, codes, chans, poss, pad,
                     image_ids=ids, training=False)
    codes2 = codes.at[0, :8].set((codes[0, :8] + 7) % cfg.codebook_size)
    l2 = model.apply({"params": params}, codes2, chans, poss, pad,
                     image_ids=ids, training=False)
    np.testing.assert_allclose(
        np.asarray(l1)[0, 8:], np.asarray(l2)[0, 8:], atol=1e-5,
        err_msg="image-0 content leaked into image-1 predictions",
    )


def test_ar_save_load_roundtrip(tmp_path):
    """save_ar_model/load_ar_model: config + params survive bit-exactly and
    the loaded pair samples identically (the serving /generate contract)."""
    from dct_autoencoder_tpu.models.ar import (
        load_ar_model,
        sample_codes_scan,
        save_ar_model,
    )

    cfg = tiny_ar()
    model = ARTokenModel(cfg)
    rng = np.random.default_rng(11)
    codes, chans, poss, pad = make_data(rng, b=1, s=8)
    params = model.init(
        jax.random.PRNGKey(0), codes, chans, poss, pad, training=False
    )["params"]
    save_ar_model(str(tmp_path / "ar"), cfg, params)
    cfg2, params2 = load_ar_model(str(tmp_path / "ar"))
    assert cfg2 == cfg
    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(params2)[0],
    ):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    s1 = sample_codes_scan(cfg, params, chans, poss, jax.random.PRNGKey(3))
    s2 = sample_codes_scan(cfg2, params2, chans, poss, jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_scan_sampler_prefix_conditioning():
    """prefix_codes are teacher-forced: output[:plen] == prefix, the
    continuation differs from the unconditional draw (the forced tokens feed
    the cache), and plen=0 reproduces the unconditional path bit-exactly."""
    from dct_autoencoder_tpu.models.ar import sample_codes_scan

    cfg = tiny_ar()
    model = ARTokenModel(cfg)
    rng = np.random.default_rng(4)
    codes, chans, poss, pad = make_data(rng, b=1, s=12)
    params = model.init(
        jax.random.PRNGKey(0), codes, chans, poss, pad, training=False
    )["params"]

    key = jax.random.PRNGKey(9)
    uncond = np.asarray(sample_codes_scan(cfg, params, chans, poss, key))
    prefix = (uncond + 7) % cfg.codebook_size  # anything != the uncond draw
    plen = 5
    cond = np.asarray(
        sample_codes_scan(
            cfg, params, chans, poss, key,
            prefix_codes=jnp.asarray(prefix), prefix_len=plen,
        )
    )
    np.testing.assert_array_equal(cond[0, :plen], prefix[0, :plen])
    assert not np.array_equal(cond[0, plen:], uncond[0, plen:]), (
        "continuation ignored the forced prefix"
    )
    # zero-length prefix: bit-identical to the unconditional call
    cond0 = np.asarray(
        sample_codes_scan(
            cfg, params, chans, poss, key,
            prefix_codes=jnp.asarray(prefix), prefix_len=0,
        )
    )
    np.testing.assert_array_equal(cond0, uncond)


def test_batched_per_row_keys_are_batch_composition_independent():
    """Explicit per-row keys: a request's draw must not depend on which
    micro-batch it landed in (the serving batcher's determinism contract)."""
    from dct_autoencoder_tpu.models.ar import sample_codes_scan_batched

    cfg = tiny_ar()
    model = ARTokenModel(cfg)
    rng = np.random.default_rng(5)
    codes, chans, poss, pad = make_data(rng, b=3, s=8)
    params = model.init(
        jax.random.PRNGKey(0), codes[:1], chans[:1], poss[:1], pad[:1],
        training=False,
    )["params"]

    keys = jnp.stack([jax.random.PRNGKey(100 + i) for i in range(3)])
    full = np.asarray(
        sample_codes_scan_batched(
            cfg, params, chans, poss, rng=None, keys=keys
        )
    )
    # same request (row 1) in a different batch composition, same key
    keys2 = jnp.stack([jax.random.PRNGKey(101), jax.random.PRNGKey(999),
                       jax.random.PRNGKey(998)])
    chans2 = jnp.concatenate([chans[1:2], chans[2:], chans[:1]])
    poss2 = jnp.concatenate([poss[1:2], poss[2:], poss[:1]])
    other = np.asarray(
        sample_codes_scan_batched(
            cfg, params, chans2, poss2, rng=None, keys=keys2
        )
    )
    np.testing.assert_array_equal(other[0], full[1])


def test_canonical_layout_properties():
    """Static coarse-to-fine layout: unique triples, intensity channel and
    low frequencies first (the extractor's static importance order)."""
    from dct_autoencoder_tpu.models.ar import canonical_layout

    cfg = tiny_ar()
    n = 40
    chans, poss = canonical_layout(cfg, n)
    assert chans.shape == (1, n) and poss.shape == (1, n, 2)
    triples = {(int(c), int(h), int(w))
               for c, (h, w) in zip(chans[0], poss[0])}
    assert len(triples) == n
    # token 0 is the intensity DC term
    assert (int(chans[0, 0]), int(poss[0, 0, 0]), int(poss[0, 0, 1])) == (0, 0, 0)
    # channel 0 dominates the head (importance 8 vs 1)
    assert np.mean(np.asarray(chans[0][:16]) == 0) > 0.8
    # within channel 0, h+w is non-decreasing (low frequencies first)
    c0 = [int(h + w) for c, (h, w) in zip(chans[0], poss[0]) if int(c) == 0]
    assert c0 == sorted(c0)
