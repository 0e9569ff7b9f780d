"""VQ training-mode parity tests (VERDICT r1 item 4).

The reference instantiates VectorQuantize with kmeans_init=True,
sample_codebook_temp=20, learnable_codebook=True, affine_param=True,
threshold_ema_dead_code=15 (reference modeling_dct_autoencoder.py:77).
These tests prove the corresponding machinery actually fires in training:
gumbel sampling responds to the rng, EMA affine/usage stats update, the
codebook is k-means-initialized from the first batch, and dead codes get
replaced.
"""
import jax
import jax.numpy as jnp
import numpy as np

from dct_autoencoder_tpu.models.factory import get_model_and_processor
from dct_autoencoder_tpu.models.patchnorm import calibrate_patchnorm_batch
from dct_autoencoder_tpu.models.vq import VectorQuantize
from dct_autoencoder_tpu.train.loop import TrainState, make_optimizer, make_train_step

from test_model import make_batch, tiny_config


def setup_vq():
    cfg = tiny_config("vq")
    model, proc = get_model_and_processor(cfg, sample_patches_beta=0.0)
    rng = np.random.default_rng(0)
    batch = make_batch(proc, rng, n_images=4)
    model.patchnorm, _ = calibrate_patchnorm_batch(model.patchnorm, batch)
    return model, proc, batch


def test_vq_gumbel_sampling_differs_across_rngs():
    """sample_codebook_temp=20 must actually fire: codes are stochastic in
    training when an rng is supplied, deterministic without."""
    vq = VectorQuantize(dim=32, codebook_size=64, heads=4, codebook_dim=8,
                        sample_codebook_temp=20.0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 32)), jnp.float32)
    variables = vq.init(jax.random.PRNGKey(0), x, training=False)

    def codes_with(key):
        _, idx, _, _ = vq.apply(variables, x, training=True, rng=key)
        return np.asarray(idx)

    c1, c2 = codes_with(jax.random.PRNGKey(1)), codes_with(jax.random.PRNGKey(2))
    c1b = codes_with(jax.random.PRNGKey(1))
    assert (c1 != c2).any(), "gumbel sampling is dead: identical codes across rngs"
    np.testing.assert_array_equal(c1, c1b)

    # no rng -> argmin, deterministic
    _, det1, _, _ = vq.apply(variables, x, training=True)
    _, det2, _, _ = vq.apply(variables, x, training=True)
    np.testing.assert_array_equal(np.asarray(det1), np.asarray(det2))


def test_vq_affine_and_usage_stats_update():
    model, proc, batch = setup_vq()
    nb = model.normalize_(batch)
    assert model.vq_stats, "VQ model must own vq_stats"
    before = jax.tree_util.tree_map(np.asarray, model.vq_stats)

    out, new_vars = model.module.apply(
        {"params": model.params, "vq_stats": model.vq_stats},
        nb,
        training=True,
        rngs={"vq": jax.random.PRNGKey(0)},
        mutable=["vq_stats"],
    )
    after = new_vars["vq_stats"]["vq_model"]
    assert "vq_z" in out
    assert not np.allclose(np.asarray(after["batch_mean"]),
                           before["vq_model"]["batch_mean"])
    assert not np.allclose(np.asarray(after["codebook_mean"]),
                           before["vq_model"]["codebook_mean"])
    assert np.asarray(after["cluster_size"]).sum() > 0


def test_vq_train_step_kmeans_init_and_dead_code_expiry():
    model, proc, batch = setup_vq()
    from dct_autoencoder_tpu.train.loop import prepare_train_batch

    sb, _ = prepare_train_batch(batch)
    tx = make_optimizer(learning_rate=0.0, max_iters=100, warmup_steps=0)
    # lr=0 isolates surgery effects: any codebook change is kmeans/expiry
    step = jax.jit(
        make_train_step(model.module, tx, vq_expire_every=2, vq_expire_threshold=15.0)
    )
    state = TrainState.create(model.params, tx, model.vq_stats)
    cb0 = np.asarray(state.params["vq_model"]["codebook"])

    state, m = step(state, model.patchnorm, sb)  # step 0: kmeans init fires
    cb1 = np.asarray(state.params["vq_model"]["codebook"])
    assert not np.allclose(cb0, cb1), "kmeans init did not rewrite the codebook"
    assert np.isfinite(float(m["loss"]))

    cs1 = np.asarray(state.vq_stats["vq_model"]["cluster_size"])
    state, m = step(state, model.patchnorm, sb)  # step 1: expiry fires (every=2)
    cb2 = np.asarray(state.params["vq_model"]["codebook"])
    cs2 = np.asarray(state.vq_stats["vq_model"]["cluster_size"])
    dead = cs1 < 15.0
    assert dead.any(), "test premise: some codes under threshold"
    assert not np.allclose(cb1[dead], cb2[dead]), "dead codes were not replaced"
    assert (cs2[dead] >= 15.0 - 1e-6).all(), "expired codes' usage not reset"


def _codebook_moment_leaves(opt_state, cb_shape):
    flat = jax.tree_util.tree_flatten_with_path(opt_state)[0]
    return [
        np.asarray(v)
        for p, v in flat
        if hasattr(v, "shape")
        and tuple(v.shape) == tuple(cb_shape)
        and any(getattr(k, "key", None) == "codebook" for k in p)
    ]


def test_vq_train_step_grad_accumulation():
    """VQ mode composes with accumulation (VERDICT r2 item 2): EMA stats
    thread micro->micro, surgery fires from the final micro-batch, and
    surgically replaced codebook rows get their Adam moments zeroed."""
    model, proc, batch = setup_vq()
    from dct_autoencoder_tpu.train.loop import prepare_train_batch

    sb, _ = prepare_train_batch(batch)
    assert sb.patches.shape[0] % 2 == 0
    tx = make_optimizer(learning_rate=1e-3, max_iters=100, warmup_steps=0)
    step = jax.jit(
        make_train_step(model.module, tx, accum_steps=2, vq_expire_every=2)
    )
    state = TrainState.create(model.params, tx, model.vq_stats)
    cb0 = np.asarray(state.params["vq_model"]["codebook"])

    state, m = step(state, model.patchnorm, sb)
    assert np.isfinite(float(m["loss"]))
    cb1 = np.asarray(state.params["vq_model"]["codebook"])
    assert not np.allclose(cb0, cb1), "kmeans init did not fire under accum"
    # usage stats accumulated across both micro-batches
    assert np.asarray(state.vq_stats["vq_model"]["cluster_size"]).sum() > 0
    # step 0 kmeans replaces every code -> codebook Adam moments reset
    moments = _codebook_moment_leaves(state.opt_state, cb1.shape)
    assert len(moments) >= 2, "expected Adam mu+nu codebook leaves"
    for mom in moments:
        np.testing.assert_allclose(mom, 0.0, atol=1e-12)

    cs1 = np.asarray(state.vq_stats["vq_model"]["cluster_size"])
    state, m = step(state, model.patchnorm, sb)  # step 1: expiry (every=2)
    cb2 = np.asarray(state.params["vq_model"]["codebook"])
    dead = cs1 < 15.0
    assert dead.any()
    assert not np.allclose(cb1[dead], cb2[dead]), "dead codes not replaced under accum"
    assert np.isfinite(float(m["loss"]))


def test_ema_mode_dead_code_expiry_in_train_step():
    """EMA-codebook mode (ema_update=True): threshold_ema_dead_code must
    still expire codes — the codebook lives in vq_stats, so surgery edits
    embed/embed_avg/cluster stats (reference EuclideanCodebook.expire_codes_)."""
    from dct_autoencoder_tpu.models.vq import expire_dead_codes_ema_stats

    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.standard_normal((2, 16, 2, 8)).astype(np.float32))
    mask = jnp.ones((2, 16), dtype=bool)
    stats = {
        "embed": jnp.asarray(rng.standard_normal((2, 32, 8)).astype(np.float32)),
        "embed_avg": jnp.asarray(rng.standard_normal((2, 32, 8)).astype(np.float32)),
        "ema_cluster_size": jnp.zeros((2, 32)),
        "cluster_size": jnp.asarray(
            rng.uniform(0, 30, size=(2, 32)).astype(np.float32)
        ),
        "batch_mean": jnp.zeros((8,)),  # affine keys must pass through
    }
    out = expire_dead_codes_ema_stats(stats, z, mask, jax.random.PRNGKey(0), 15.0)
    dead = np.asarray(stats["cluster_size"]) < 15.0
    assert dead.any() and (~dead).any()
    emb0, emb1 = np.asarray(stats["embed"]), np.asarray(out["embed"])
    assert not np.allclose(emb0[dead], emb1[dead]), "dead codes kept"
    np.testing.assert_allclose(emb0[~dead], emb1[~dead])
    np.testing.assert_allclose(np.asarray(out["cluster_size"])[dead], 15.0)
    np.testing.assert_allclose(np.asarray(out["ema_cluster_size"])[dead], 15.0)
    # embed_avg reset to sample * reset_cluster_size
    np.testing.assert_allclose(emb1[dead] * 15.0, np.asarray(out["embed_avg"])[dead], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["batch_mean"]), 0.0)


def test_ema_mode_kmeans_init_seeds_ema_buffers():
    """EMA-mode kmeans init must satisfy the reference init_embed_ invariant
    (vector_quantize.py:336-339): cluster sizes = kmeans assignment bins and
    embed_avg = embed * bins, so embed == embed_avg / cluster from the first
    EMA update (previously embed_avg was seeded with the raw centroids and
    cluster at 0, blowing up rarely-assigned codes ~5x after one update)."""
    from dct_autoencoder_tpu.train.loop import _vq_codebook_surgery

    rng = np.random.default_rng(5)
    z = jnp.asarray(rng.standard_normal((2, 32, 2, 8)).astype(np.float32))
    mask = jnp.ones((2, 32), dtype=bool)
    stats = {
        "vq_model": {
            "embed": jnp.asarray(rng.standard_normal((2, 16, 8)).astype(np.float32)),
            "embed_avg": jnp.zeros((2, 16, 8)),
            "ema_cluster_size": jnp.zeros((2, 16)),
            "cluster_size": jnp.zeros((2, 16)),
        }
    }
    params = {"other": {}}  # no vq_model.codebook -> EMA-codebook branch
    _, new_stats, _ = jax.jit(
        lambda p, s: _vq_codebook_surgery(
            p, s, None, z, mask, jnp.zeros((), jnp.int32), jax.random.PRNGKey(0),
            kmeans_init=True, expire_threshold=0.0, expire_every=0,
        )
    )(params, stats)
    s = new_stats["vq_model"]
    emb = np.asarray(s["embed"])
    avg = np.asarray(s["embed_avg"])
    bins = np.asarray(s["cluster_size"])
    assert bins.sum() > 0 and (bins >= 0).all()
    np.testing.assert_allclose(np.asarray(s["ema_cluster_size"]), bins, rtol=1e-6)
    np.testing.assert_allclose(avg, emb * bins[..., None], atol=1e-5)
    # invariant: embed reproducible from the seeded buffers where assigned
    nz = bins > 0
    np.testing.assert_allclose(
        avg[nz] / bins[nz][:, None], emb[nz], rtol=1e-4, atol=1e-5
    )


def test_surgery_noops_on_all_padded_window():
    """Pipeline/accum row padding can leave the surgery's sampling window
    (the last micro-batch) with ZERO valid tokens; surgery must then no-op
    instead of filling codebook rows with identical padding projections."""
    from dct_autoencoder_tpu.train.loop import _vq_codebook_surgery

    rng = np.random.default_rng(5)
    z = jnp.asarray(rng.standard_normal((2, 32, 2, 8)).astype(np.float32))
    empty = jnp.zeros((2, 32), dtype=bool)
    stats = {
        "vq_model": {
            "embed": jnp.asarray(rng.standard_normal((2, 16, 8)).astype(np.float32)),
            "embed_avg": jnp.zeros((2, 16, 8)),
            "ema_cluster_size": jnp.zeros((2, 16)),
            "cluster_size": jnp.zeros((2, 16)),
        }
    }
    params = {"other": {}}
    _, new_stats, _ = jax.jit(
        lambda p, s: _vq_codebook_surgery(
            p, s, None, z, empty, jnp.zeros((), jnp.int32), jax.random.PRNGKey(0),
            kmeans_init=True, expire_threshold=15.0, expire_every=1,
        )
    )(params, stats)
    for k, v in stats["vq_model"].items():
        np.testing.assert_array_equal(
            np.asarray(new_stats["vq_model"][k]), np.asarray(v), err_msg=k
        )


def test_vq_train_step_reduces_loss():
    model, proc, batch = setup_vq()
    from dct_autoencoder_tpu.train.loop import prepare_train_batch

    sb, _ = prepare_train_batch(batch)
    tx = make_optimizer(learning_rate=3e-3, max_iters=100, warmup_steps=0)
    step = jax.jit(make_train_step(model.module, tx))
    state = TrainState.create(model.params, tx, model.vq_stats)
    losses = []
    for _ in range(10):
        state, metrics = step(state, model.patchnorm, sb)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses


def test_vq_stats_persist_in_save_pretrained(tmp_path):
    from dct_autoencoder_tpu.models.autoencoder import DCTAutoencoder

    model, proc, batch = setup_vq()
    nb = model.normalize_(batch)
    _, new_vars = model.module.apply(
        {"params": model.params, "vq_stats": model.vq_stats},
        nb, training=True, rngs={"vq": jax.random.PRNGKey(0)}, mutable=["vq_stats"],
    )
    model.vq_stats = new_vars["vq_stats"]
    path = str(tmp_path / "m")
    model.save_pretrained(path)
    loaded = DCTAutoencoder.from_pretrained(path)
    for k in ("batch_mean", "batch_variance", "cluster_size"):
        np.testing.assert_allclose(
            np.asarray(loaded.vq_stats["vq_model"][k]),
            np.asarray(model.vq_stats["vq_model"][k]),
        )


def test_ema_codebook_mode_trains_without_gradients():
    """The reference library's OTHER operating mode (ema_update=True,
    vector_quantize.py EuclideanCodebook): the codebook lives in vq_stats and
    moves toward the data by EMA inside apply — no codebook gradient."""
    vq = VectorQuantize(dim=16, codebook_size=32, heads=2, codebook_dim=8,
                        ema_update=True, ema_decay=0.5)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((4, 32, 16)).astype(np.float32) * 2.0)
    variables = vq.init(jax.random.PRNGKey(0), x, training=False)
    assert "embed" in variables["vq_stats"]
    assert "codebook" not in variables.get("params", {})

    params = variables["params"]
    stats = variables["vq_stats"]
    embeds = [np.asarray(stats["embed"])]
    for _ in range(20):
        (out, idx, loss, z), new_vars = vq.apply(
            {"params": params, "vq_stats": stats}, x, training=True,
            mutable=["vq_stats"],
        )
        stats = new_vars["vq_stats"]
        embeds.append(np.asarray(stats["embed"]))
        assert np.isfinite(float(loss))
    assert not np.allclose(embeds[0], embeds[-1]), "EMA codebook did not move"

    # codebook should approach the data distribution: mean quantization error
    # shrinks as the EMA converges
    def qerr(stats):
        (_, _, _, z), _ = vq.apply(
            {"params": params, "vq_stats": stats}, x, training=True,
            mutable=["vq_stats"],
        )
        zz = np.asarray(z).reshape(-1, 8)
        emb = np.asarray(stats["embed"])
        d = ((zz[:, None, :] - emb[None]) ** 2).sum(-1).min(1)
        return d.mean()

    e0 = qerr({**stats, "embed": jnp.asarray(embeds[0]),
               "embed_avg": jnp.asarray(embeds[0]),
               "ema_cluster_size": jnp.zeros_like(stats["ema_cluster_size"])})
    e1 = qerr(stats)
    assert e1 < e0, (e0, e1)

    # eval path is deterministic and consistent with indices_to_codes
    (out_e, idx_e, _, _) = vq.apply({"params": params, "vq_stats": stats}, x, training=False)
    dec = vq.apply({"params": params, "vq_stats": stats}, idx_e, method="indices_to_codes")
    np.testing.assert_allclose(np.asarray(out_e), np.asarray(dec), atol=1e-5)
