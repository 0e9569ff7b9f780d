"""Sharded-execution tests on the virtual 8-device CPU mesh.

The TPU-native answer to the reference's untested torch.distributed paths
(SURVEY §4): validate that the train step compiles and runs under pjit with
(data, model) shardings and that collective-synced statistics agree with the
single-device result.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dct_autoencoder_tpu.models.factory import get_model_and_processor
from dct_autoencoder_tpu.models.patchnorm import calibrate_patchnorm_batch
from dct_autoencoder_tpu.models.vq import EMACodebookState, ema_codebook_update
from dct_autoencoder_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_spec,
    replicated,
    shard_batch,
    shard_params,
)
from dct_autoencoder_tpu.train.loop import TrainState, make_optimizer, make_train_step

from test_model import make_batch, tiny_config


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest should provide 8 fake CPU devices"
    mesh = make_mesh(n_model=2)
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2


def test_param_spec_tp_rules():
    cfg = tiny_config()
    model, _ = get_model_and_processor(cfg, sample_patches_beta=0.0)
    specs = param_spec(model.params, tensor_parallel=True)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    by_path = {"/".join(str(getattr(p, "key", p)) for p in path): s for path, s in flat}
    qk = [k for k in by_path if k.endswith("q_proj/kernel")]
    assert qk and all(by_path[k] == P(None, "model") for k in qk)
    fc2 = [k for k in by_path if k.endswith("fc2/kernel")]
    assert fc2 and all(by_path[k] == P("model", None) for k in fc2)
    pos = [k for k in by_path if "pos_embed" in k]
    assert pos and all(by_path[k] == P() for k in pos)


def sharded_vs_single(
    n_model, pipeline_microbatches=None, sequence_parallel=False,
    pin_state_sharding=False,
):
    """Run the jitted train step sharded and compare metrics to single-device.

    pipeline_microbatches: run both transformer stacks as a GPipe pipeline
    over the model axis (parallel/pipeline.py).  sequence_parallel: Megatron-
    SP sharding constraints on the residual stream (models/config.py)."""
    from dct_autoencoder_tpu.models.config import with_sequence_parallel

    cfg = tiny_config()
    if sequence_parallel:
        cfg = with_sequence_parallel(cfg)
    model, proc = get_model_and_processor(cfg, sample_patches_beta=0.0)
    rng = np.random.default_rng(0)
    batch = make_batch(proc, rng, n_images=8)
    # pad rows to a multiple of the data axis (x microbatches for pp)
    mesh = make_mesh(n_model=n_model)
    n_data = mesh.shape["data"]
    b = batch.patches.shape[0]
    row_multiple = n_data * (pipeline_microbatches or 1)
    pad_rows = (-b) % row_multiple
    if pad_rows:
        def pad(x):
            if x.ndim == 0:
                return x
            widths = [(0, pad_rows)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths)
        batch = jax.tree_util.tree_map(pad, batch)
        batch = batch.replace(key_pad_mask=batch.key_pad_mask.at[b:].set(True))

    model.patchnorm, _ = calibrate_patchnorm_batch(model.patchnorm, batch)
    tx = make_optimizer(learning_rate=1e-3, max_iters=10, warmup_steps=0)
    step_fn = make_train_step(model.module, tx)

    # single device result (always the plain sequential module)
    s0 = TrainState.create(model.params, tx)
    _, m_single = jax.jit(step_fn)(s0, model.patchnorm, batch)

    sharded_module = model.module
    if pipeline_microbatches:
        from dct_autoencoder_tpu.parallel.pipeline import make_pipelined_module

        sharded_module = make_pipelined_module(
            model.module, mesh, pipeline_microbatches
        )
    sharded_step_fn = (
        make_train_step(sharded_module, tx) if sharded_module is not model.module
        else step_fn
    )

    # sharded result (set_mesh provides the ambient mesh SP constraints key on)
    sharded_ctx = jax.set_mesh(mesh) if sequence_parallel else mesh
    with sharded_ctx:
        params = shard_params(model.params, mesh, tensor_parallel=n_model > 1)
        state = TrainState.create(params, tx)
        sharded_batch = shard_batch(batch, mesh)
        if pin_state_sharding:
            # the train() params-at-rest layout: masters + moments sharded
            # over the model axis, pinned on jit input AND output
            from dct_autoencoder_tpu.train.loop import model_state_sharding

            ssh = model_state_sharding(
                state, mesh, tensor_parallel=n_model > 1, zero1=False
            )
            state = jax.device_put(state, ssh)
            jitted = jax.jit(
                sharded_step_fn,
                in_shardings=(ssh, replicated(mesh), batch_sharding(mesh)),
                out_shardings=(ssh, None),
            )
        else:
            jitted = jax.jit(
                sharded_step_fn,
                in_shardings=(None, replicated(mesh), batch_sharding(mesh)),
            )
        new_state, m_sharded = jitted(state, model.patchnorm, sharded_batch)

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_sharded["loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(m_single["grad_norm"]), float(m_sharded["grad_norm"]), rtol=1e-3
    )
    return new_state


def test_data_parallel_step_matches_single_device():
    sharded_vs_single(n_model=1)


def test_tensor_parallel_step_matches_single_device():
    state = sharded_vs_single(n_model=2)
    # params actually sharded over the model axis
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    sharded_leaves = [
        v for p, v in flat if "fc1" in "/".join(str(getattr(x, "key", x)) for x in p)
    ]
    assert any(
        "model" in str(getattr(v, "sharding", "")) for v in sharded_leaves
    )


def test_pipeline_parallel_step_matches_single_device():
    """GPipe pipeline over the model axis (2 stages x 2 microbatches)
    reproduces the sequential-stack train step (loss + grad norm)."""
    sharded_vs_single(n_model=2, pipeline_microbatches=2)


def test_pipeline_params_at_rest_sharded_and_exact():
    """pp with the train() params-at-rest layout (model_state_sharding):
    master params AND Adam moments live model-axis-sharded across steps —
    pp buys parameter memory, not just activation locality — and the step
    still matches the single device bit-for-tolerance."""
    state = sharded_vs_single(
        n_model=2, pipeline_microbatches=2, pin_state_sharding=True
    )

    def model_sharded_fraction(tree):
        total = local = 0
        for leaf in jax.tree_util.tree_leaves(tree):
            if not hasattr(leaf, "sharding") or leaf.ndim == 0:
                continue
            total += leaf.size * leaf.dtype.itemsize
            local += int(
                np.prod(leaf.sharding.shard_shape(leaf.shape))
            ) * leaf.dtype.itemsize
        return total, local

    pt, pl = model_sharded_fraction(state.params)
    assert pl < pt, "master params not sharded at rest under pp"
    ot, ol = model_sharded_fraction(state.opt_state)
    assert ol < ot, "Adam moments not sharded at rest under pp"
    # the big matrices split 2 ways: per-device bytes well under 3/4 total
    assert pl < 0.75 * pt, (pl, pt)


def test_sequence_parallel_step_matches_single_device():
    """Megatron-SP sharding constraints are semantics-preserving under
    dp4 x tp2 (jax.set_mesh in the helper's sharded block activates them;
    the single-device reference traces with no mesh -> constraints no-op)."""
    sharded_vs_single(n_model=2, sequence_parallel=True)


def test_pipeline_stack_apply_grad_equivalence():
    """Pure-function check of the GPipe schedule: fwd AND grads match the
    sequential lax.scan over layers, with packing metadata riding along."""
    from dct_autoencoder_tpu.parallel.pipeline import (
        PipelineSpec,
        pipeline_stack_apply,
    )

    rng = np.random.default_rng(3)
    L, b, s, d = 4, 8, 16, 32
    stacked = {
        "w": jnp.asarray(rng.standard_normal((L, d, d)).astype(np.float32) * 0.2),
        "b": jnp.asarray(rng.standard_normal((L, d)).astype(np.float32) * 0.1),
    }
    x = jnp.asarray(rng.standard_normal((b, s, d)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 3, (b, s)).astype(np.int32))
    pad = jnp.asarray(rng.random((b, s)) < 0.2)

    def layer_apply(p, xm, ids_m, pad_m):
        # uses the metadata so the test catches metadata/activation skew
        gate = (~pad_m)[..., None].astype(xm.dtype)
        return jnp.tanh(xm @ p["w"] + p["b"]) * gate + ids_m[..., None] * 0.01

    def seq(params, x):
        def body(c, p):
            return layer_apply(p, c, ids, pad), None

        out, _ = jax.lax.scan(body, x, params)
        return out

    mesh = make_mesh(n_model=4)
    spec = PipelineSpec(mesh=mesh, n_microbatches=2)

    ref = seq(stacked, x)
    with mesh:
        out = jax.jit(
            lambda p, x: pipeline_stack_apply(layer_apply, p, x, ids, pad, spec)
        )(stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    g_ref = jax.grad(lambda p: jnp.sum(seq(p, x) ** 2))(stacked)
    with mesh:
        g_pp = jax.jit(
            jax.grad(
                lambda p: jnp.sum(
                    pipeline_stack_apply(layer_apply, p, x, ids, pad, spec) ** 2
                )
            )
        )(stacked)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pp)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), atol=1e-4)


def test_pipeline_rejects_bad_shapes():
    from dct_autoencoder_tpu.parallel.pipeline import (
        PipelineSpec,
        pipeline_stack_apply,
    )

    mesh = make_mesh(n_model=4)
    spec = PipelineSpec(mesh=mesh, n_microbatches=2)
    stacked = {"w": jnp.zeros((3, 4, 4))}  # 3 layers, 4 stages
    x = jnp.zeros((8, 4, 4))
    ids = jnp.zeros((8, 4), jnp.int32)
    pad = jnp.zeros((8, 4), bool)
    with pytest.raises(ValueError, match="stages"):
        pipeline_stack_apply(lambda p, x, i, m: x, stacked, x, ids, pad, spec)
    stacked = {"w": jnp.zeros((4, 4, 4))}
    x = jnp.zeros((6, 4, 4))  # 6 rows, data x micro = 2 x 2
    ids = jnp.zeros((6, 4), jnp.int32)
    pad = jnp.zeros((6, 4), bool)
    with pytest.raises(ValueError, match="divisible"):
        pipeline_stack_apply(lambda p, x, i, m: x, stacked, x, ids, pad, spec)


def test_zero1_opt_sharding_matches_single_device():
    """ZeRO-1 (optimizer moments sharded over the data axis) reproduces the
    single-device step and actually shards the Adam state."""
    from dct_autoencoder_tpu.train.loop import jit_train_step

    cfg = tiny_config()
    model, proc = get_model_and_processor(cfg, sample_patches_beta=0.0)
    rng = np.random.default_rng(3)
    batch = make_batch(proc, rng, n_images=8)
    mesh = make_mesh(n_model=1)
    n_data = mesh.shape["data"]
    b = batch.patches.shape[0]
    pad_rows = (-b) % n_data
    if pad_rows:
        def pad(x):
            if x.ndim == 0:
                return x
            return jnp.pad(x, [(0, pad_rows)] + [(0, 0)] * (x.ndim - 1))
        batch = jax.tree_util.tree_map(pad, batch)
        batch = batch.replace(key_pad_mask=batch.key_pad_mask.at[b:].set(True))
    model.patchnorm, _ = calibrate_patchnorm_batch(model.patchnorm, batch)
    tx = make_optimizer(learning_rate=1e-3, max_iters=10, warmup_steps=0)
    step_fn = make_train_step(model.module, tx)

    s0 = TrainState.create(model.params, tx)
    _, m_single = jax.jit(step_fn)(s0, model.patchnorm, batch)

    with mesh:
        state = TrainState.create(model.params, tx)
        jitted = jit_train_step(
            step_fn, mesh, None, zero1_state=state, zero1_min_size=0
        )
        sb = shard_batch(batch, mesh)
        new_state, m = jitted(state, model.patchnorm, sb, None)
        np.testing.assert_allclose(
            float(m_single["loss"]), float(m["loss"]), rtol=1e-4
        )
        np.testing.assert_allclose(
            float(m_single["grad_norm"]), float(m["grad_norm"]), rtol=1e-3
        )
        # Adam moments actually sharded over the data axis
        momenty = [
            v
            for v in jax.tree_util.tree_leaves(new_state.opt_state)
            if getattr(v, "ndim", 0) >= 1 and v.size >= 8
        ]
        assert momenty
        assert any("data" in str(getattr(v, "sharding", "")) for v in momenty)
        # params stay replicated (gathered back after the sharded update)
        for v in jax.tree_util.tree_leaves(new_state.params):
            assert "data" not in str(getattr(v.sharding, "spec", ""))
        # a second step runs straight off the sharded (donated) state
        new_state2, m2 = jitted(new_state, model.patchnorm, sb, None)
        assert np.isfinite(float(m2["loss"]))
        assert int(new_state2.step) == 2


def test_zero1_checkpoint_resume_exact(tmp_path):
    """Orbax save/restore of a ZeRO-1-sharded TrainState resumes bitwise:
    (step, save, restore, step) == (step, step)."""
    from dct_autoencoder_tpu.train.checkpoint import load_train_state, save_train_state
    from dct_autoencoder_tpu.train.loop import jit_train_step, zero1_state_sharding

    cfg = tiny_config()
    model, proc = get_model_and_processor(cfg, sample_patches_beta=0.0)
    rng = np.random.default_rng(9)
    batch = make_batch(proc, rng, n_images=8)
    mesh = make_mesh(n_model=1)
    n_data = mesh.shape["data"]
    b = batch.patches.shape[0]
    pad_rows = (-b) % n_data
    if pad_rows:
        def pad(x):
            if x.ndim == 0:
                return x
            return jnp.pad(x, [(0, pad_rows)] + [(0, 0)] * (x.ndim - 1))
        batch = jax.tree_util.tree_map(pad, batch)
        batch = batch.replace(key_pad_mask=batch.key_pad_mask.at[b:].set(True))
    model.patchnorm, _ = calibrate_patchnorm_batch(model.patchnorm, batch)
    tx = make_optimizer(learning_rate=1e-3, max_iters=10, warmup_steps=0)
    step_fn = make_train_step(model.module, tx)

    with mesh:
        zsh = zero1_state_sharding(
            TrainState.create(model.params, tx), mesh, min_size=0
        )
        state = jax.device_put(TrainState.create(model.params, tx), zsh)
        jitted = jit_train_step(
            step_fn, mesh, None, zero1_state=state, zero1_min_size=0
        )
        sb = shard_batch(batch, mesh)
        s1, _ = jitted(state, model.patchnorm, sb, None)
        save_train_state(str(tmp_path / "ck"), s1, model.patchnorm)

        # continued run (donates s1)
        s2_cont, m_cont = jitted(s1, model.patchnorm, sb, None)

        # resumed run: restore against a sharded template, re-place, step.
        # NB: s2_cont serves as the template — a fresh
        # TrainState.create(model.params, ...) would NOT work here because
        # device_put aliases the device-0 buffer for replicated shardings, so
        # donating the first state also deleted the original model.params.
        s1_rest, pn = load_train_state(str(tmp_path / "ck"), s2_cont, model.patchnorm)
        s1_rest = jax.device_put(s1_rest, zsh)
        s2_res, m_res = jitted(s1_rest, pn, sb, None)

    assert int(s2_res.step) == int(s2_cont.step) == 2
    np.testing.assert_array_equal(
        np.asarray(m_cont["loss"]), np.asarray(m_res["loss"])
    )
    for a, c in zip(
        jax.tree_util.tree_leaves(s2_cont.params),
        jax.tree_util.tree_leaves(s2_res.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_ema_codebook_psum_sync_matches_global():
    """shard_map + psum codebook stats == single-device global update
    (TPU-native replacement for torch.distributed all_reduce,
    reference vector_quantize.py:489-494)."""
    from jax import shard_map

    mesh = make_mesh(n_model=1)
    rng = np.random.default_rng(0)
    m, d, z = 64, 4, 8
    flat_x = jnp.asarray(rng.standard_normal((m, d)).astype(np.float32))
    valid = jnp.ones((m,), dtype=bool)
    state = EMACodebookState.create(z, d, jax.random.PRNGKey(0))

    global_new = ema_codebook_update(state, flat_x, valid)

    def local_update(state, x, v):
        return ema_codebook_update(state, x, v, sync_axis="data")

    with mesh:
        sharded = shard_map(
            local_update,
            mesh=mesh,
            in_specs=(P(), P("data"), P("data")),
            out_specs=P(),
        )
        dist_new = sharded(state, flat_x, valid)

    np.testing.assert_allclose(
        np.asarray(global_new.cluster_size), np.asarray(dist_new.cluster_size), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(global_new.embed), np.asarray(dist_new.embed), rtol=1e-4, atol=1e-5
    )


def test_sharded_encode_matches_single_device():
    """BASELINE configs 4-5 (sharded streaming encode): the dp-sharded encode
    over the 8-device mesh produces the SAME token records as single-device,
    and 2-host shard ownership unions to the 1-host stream (determinism)."""
    from dct_autoencoder_tpu.patches.container import to_dict
    from dct_autoencoder_tpu.train.loop import prepare_train_batch

    cfg = tiny_config("lfq")
    model, proc = get_model_and_processor(cfg, sample_patches_beta=0.0)
    rng = np.random.default_rng(12)
    batch = make_batch(proc, rng, n_images=16)
    nb = model.normalize_(batch)
    stripped, _ = prepare_train_batch(nb)

    # single device
    out1 = model.module.apply({"params": model.params}, stripped, training=False)
    rec1 = to_dict(
        out1["dct_patches"].replace(
            patch_sizes=batch.patch_sizes, original_sizes=batch.original_sizes
        ),
        out1["codes"],
    )

    # dp-sharded over all 8 virtual devices
    mesh = make_mesh(n_model=1)
    from dct_autoencoder_tpu.parallel.mesh import pad_batch_rows

    padded = pad_batch_rows(stripped, mesh.shape["data"])
    with mesh:
        sharded = shard_batch(padded, mesh)
        fn = jax.jit(
            lambda p, b: model.module.apply({"params": p}, b, training=False),
            in_shardings=(replicated(mesh), batch_sharding(mesh)),
        )
        out8 = fn(model.params, sharded)
    b1 = stripped.patches.shape[0]
    np.testing.assert_array_equal(
        np.asarray(out8["codes"])[:b1], np.asarray(out1["codes"])
    )
    rec8 = to_dict(
        out8["dct_patches"].replace(
            patch_sizes=batch.patch_sizes, original_sizes=batch.original_sizes
        ),
        out8["codes"],
    )
    assert len(rec8) == len(rec1) == 16
    for a, b in zip(rec1, rec8):
        assert [c["data"] for c in a["codes"]] == [c["data"] for c in b["codes"]]
