"""Blockwise 8-bit AdamW state (train/opt8bit.py) — the reference trains
with bitsandbytes PagedAdamW8bit by default (reference main.py:420-425);
these tests pin the TPU-native counterpart's accuracy, memory ratio, and
integration with the real train step."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dct_autoencoder_tpu.train.loop import TrainState, make_optimizer, make_train_step
from dct_autoencoder_tpu.train.opt8bit import (
    _signed_codebook,
    _unsigned_codebook,
    adamw8bit,
    dequantize_blockwise,
    opt_state_bytes,
    quantize_blockwise,
)

from test_train import setup_model


def test_quantize_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    for cb, data in [
        (_signed_codebook(), rng.standard_normal(5000) * 0.01),
        (_unsigned_codebook(), np.abs(rng.standard_normal(5000)) * 1e-4),
    ]:
        x = jnp.asarray(data.astype(np.float32))
        codes, absmax = quantize_blockwise(x, cb)
        xr = dequantize_blockwise(codes, absmax, cb, x.shape, x.size)
        rel = float(jnp.linalg.norm(xr - x) / jnp.linalg.norm(x))
        assert rel < 0.05, rel
        assert codes.dtype == jnp.uint8


def test_adamw8bit_tracks_fp32_on_quadratic():
    rng = np.random.default_rng(1)
    params = {"w": jnp.asarray(rng.standard_normal((64, 64)).astype(np.float32))}
    target = jnp.asarray(rng.standard_normal((64, 64)).astype(np.float32))

    def loss(p):
        return jnp.mean((p["w"] - target) ** 2)

    finals = {}
    for name, tx in [
        ("fp32", optax.adamw(1e-2, b1=0.9, b2=0.99, weight_decay=0.1)),
        ("8bit", adamw8bit(1e-2, weight_decay=0.1)),
    ]:
        p, st = dict(params), None
        st = tx.init(p)

        @jax.jit
        def step(p, st):
            l, g = jax.value_and_grad(loss)(p)
            u, st = tx.update(g, st, p)
            return optax.apply_updates(p, u), st, l

        for _ in range(50):
            p, st, l = step(p, st)
        finals[name] = float(l)
    # quantization noise must not change convergence materially
    assert abs(finals["8bit"] - finals["fp32"]) / finals["fp32"] < 0.05, finals


def test_opt8bit_checkpoint_resume_exact(tmp_path):
    """Orbax save/restore of the int8 moment state resumes bitwise — the
    quantized codes are integers, so (step, save, restore, step) must equal
    (step, step) EXACTLY."""
    from dct_autoencoder_tpu.train.checkpoint import load_train_state, save_train_state

    model, proc, batch = setup_model()
    tx = make_optimizer(
        learning_rate=1e-3, max_iters=10, warmup_steps=0, opt_8bit=True
    )
    step = jax.jit(make_train_step(model.module, tx))

    s1, _ = step(TrainState.create(model.params, tx), model.patchnorm, batch)
    save_train_state(str(tmp_path / "ck"), s1, model.patchnorm)
    s2_cont, m_cont = step(s1, model.patchnorm, batch)

    s1_rest, pn = load_train_state(str(tmp_path / "ck"), s2_cont, model.patchnorm)
    s2_rest, m_rest = step(s1_rest, pn, batch)

    np.testing.assert_array_equal(
        np.asarray(m_cont["loss"]), np.asarray(m_rest["loss"])
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s2_cont.opt_state),
        jax.tree_util.tree_leaves(s2_rest.opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_opt8bit_composes_with_zero1():
    """ZeRO-1 shards the int8 code/absmax leaves too (blocks on the leading
    dim), and the sharded step reproduces the single-device metrics."""
    from dct_autoencoder_tpu.parallel.mesh import make_mesh, shard_batch
    from dct_autoencoder_tpu.train.loop import jit_train_step, zero1_state_sharding

    model, proc, batch = setup_model()
    mesh = make_mesh(n_model=1)
    n_data = mesh.shape["data"]
    b = batch.patches.shape[0]
    pad_rows = (-b) % n_data
    if pad_rows:
        pad = lambda x: x if x.ndim == 0 else jnp.pad(
            x, [(0, pad_rows)] + [(0, 0)] * (x.ndim - 1)
        )
        batch = jax.tree_util.tree_map(pad, batch)
        batch = batch.replace(key_pad_mask=batch.key_pad_mask.at[b:].set(True))

    tx = make_optimizer(
        learning_rate=1e-3, max_iters=10, warmup_steps=0, opt_8bit=True
    )
    step_fn = make_train_step(model.module, tx)
    _, m_single = jax.jit(step_fn)(
        TrainState.create(model.params, tx), model.patchnorm, batch
    )

    with mesh:
        state = TrainState.create(model.params, tx)
        zsh = zero1_state_sharding(state, mesh, min_size=0)
        state = jax.device_put(state, zsh)
        jitted = jit_train_step(
            step_fn, mesh, None, zero1_state=state, zero1_min_size=0
        )
        new_state, m_sh = jitted(state, model.patchnorm, shard_batch(batch, mesh), None)

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_sh["loss"]), rtol=1e-4
    )
    # the uint8 code leaves are actually sharded over data
    sharded = [
        leaf
        for leaf in jax.tree_util.tree_leaves(new_state.opt_state)
        if hasattr(leaf, "dtype")
        and leaf.dtype == jnp.uint8
        and "data" in str(getattr(leaf, "sharding", ""))
    ]
    assert sharded, "no int8 moment leaf sharded over the data axis"


def test_opt8bit_real_train_step_and_memory():
    """One jitted train step on the real model with 8-bit moments: finite
    loss, params move, and the Adam state is ~4x smaller than fp32's."""
    model, proc, batch = setup_model()
    tx32 = make_optimizer(learning_rate=1e-3, max_iters=10, warmup_steps=0)
    tx8 = make_optimizer(
        learning_rate=1e-3, max_iters=10, warmup_steps=0, opt_8bit=True
    )

    s32 = TrainState.create(model.params, tx32)
    s8 = TrainState.create(model.params, tx8)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(model.params))
    b32 = opt_state_bytes(s32.opt_state)
    b8 = opt_state_bytes(s8.opt_state)
    assert b8 < b32 / 3.5, (b8, b32)
    assert b8 / n_params < 2.5, b8 / n_params  # ~2.03 bytes/param

    step8 = jax.jit(make_train_step(model.module, tx8))
    s8b, m8 = step8(s8, model.patchnorm, batch)
    assert np.isfinite(float(m8["loss"]))
    moved = [
        float(jnp.abs(a - b).max())
        for a, b in zip(
            jax.tree_util.tree_leaves(s8.params),
            jax.tree_util.tree_leaves(s8b.params),
        )
    ]
    assert max(moved) > 0

    # and it tracks the fp32 step's metrics on the same batch
    step32 = jax.jit(make_train_step(model.module, tx32))
    _, m32 = step32(s32, model.patchnorm, batch)
    np.testing.assert_allclose(float(m8["loss"]), float(m32["loss"]), rtol=1e-4)


def test_opt8bit_composes_with_tp_at_rest():
    """model_state_sharding under tp2 with int8 moments: TP specs apply only
    to shape-compatible leaves (the quantized code/absmax payloads fall back
    cleanly), and the pinned-layout step reproduces single-device metrics."""
    from dct_autoencoder_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        replicated,
        shard_batch,
        shard_params,
    )
    from dct_autoencoder_tpu.train.loop import model_state_sharding

    model, proc, batch = setup_model()
    mesh = make_mesh(n_model=2)
    n_data = mesh.shape["data"]
    b = batch.patches.shape[0]
    pad_rows = (-b) % n_data
    if pad_rows:
        pad = lambda x: x if x.ndim == 0 else jnp.pad(
            x, [(0, pad_rows)] + [(0, 0)] * (x.ndim - 1)
        )
        batch = jax.tree_util.tree_map(pad, batch)
        batch = batch.replace(key_pad_mask=batch.key_pad_mask.at[b:].set(True))

    tx = make_optimizer(
        learning_rate=1e-3, max_iters=10, warmup_steps=0, opt_8bit=True
    )
    step_fn = make_train_step(model.module, tx)
    _, m_single = jax.jit(step_fn)(
        TrainState.create(model.params, tx), model.patchnorm, batch
    )

    with mesh:
        params = shard_params(model.params, mesh, tensor_parallel=True)
        state = TrainState.create(params, tx)
        ssh = model_state_sharding(state, mesh, tensor_parallel=True)
        state = jax.device_put(state, ssh)
        jitted = jax.jit(
            step_fn,
            in_shardings=(ssh, replicated(mesh), batch_sharding(mesh)),
            out_shardings=(ssh, None),
        )
        new_state, m_sh = jitted(state, model.patchnorm, shard_batch(batch, mesh))

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_sh["loss"]), rtol=1e-4
    )
    # master params sharded over the model axis at rest
    assert any(
        "model" in str(getattr(v, "sharding", ""))
        for v in jax.tree_util.tree_leaves(new_state.params)
    )
