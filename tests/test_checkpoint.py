"""Checkpoint/resume tests: exact state roundtrip + bitwise-identical resume."""
import jax
import numpy as np

from dct_autoencoder_tpu.models.patchnorm import calibrate_patchnorm_batch
from dct_autoencoder_tpu.train.checkpoint import (
    has_train_state,
    load_train_state,
    save_train_state,
)
from dct_autoencoder_tpu.train.loop import TrainState, make_optimizer, make_train_step

from test_train import setup_model


def test_save_load_roundtrip(tmp_path):
    model, proc, batch = setup_model()
    tx = make_optimizer(learning_rate=1e-3, max_iters=100, warmup_steps=0)
    state = TrainState.create(model.params, tx)
    step = jax.jit(make_train_step(model.module, tx))
    state, _ = step(state, model.patchnorm, batch)
    state, _ = step(state, model.patchnorm, batch)

    path = str(tmp_path / "ckpt")
    assert not has_train_state(path)
    save_train_state(path, state, model.patchnorm)
    assert has_train_state(path)

    fresh = TrainState.create(model.params, tx)
    restored, pn = load_train_state(path, fresh, model.patchnorm)
    assert int(restored.step) == 2

    for a, b in zip(
        jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(restored.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(state.opt_state),
        jax.tree_util.tree_leaves(restored.opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(pn.median), np.asarray(model.patchnorm.median))


def test_resume_is_bitwise_identical(tmp_path):
    """Training 4 steps straight == training 2, checkpointing, resuming 2."""
    model, proc, batch = setup_model()
    tx = make_optimizer(learning_rate=1e-3, max_iters=100, warmup_steps=0)
    step = jax.jit(make_train_step(model.module, tx))

    # straight 4 steps
    s_a = TrainState.create(model.params, tx)
    for _ in range(4):
        s_a, _ = step(s_a, model.patchnorm, batch)

    # 2 steps, save, restore, 2 more
    s_b = TrainState.create(model.params, tx)
    for _ in range(2):
        s_b, _ = step(s_b, model.patchnorm, batch)
    path = str(tmp_path / "ckpt")
    save_train_state(path, s_b, model.patchnorm)
    s_c, pn = load_train_state(path, TrainState.create(model.params, tx), model.patchnorm)
    for _ in range(2):
        s_c, _ = step(s_c, pn, batch)

    for a, b in zip(
        jax.tree_util.tree_leaves(s_a.params), jax.tree_util.tree_leaves(s_c.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(s_c.step) == 4
