"""Equivalence tests for the in-program 1F1B schedule
(parallel/pipeline_1f1b.py) on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dct_autoencoder_tpu.parallel.mesh import make_mesh
from dct_autoencoder_tpu.parallel.pipeline import PipelineSpec
from dct_autoencoder_tpu.parallel.pipeline_1f1b import pipeline_1f1b_loss_and_grad


def _problem(L=4, b=16, s=8, d=16, seed=3):
    rng = np.random.default_rng(seed)
    stacked = {
        "w": jnp.asarray(rng.standard_normal((L, d, d)).astype(np.float32) * 0.2),
        "b": jnp.asarray(rng.standard_normal((L, d)).astype(np.float32) * 0.1),
    }
    x = jnp.asarray(rng.standard_normal((b, s, d)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 3, (b, s)).astype(np.int32))
    pad = jnp.asarray(rng.random((b, s)) < 0.2)
    return stacked, x, ids, pad


def _layer_apply(p, xm, ids_m, pad_m):
    # metadata-consuming layer so the test catches activation/metadata skew
    gate = (~pad_m)[..., None].astype(xm.dtype)
    return jnp.tanh(xm @ p["w"] + p["b"]) * gate + ids_m[..., None] * 0.01


def _loss_fn(y, ids_m, pad_m):
    mask = (~pad_m)[..., None].astype(y.dtype)
    return jnp.mean((y * mask) ** 2) + 0.001 * jnp.mean(ids_m.astype(y.dtype))


def _sequential_reference(stacked, x, ids, pad, n_chunks):
    """mean-over-microbatches loss + grads via plain autodiff, chunked in the
    same contiguous row order the (data x microbatch) split induces."""

    def seq_apply(params, xm, ids_m, pad_m):
        def body(c, p):
            return _layer_apply(p, c, ids_m, pad_m), None

        out, _ = jax.lax.scan(body, xm, params)
        return out

    def total_loss(params, x):
        rows = x.shape[0] // n_chunks
        losses = []
        for c in range(n_chunks):
            sl = slice(c * rows, (c + 1) * rows)
            y = seq_apply(params, x[sl], ids[sl], pad[sl])
            losses.append(_loss_fn(y, ids[sl], pad[sl]))
        return jnp.mean(jnp.stack(losses))

    loss, (gp, gx) = jax.value_and_grad(total_loss, argnums=(0, 1))(stacked, x)
    return loss, gp, gx


@pytest.mark.parametrize("n_model,M", [(4, 2), (4, 4), (2, 6), (8, 2)])
def test_1f1b_matches_sequential(n_model, M):
    stacked, x, ids, pad = _problem(L=8 if n_model == 8 else 4, b=48, s=8, d=16)
    mesh = make_mesh(n_model=n_model)
    n_data = mesh.shape["data"]
    if x.shape[0] % (n_data * M):
        pytest.skip("row count does not divide this mesh")
    spec = PipelineSpec(mesh=mesh, n_microbatches=M)

    ref_loss, ref_gp, ref_gx = _sequential_reference(
        stacked, x, ids, pad, n_chunks=n_data * M
    )

    with mesh:
        loss, gp, gx = jax.jit(
            lambda p, x: pipeline_1f1b_loss_and_grad(
                _layer_apply, _loss_fn, p, x, ids, pad, spec
            )
        )(stacked, x)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for a, b_ in zip(
        jax.tree_util.tree_leaves(ref_gp), jax.tree_util.tree_leaves(gp)
    ):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ref_gx), atol=1e-5)


def test_1f1b_param_grads_stay_model_sharded():
    stacked, x, ids, pad = _problem(b=16)
    mesh = make_mesh(n_model=4)
    spec = PipelineSpec(mesh=mesh, n_microbatches=2)
    with mesh:
        _, gp, _ = jax.jit(
            lambda p, x: pipeline_1f1b_loss_and_grad(
                _layer_apply, _loss_fn, p, x, ids, pad, spec
            )
        )(stacked, x)
    # grads leave the shard_map still partitioned over the model axis on the
    # stacked (L,) layout — the layout the params-at-rest optimizer step uses
    sh = gp["w"].sharding
    assert sh.spec[0] == "model", sh.spec


def test_1f1b_rejects_bad_shapes():
    stacked, x, ids, pad = _problem(L=3, b=16)
    mesh = make_mesh(n_model=4)
    spec = PipelineSpec(mesh=mesh, n_microbatches=2)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_1f1b_loss_and_grad(_layer_apply, _loss_fn, stacked, x, ids, pad, spec)

    stacked, x, ids, pad = _problem(L=4, b=10)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_1f1b_loss_and_grad(_layer_apply, _loss_fn, stacked, x, ids, pad, spec)
