"""LFQ bit-exactness and behavior tests (reference: dct_autoencoder/lfq.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from dct_autoencoder_tpu.models.lfq import LFQ, _bit_mask, _materialize_codebook


def make_lfq(dim=32, codebook_size=256, num_codebooks=2):
    lfq = LFQ(dim=dim, codebook_size=codebook_size, num_codebooks=num_codebooks)
    x = jnp.zeros((1, 4, dim))
    params = lfq.init(jax.random.PRNGKey(0), x, mask=jnp.ones((1, 4), dtype=bool))
    return lfq, params


def test_bit_mask_msb_first():
    np.testing.assert_array_equal(_bit_mask(4), [8, 4, 2, 1])


def test_codebook_materialization():
    cb = _materialize_codebook(8, 3, 1.0)
    assert cb.shape == (8, 3)
    # index 0 -> all -1; index 7 -> all +1; index 4 -> (+1, -1, -1) MSB-first
    np.testing.assert_array_equal(cb[0], [-1, -1, -1])
    np.testing.assert_array_equal(cb[7], [1, 1, 1])
    np.testing.assert_array_equal(cb[4], [1, -1, -1])


def test_indices_codes_roundtrip():
    """indices -> codes -> indices must be the identity (bit-exact)."""
    lfq, params = make_lfq()
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 256, size=(2, 8, 2)))

    def run(p, idx):
        codes = lfq.apply(p, idx, project_out=False, method="indices_to_codes")
        return codes

    codes = run(params, idx)  # (2, 8, 2*8)
    assert codes.shape == (2, 8, 16)
    # re-derive indices by sign
    bits = np.asarray(codes).reshape(2, 8, 2, 8) > 0
    mask = np.asarray(_bit_mask(8))
    idx_back = (bits * mask).sum(-1)
    np.testing.assert_array_equal(idx_back, np.asarray(idx))


def test_forward_quantize_and_index_consistency():
    lfq, params = make_lfq()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 32)).astype(np.float32))
    mask = jnp.ones((2, 8), dtype=bool)

    out, indices, commit, dists = lfq.apply(params, x, mask=mask, training=True)
    assert out.shape == x.shape
    assert indices.shape == (2, 8, 2)
    assert dists.shape == (2, 8, 2, 256)
    assert float(commit) >= 0.0

    # eval path gives same indices (quantization is deterministic)
    out_e, indices_e, commit_e, dists_e = lfq.apply(params, x, mask=mask, training=False)
    np.testing.assert_array_equal(np.asarray(indices), np.asarray(indices_e))
    assert float(commit_e) == 0.0


def test_straight_through_gradients_flow():
    lfq, params = make_lfq()
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 4, 32)).astype(np.float32))
    mask = jnp.ones((1, 4), dtype=bool)

    def loss_fn(p, x):
        out, _, commit, _ = lfq.apply(p, x, mask=mask, training=True)
        return jnp.sum(out**2) + commit

    gx = jax.grad(loss_fn, argnums=1)(params, x)
    assert np.isfinite(np.asarray(gx)).all()
    assert np.abs(np.asarray(gx)).sum() > 0.0


def test_no_projection_when_dim_matches():
    lfq = LFQ(dim=16, codebook_size=256, num_codebooks=2)
    assert not lfq.has_projections
    x = jnp.zeros((1, 4, 16))
    params = lfq.init(jax.random.PRNGKey(0), x, mask=jnp.ones((1, 4), dtype=bool))
    out, idx, _, _ = lfq.apply(params, x, mask=jnp.ones((1, 4), dtype=bool), training=False)
    # with zero input, x > 0 is False everywhere -> all bits 0 -> index 0, out all -1
    np.testing.assert_array_equal(np.asarray(idx), 0)
    np.testing.assert_array_equal(np.asarray(out), -1.0)
