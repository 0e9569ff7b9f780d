"""Unit tests for the numerics core (ops/)."""
import numpy as np
import scipy.fft
import jax.numpy as jnp

from dct_autoencoder_tpu.ops.colorspace import (
    ipt_to_rgb,
    rgb_to_ipt,
    rgb_to_ycbcr,
    ycbcr_to_rgb,
)
from dct_autoencoder_tpu.ops.dct import block_dct_basis, dct2, dct_matrix, idct2
from dct_autoencoder_tpu.ops.stats import (
    calculate_perplexity,
    compute_entropy_loss,
    masked_mean,
)
from dct_autoencoder_tpu.ops.zigzag import flatten_zigzag, unflatten_zigzag, zigzag


def test_dct_matrix_orthonormal():
    for n in [4, 8, 14, 16, 33]:
        D = dct_matrix(n, np.float64)
        np.testing.assert_allclose(D @ D.T, np.eye(n), atol=1e-10)


def test_dct2_matches_scipy():
    rng = np.random.default_rng(0)
    for h, w in [(8, 8), (14, 28), (37, 11)]:
        x = rng.standard_normal((3, h, w)).astype(np.float32)
        got = np.asarray(dct2(jnp.asarray(x)))
        want = scipy.fft.dctn(x, axes=(-2, -1), norm="ortho")
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_idct2_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 56, 42)).astype(np.float32)
    y = idct2(dct2(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-4)


def test_block_dct_basis_matches_dct2():
    rng = np.random.default_rng(2)
    p = 8
    x = rng.standard_normal((p, p)).astype(np.float32)
    B = block_dct_basis(p)
    got = (B @ x.reshape(-1)).reshape(p, p)
    want = scipy.fft.dctn(x, norm="ortho")
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_ipt_roundtrip():
    rng = np.random.default_rng(3)
    x = rng.uniform(0.01, 1.0, size=(3, 16, 16)).astype(np.float32)
    y = ipt_to_rgb(rgb_to_ipt(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-3)


def test_ycbcr_roundtrip():
    rng = np.random.default_rng(4)
    x = rng.uniform(0.0, 1.0, size=(3, 8, 8)).astype(np.float32)
    y = ycbcr_to_rgb(rgb_to_ycbcr(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-5)


def test_zigzag_small():
    z = zigzag(3, 3)
    expected = np.array([[0, 1, 5], [2, 4, 6], [3, 7, 8]])
    np.testing.assert_array_equal(z, expected)


def test_zigzag_flatten_roundtrip():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 3, 7, 5)).astype(np.float32)
    flat = flatten_zigzag(jnp.asarray(x))
    back = unflatten_zigzag(flat, 7, 5)
    np.testing.assert_allclose(np.asarray(back), x, atol=0)
    # zigzag order starts at the DC coefficient
    np.testing.assert_allclose(np.asarray(flat)[..., 0], x[..., 0, 0])


def test_masked_mean():
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    m = jnp.asarray(np.array([1, 1, 0], dtype=np.float32))
    # reference semantics (util.py:346-353): sum of masked rows / mask count
    got = float(masked_mean(x, m))
    want = x[:2].sum() / 2.0
    np.testing.assert_allclose(got, float(want), rtol=1e-6)
    # per-dim variant used by the LFQ commit loss
    got_dim = np.asarray(masked_mean(x, m, dim=0))
    want_dim = np.asarray(x[:2].sum(axis=0) / 2.0)
    np.testing.assert_allclose(got_dim, want_dim, rtol=1e-6)


def test_perplexity_uniform_and_degenerate():
    codebook_size = 16
    codes = jnp.asarray(np.tile(np.arange(codebook_size), 10))
    p = float(calculate_perplexity(codes, codebook_size))
    np.testing.assert_allclose(p, codebook_size, rtol=1e-5)

    codes = jnp.asarray(np.zeros(100, dtype=np.int32))
    p = float(calculate_perplexity(codes, codebook_size))
    np.testing.assert_allclose(p, 1.0, rtol=1e-5)

    # null index ignored
    codes = jnp.asarray(np.concatenate([np.zeros(50, dtype=np.int32), -np.ones(50, dtype=np.int32)]))
    p = float(calculate_perplexity(codes, codebook_size))
    np.testing.assert_allclose(p, 1.0, rtol=1e-5)


def test_entropy_loss_prefers_diversity():
    rng = np.random.default_rng(6)
    b, s, c, z = 2, 8, 2, 16
    mask = jnp.ones((b, s), dtype=bool)
    # peaked on a single code for every token -> avg_entropy low -> loss high
    aff_collapsed = np.full((b, s, c, z), -10.0, dtype=np.float32)
    aff_collapsed[..., 0] = 10.0
    # peaked on a different code per token -> avg_entropy high -> loss lower
    aff_diverse = np.full((b, s, c, z), -10.0, dtype=np.float32)
    for i in range(s):
        aff_diverse[:, i, :, i % z] = 10.0
    l_collapsed = float(compute_entropy_loss(jnp.asarray(aff_collapsed), mask))
    l_diverse = float(compute_entropy_loss(jnp.asarray(aff_diverse), mask))
    assert l_diverse < l_collapsed


def test_masks():
    from dct_autoencoder_tpu.ops.masks import (
        get_circular_mask,
        get_square_dct_basis,
        get_upper_left_tri_p,
        get_upper_left_tri_p_w_channel_preferences,
        gkern,
    )

    m = get_upper_left_tri_p((3, 8, 8), 0.5)
    assert m.shape == (1, 8, 8)
    # DC corner (most negative distance -> below threshold) is dropped-side;
    # far corner kept: mask keeps large-distance entries
    assert 0.3 < m.mean() < 0.7

    cm = get_upper_left_tri_p_w_channel_preferences((3, 8, 8), 0.3, (8, 1, 1))
    assert cm.shape == (3, 8, 8)
    # the important channel keeps more coefficients masked-out budget-wise
    assert cm[0].sum() <= cm[1].sum()

    circ = get_circular_mask((3, 8, 8), 0.5)
    assert circ.shape == (1, 8, 8)
    assert not circ[0, 4, 4]  # center is cut out

    basis = get_square_dct_basis(4)
    assert basis.shape == (4, 4, 4, 4)
    np.testing.assert_allclose(basis[0, 0], np.ones((4, 4)))

    g = gkern(16)
    assert g.shape == (16, 16)
    assert g.max() == g[8 - 1 + 1, 8 - 1 + 1] or g.max() == g[7, 7]


def test_fft_roundtrip():
    from dct_autoencoder_tpu.ops.masks import fft_amp_phase, inverse_fft

    rng = np.random.default_rng(7)
    x = rng.standard_normal((8, 8)).astype(np.float32)
    amp, ph = fft_amp_phase(jnp.asarray(x))
    back = inverse_fft(amp, ph)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-5)


def test_pad_sequence_and_decay_and_ema():
    from dct_autoencoder_tpu.ops.stats import ema_update_2d, get_decay_fn, pad_sequence

    seqs = [np.ones((2, 3), np.float32), np.ones((4, 3), np.float32) * 2]
    out = np.asarray(pad_sequence(seqs, 5))
    assert out.shape == (2, 5, 3)
    np.testing.assert_allclose(out[0, :2], 1.0)
    np.testing.assert_allclose(out[0, 2:], 0.0)
    np.testing.assert_allclose(out[1, :4], 2.0)

    fn = get_decay_fn(1.0, 0.0, 10)
    assert fn(0) == 1.0 and fn(10) == 0.0 and fn(11) == 0.0 and fn(5) == 0.5

    old = jnp.zeros((4, 4))
    new = jnp.ones((2, 2))
    upd = np.asarray(ema_update_2d(old, new, alpha=0.5))
    np.testing.assert_allclose(upd[:2, :2], 0.5)
    np.testing.assert_allclose(upd[2:, 2:], 0.0)
