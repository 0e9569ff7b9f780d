"""Tests for tools/nu_codebook_study.py (the committed repro of the round-4
nu-codebook study, docs/opt8bit_nu_codebook_r4.md)."""
import numpy as np
import pytest

from dct_autoencoder_tpu.tools.nu_codebook_study import (
    CANDIDATES,
    quant_roundtrip,
)
from dct_autoencoder_tpu.train.opt8bit import _unsigned_codebook


def test_candidate_codebooks_well_formed():
    for name, make in CANDIDATES.items():
        cb = make()
        assert cb.shape == (256,), name
        assert cb.min() >= 0.0 and cb.max() == pytest.approx(1.0), name
        assert np.all(np.diff(np.sort(cb)) >= 0), name


def test_u4_matches_shipped_codebook():
    # the study's u4 candidate must be EXACTLY the optimizer's codebook,
    # otherwise the study measures the wrong thing
    np.testing.assert_allclose(
        CANDIDATES["u4"](), np.asarray(_unsigned_codebook()), rtol=1e-6, atol=0
    )


def test_quant_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    # lognormal mimics nu's heavy right skew
    x = rng.lognormal(mean=-8.0, sigma=3.0, size=(4096,))
    cb = np.sort(CANDIDATES["u4"]())
    xh = quant_roundtrip(x, cb)
    # nearest-level rounding: error within one codebook gap of the true
    # value, and blockwise absmax normalization is exact at block maxima
    blocks = x.reshape(-1, 256)
    maxima = blocks.max(axis=1)
    bh = xh.reshape(-1, 256)
    idx = blocks.argmax(axis=1)
    np.testing.assert_allclose(bh[np.arange(len(idx)), idx], maxima, rtol=1e-12)
    assert np.mean(np.abs(xh - x)) / np.mean(np.abs(x)) < 0.05


def test_quant_roundtrip_pins_opt8bit_quantizer():
    # the study's numpy roundtrip must track the OPTIMIZER's blockwise
    # quantizer (train/opt8bit.py) — if someone changes _nearest_idx
    # tie-breaking, BLOCK, or scale handling there, this test forces the
    # committed study implementation (and doc) to follow
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dct_autoencoder_tpu.train import opt8bit

    assert opt8bit.BLOCK == 256  # the study's BLOCK constant
    rng = np.random.default_rng(1)
    x = rng.lognormal(mean=-8.0, sigma=3.0, size=(1024,)).astype(np.float32)
    cb = opt8bit._unsigned_codebook()
    codes, absmax = opt8bit.quantize_blockwise(jnp.asarray(x), cb)
    ref = np.asarray(
        opt8bit.dequantize_blockwise(codes, absmax, cb, x.shape, x.size)
    )
    ours = quant_roundtrip(x, np.sort(np.asarray(cb, np.float64)))
    np.testing.assert_allclose(ours, ref, rtol=2e-6, atol=0)


def test_exact_zero_rounding_hazard_is_measurable():
    # the study's headline mechanism: codebooks whose smallest nonzero level
    # is large round tiny-but-real nu to exact 0 (update denominator -> eps)
    cb_u2 = np.sort(CANDIDATES["u2"]())
    cb_u4 = np.sort(CANDIDATES["u4"]())
    x = np.full((256,), 1e-30)
    x[0] = 1.0  # block absmax
    tiny = np.full((256,), 1e-7)
    tiny[0] = 1.0
    assert quant_roundtrip(tiny, cb_u2)[1:].min() == 0.0
    assert quant_roundtrip(tiny, cb_u4)[1:].min() > 0.0
