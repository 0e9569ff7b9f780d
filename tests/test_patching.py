"""Patching / packing roundtrip exactness tests.

Modelled on the reference's (stale) unit tests
(reference: dct_autoencoder/tests/testpatching.py:12-71): at compression 1.0
(beta=0, max_seq_len >= total tokens) preprocess -> pack -> postprocess must
reproduce the cropped original image.
"""
import numpy as np
import pytest

from dct_autoencoder_tpu.patches.extractor import DCTAutoencoderFeatureExtractor
from dct_autoencoder_tpu.patches.container import DCTPatches, from_dict, to_dict


def make_proc(patch_size=8, max_patch=16, max_seq_len=None, beta=0.0, channels=3):
    if max_seq_len is None:
        max_seq_len = max_patch * max_patch * channels
    return DCTAutoencoderFeatureExtractor(
        channels=channels,
        patch_size=patch_size,
        sample_patches_beta=beta,
        max_patch_h=max_patch,
        max_patch_w=max_patch,
        max_seq_len=max_seq_len,
    )


@pytest.mark.parametrize("hw", [(32, 32), (40, 24)])
def test_lossless_roundtrip(hw):
    """Patch-multiple sizes: the DCT plane is complete, roundtrip is exact."""
    rng = np.random.default_rng(0)
    h, w = hw
    proc = make_proc(patch_size=8, max_patch=8)
    im = rng.uniform(0.05, 0.95, size=(3, h, w)).astype(np.float32)

    d = proc.preprocess(im)
    batch = next(proc.iter_batches(iter([{k: [v] for k, v in d.items()}]), batch_size=None))
    out = proc.postprocess(batch)
    assert len(out) == 1
    rec = out[0]
    assert rec.shape == (3, h, w)
    np.testing.assert_allclose(rec, im, atol=2e-2)
    assert np.abs(rec - im).mean() < 2e-3


def test_non_multiple_size_lowpass_roundtrip():
    """Non-patch-multiple sizes crop the DCT plane (drop the highest
    frequencies) — reference behavior (feature_extraction...py:155-167).  A
    smooth image must still roundtrip closely at the original size."""
    h, w = 17, 33
    proc = make_proc(patch_size=8, max_patch=8)
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
    im = np.stack([0.3 + 0.4 * yy, 0.5 - 0.2 * xx, 0.2 + 0.3 * yy * xx]).astype(np.float32)

    d = proc.preprocess(im)
    batch = next(proc.iter_batches(iter([{k: [v] for k, v in d.items()}]), batch_size=None))
    rec = proc.postprocess(batch)[0]
    assert rec.shape == (3, h, w)
    assert np.abs(rec - im).mean() < 5e-3


def test_out_of_grid_patches_dropped():
    rng = np.random.default_rng(1)
    # 64x64 with patch 8 -> 8x8 grid, but max_patch 4 -> only 4x4 kept
    proc = make_proc(patch_size=8, max_patch=4)
    im = rng.uniform(0.1, 0.9, size=(3, 64, 64)).astype(np.float32)
    d = proc.preprocess(im)
    assert d["patches"].shape[0] == 4 * 4 * 3
    assert d["positions"].max() < 4


def test_packing_multiple_images():
    rng = np.random.default_rng(2)
    proc = make_proc(patch_size=8, max_patch=4, max_seq_len=128)
    ims = [rng.uniform(0.1, 0.9, size=(3, 32, 32)).astype(np.float32) for _ in range(5)]
    ds = [proc.preprocess(im) for im in ims]
    cols = {k: [d[k] for d in ds] for k in ds[0]}
    batches = list(proc.iter_batches(iter([cols]), batch_size=None))
    assert len(batches) == 1
    batch = batches[0]
    # 5 images x 48 tokens each = 240 tokens; 128-token rows -> 3 rows (2+2+1 images)
    assert batch.patches.shape[1] == 128
    assert len(batch.original_sizes) == 5
    outs = proc.postprocess(batch)
    assert len(outs) == 5
    for im, rec in zip(ims, outs):
        np.testing.assert_allclose(rec, im, atol=2e-2)


def test_attn_mask_block_diagonal():
    rng = np.random.default_rng(3)
    proc = make_proc(patch_size=8, max_patch=2, max_seq_len=32)
    ims = [rng.uniform(0.1, 0.9, size=(3, 16, 16)).astype(np.float32) for _ in range(2)]
    ds = [proc.preprocess(im) for im in ims]
    cols = {k: [d[k] for d in ds] for k in ds[0]}
    batch = next(proc.iter_batches(iter([cols]), batch_size=None))
    am = np.asarray(batch.attn_mask)[0, 0]
    ids = np.asarray(batch.batched_image_ids)[0]
    pad = np.asarray(batch.key_pad_mask)[0]
    for i in range(am.shape[0]):
        for j in range(am.shape[1]):
            expect = (ids[i] == ids[j]) and not pad[j]
            assert am[i, j] == expect


def test_stochastic_budget_respects_bounds():
    import random

    proc = make_proc(patch_size=8, max_patch=8, max_seq_len=64, beta=0.05)
    proc.rng = random.Random(0)
    rng = np.random.default_rng(4)
    im = rng.uniform(0.1, 0.9, size=(3, 64, 64)).astype(np.float32)
    for _ in range(20):
        d = proc.preprocess(im)
        k = d["patches"].shape[0]
        assert 1 <= k <= 64
        assert d["positions"].shape == (k, 2)
        assert d["channels"].shape == (k,)


def test_importance_prefers_low_frequency_and_intensity():
    proc = make_proc(patch_size=8, max_patch=8, max_seq_len=4)
    proc.sample_patches_beta = 0.0
    rng = np.random.default_rng(5)
    im = rng.uniform(0.1, 0.9, size=(3, 64, 64)).astype(np.float32)
    d = proc.preprocess(im)
    # with budget 4 the top tokens must be low-frequency (near the DC corner)
    assert (d["positions"].sum(axis=1) <= 2).all()
    # intensity channel (I, index 0, importance 8x) dominates the top picks
    assert (d["channels"] == 0).sum() >= 2


def test_token_serde_roundtrip():
    rng = np.random.default_rng(6)
    proc = make_proc(patch_size=8, max_patch=4, max_seq_len=96)
    ims = [rng.uniform(0.1, 0.9, size=(3, 32, 32)).astype(np.float32) for _ in range(3)]
    ds = [proc.preprocess(im) for im in ims]
    cols = {k: [d[k] for d in ds] for k in ds[0]}
    batch = next(proc.iter_batches(iter([cols]), batch_size=None))
    b, s, _ = batch.patches.shape
    codes = rng.integers(0, 8192, size=(b, s, 16))
    objs = to_dict(batch, codes)
    assert len(objs) == 3
    total_tokens = sum(len(o["codes"]) for o in objs)
    assert total_tokens == int((~np.asarray(batch.key_pad_mask)).sum())

    dp, codes_back = from_dict(objs[0])
    assert isinstance(dp, DCTPatches)
    assert codes_back.shape[0] == len(objs[0]["codes"])


def test_uint8_input_matches_float():
    """uint8 images convert on device; results match float input exactly."""
    rng = np.random.default_rng(11)
    proc = make_proc(patch_size=8, max_patch=8)
    im8 = rng.integers(0, 256, size=(3, 32, 32), dtype=np.uint8)
    imf = im8.astype(np.float32) / 255.0
    d8 = proc.preprocess(im8)
    df = proc.preprocess(imf)
    np.testing.assert_allclose(d8["patches"], df["patches"], atol=1e-5)
    np.testing.assert_array_equal(d8["positions"], df["positions"])
