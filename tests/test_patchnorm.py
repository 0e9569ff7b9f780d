"""PatchNorm calibration + inference tests.

Modelled on the reference's (stale) norm test
(reference: dct_autoencoder/tests/testnorm.py:18-55): feed data with known
per-position statistics, plus poisoned padding rows that must be ignored, and
check the learned stats converge to the truth.
"""
import jax.numpy as jnp
import numpy as np

from dct_autoencoder_tpu.models.patchnorm import (
    PatchNormState,
    apply_patchnorm,
    calibrate_patchnorm_batch,
    inverse_patchnorm,
)
from dct_autoencoder_tpu.patches.container import DCTPatches
from dct_autoencoder_tpu.patches.extractor import DCTAutoencoderFeatureExtractor
from dct_autoencoder_tpu.patches.packing import batch_groups, group_patches_by_max_seq_len


def make_full_batch(rng, n_images, c=2, H=3, W=3, pz=4, loc=None, scale=None):
    """Images with one token per (c,h,w) position; laplace(loc, scale) data."""
    if loc is None:
        loc = rng.normal(size=(c, H, W, pz)).astype(np.float32)
    if scale is None:
        scale = rng.uniform(0.5, 2.0, size=(c, H, W, pz)).astype(np.float32)

    items = []
    for _ in range(n_images):
        vals = rng.laplace(loc, scale).astype(np.float32)  # (c,H,W,pz)
        patches = vals.transpose(1, 2, 0, 3).reshape(H * W * c, pz)
        pos = np.stack(
            np.meshgrid(np.arange(H), np.arange(W), indexing="ij"), axis=-1
        ).reshape(H * W, 2)
        pos = np.repeat(pos, c, axis=0)
        ch = np.tile(np.arange(c), H * W)
        items.append((patches, pos.astype(np.int32), ch.astype(np.int32)))

    state = group_patches_by_max_seq_len(items, max_seq_len=c * H * W)
    if state.group:
        state.groups.append(state.group)
    batch = batch_groups(
        state.groups,
        max_seq_len=c * H * W,
        patch_sizes=tuple((H, W) for _ in range(n_images)),
        original_sizes=tuple((H * 4, W * 4) for _ in range(n_images)),
    )
    return batch, loc, scale


def test_calibration_converges_to_laplace_stats():
    rng = np.random.default_rng(0)
    c, H, W, pz = 2, 3, 3, 4
    state = PatchNormState.create(c, H, W, pz)

    loc = rng.normal(size=(c, H, W, pz)).astype(np.float32)
    scale = rng.uniform(0.5, 2.0, size=(c, H, W, pz)).astype(np.float32)

    for _ in range(8):
        batch, _, _ = make_full_batch(rng, 64, c, H, W, pz, loc, scale)
        state, out = calibrate_patchnorm_batch(state, batch)

    # median ~ loc; mean-absolute-deviation b ~ scale (laplace MAD = scale)
    med_err = np.abs(np.asarray(state.median) - loc).mean()
    b_err = np.abs(np.asarray(state.b) - scale).mean()
    assert med_err < 0.15, med_err
    assert b_err < 0.25, b_err
    assert np.asarray(state.n).min() == 8 * 64


def test_padding_is_ignored_in_calibration():
    rng = np.random.default_rng(1)
    c, H, W, pz = 1, 2, 2, 3
    state = PatchNormState.create(c, H, W, pz)
    batch, loc, scale = make_full_batch(rng, 16, c, H, W, pz)

    # poison the padded region with huge values; stats must not move
    patches = np.asarray(batch.patches).copy()
    pad = np.asarray(batch.key_pad_mask)
    patches[pad] = 1e6
    poisoned = batch.replace(patches=jnp.asarray(patches))

    s1, _ = calibrate_patchnorm_batch(state, batch)
    s2, _ = calibrate_patchnorm_batch(state, poisoned)
    np.testing.assert_allclose(np.asarray(s1.median), np.asarray(s2.median), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.b), np.asarray(s2.b), atol=1e-2)
    np.testing.assert_allclose(np.asarray(s1.n), np.asarray(s2.n))


def test_calibration_returns_masked_raw_patches():
    rng = np.random.default_rng(2)
    state = PatchNormState.create(1, 2, 2, 3)
    batch, _, _ = make_full_batch(rng, 4, 1, 2, 2, 3)
    _, out = calibrate_patchnorm_batch(state, batch)
    valid = ~np.asarray(batch.key_pad_mask)
    np.testing.assert_allclose(
        np.asarray(out)[valid], np.asarray(batch.patches)[valid], atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(out)[~valid], 0.0)


def test_normalize_inverse_roundtrip_and_clamp():
    rng = np.random.default_rng(3)
    c, H, W, pz = 2, 3, 3, 4
    state = PatchNormState.create(c, H, W, pz)
    for _ in range(4):
        batch, _, _ = make_full_batch(rng, 32, c, H, W, pz)
        state, _ = calibrate_patchnorm_batch(state, batch)

    batch, _, _ = make_full_batch(rng, 8, c, H, W, pz)
    normed = apply_patchnorm(state, batch)
    assert float(jnp.max(normed)) <= 6.0 and float(jnp.min(normed)) >= -6.0

    # within the clamp region, inverse(normalize(x)) == x
    rec = inverse_patchnorm(state, batch.replace(patches=normed))
    valid = ~np.asarray(batch.key_pad_mask)
    inside = (np.asarray(normed) > -6.0) & (np.asarray(normed) < 6.0)
    sel = valid[..., None] & inside
    np.testing.assert_allclose(
        np.asarray(rec)[sel], np.asarray(batch.patches)[sel], rtol=1e-3, atol=1e-3
    )

    # normalized data should be roughly standardized
    vals = np.asarray(normed)[valid]
    assert abs(np.median(vals)) < 0.1
    assert 0.5 < vals.std() < 2.0
