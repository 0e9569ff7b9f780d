"""Differentiable pixel-loss tests (bucketed single-grid batches)."""
import jax
import jax.numpy as jnp
import numpy as np

from dct_autoencoder_tpu.patches.extractor import DCTAutoencoderFeatureExtractor
from dct_autoencoder_tpu.train.pixel_loss import (
    make_row_offsets,
    pixel_loss,
    unpatch_to_images,
)


def make_bucketed_batch(rng, n_images=4, size=32, patch=8):
    proc = DCTAutoencoderFeatureExtractor(
        channels=3, patch_size=patch, sample_patches_beta=0.0,
        max_patch_h=size // patch, max_patch_w=size // patch,
        max_seq_len=(size // patch) ** 2 * 3,
    )
    ims = [rng.uniform(0.1, 0.9, size=(3, size, size)).astype(np.float32) for _ in range(n_images)]
    ds = [proc.preprocess(im) for im in ims]
    cols = {k: [d[k] for d in ds] for k in ds[0]}
    batch = next(proc.iter_batches(iter([cols]), batch_size=None))
    return proc, ims, batch


def test_unpatch_matches_postprocess():
    rng = np.random.default_rng(0)
    proc, ims, batch = make_bucketed_batch(rng)
    offsets, n_images = make_row_offsets(batch)
    grid = batch.patch_sizes[0]

    recs = unpatch_to_images(
        batch.patches, batch, offsets, grid, proc.patch_size, 3, max_images=n_images
    )
    want = proc.postprocess(batch)
    for i in range(n_images):
        np.testing.assert_allclose(np.asarray(recs[i]), want[i], atol=1e-3)


def test_pixel_loss_zero_on_perfect_reconstruction():
    rng = np.random.default_rng(1)
    proc, ims, batch = make_bucketed_batch(rng)
    offsets, n_images = make_row_offsets(batch)
    grid = batch.patch_sizes[0]
    targets = jnp.asarray(np.stack(ims))
    valid = jnp.ones((n_images,), dtype=bool)

    loss = pixel_loss(
        batch.patches, batch, targets, valid, offsets, grid, proc.patch_size
    )
    assert float(loss) < 1e-5

    # perturbed patches -> loss grows
    noisy = batch.patches + 0.1
    loss2 = pixel_loss(noisy, batch, targets, valid, offsets, grid, proc.patch_size)
    assert float(loss2) > float(loss)


def test_pixel_loss_differentiable():
    rng = np.random.default_rng(2)
    proc, ims, batch = make_bucketed_batch(rng, n_images=2)
    offsets, n_images = make_row_offsets(batch)
    grid = batch.patch_sizes[0]
    targets = jnp.asarray(np.stack(ims))
    valid = jnp.ones((n_images,), dtype=bool)

    def loss_fn(patches):
        return pixel_loss(patches, batch, targets, valid, offsets, grid, proc.patch_size)

    g = jax.grad(loss_fn)(batch.patches + 0.05)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    # gradient lives on valid tokens
    valid_tok = ~np.asarray(batch.key_pad_mask)
    assert np.abs(g[valid_tok]).sum() > 0
    np.testing.assert_allclose(g[~valid_tok], 0.0, atol=1e-12)
