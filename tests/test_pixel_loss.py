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


def test_packed_pixel_loss_matches_eager_reference():
    """In-jit packed pixel loss == reference-style per-image postprocess MSE.

    Images sized to exact patch multiples so crop == original and the
    Parseval-equivalence caveat is exact (see packed_pixel_loss docstring).
    """
    from dct_autoencoder_tpu.train.pixel_loss import (
        make_grid_sizes,
        packed_pixel_loss,
    )

    rng = np.random.default_rng(3)
    proc, ims, batch = make_bucketed_batch(rng, n_images=5)
    grid = (proc.max_patch_h, proc.max_patch_w)
    grid_sizes = make_grid_sizes(batch, max_images=8, clip_grid=grid)

    noise = rng.standard_normal(batch.patches.shape).astype(np.float32) * 0.05
    noise = noise * (~np.asarray(batch.key_pad_mask))[..., None]
    rec = batch.patches + noise

    got = float(
        packed_pixel_loss(
            rec, batch.patches, batch, grid_sizes, grid, proc.patch_size, 3
        )
    )

    # reference-style eager computation (main.py:95-106): postprocess both
    # token sets, per-image MSE, mean over images
    rec_images = proc.postprocess(batch.replace(patches=rec))
    tgt_images = proc.postprocess(batch)
    want = float(
        np.mean([np.mean((r - t) ** 2) for r, t in zip(rec_images, tgt_images)])
    )
    np.testing.assert_allclose(got, want, rtol=1e-4)
    assert got > 0


def test_packed_pixel_loss_micro_slot_alignment():
    """Micro-batch mode (grad accumulation): per-half losses computed with
    GLOBAL row offsets + slot windows must recombine (image-count weighted)
    into exactly the full-batch loss — proving micro rows land on the right
    grid_sizes slots."""
    from dct_autoencoder_tpu.train.pixel_loss import (
        make_grid_sizes,
        packed_pixel_loss,
        row_image_layout,
    )

    rng = np.random.default_rng(5)
    proc, ims, batch = make_bucketed_batch(rng, n_images=4)
    b = batch.patches.shape[0]
    assert b % 2 == 0 and b >= 2
    grid = (proc.max_patch_h, proc.max_patch_w)
    gs = make_grid_sizes(batch, max_images=8, clip_grid=grid)

    noise = rng.standard_normal(batch.patches.shape).astype(np.float32) * 0.05
    noise = noise * (~np.asarray(batch.key_pad_mask))[..., None]
    rec = batch.patches + noise

    full = float(packed_pixel_loss(rec, batch.patches, batch, gs, grid, proc.patch_size, 3))

    offsets, n_per_row = jax.tree_util.tree_map(np.asarray, row_image_layout(batch))
    mb = b // 2
    halves = []
    for i in range(2):
        sl = lambda x: x[i * mb : (i + 1) * mb]
        micro = jax.tree_util.tree_map(sl, batch)
        start = offsets[i * mb]
        count = n_per_row[i * mb : (i + 1) * mb].sum()
        slots = np.arange(8)
        slot_valid = jnp.asarray((slots >= start) & (slots < start + count))
        loss_i = float(
            packed_pixel_loss(
                sl(rec), sl(np.asarray(batch.patches)), micro, gs, grid,
                proc.patch_size, 3,
                row_offsets=jnp.asarray(offsets[i * mb : (i + 1) * mb]),
                slot_valid=slot_valid,
            )
        )
        halves.append((loss_i, int(count)))

    want = sum(l * n for l, n in halves) / sum(n for _, n in halves)
    np.testing.assert_allclose(full, want, rtol=1e-5)
    assert halves[0][0] != halves[1][0]  # distinct image content per half


def test_packed_pixel_loss_masks_overflow_images():
    from dct_autoencoder_tpu.train.pixel_loss import (
        make_grid_sizes,
        packed_pixel_loss,
    )

    rng = np.random.default_rng(4)
    proc, ims, batch = make_bucketed_batch(rng, n_images=4)
    grid = (proc.max_patch_h, proc.max_patch_w)
    rec = batch.patches + 0.1

    # max_images=2 < 4 packed images: overflow images must be dropped, not
    # corrupt the canvases of kept slots
    gs2 = make_grid_sizes(batch, max_images=2, clip_grid=grid)
    gs8 = make_grid_sizes(batch, max_images=8, clip_grid=grid)
    l2 = float(packed_pixel_loss(rec, batch.patches, batch, gs2, grid, proc.patch_size, 3))
    l8 = float(packed_pixel_loss(rec, batch.patches, batch, gs8, grid, proc.patch_size, 3))
    assert np.isfinite(l2) and np.isfinite(l8)
    # same perturbation everywhere -> per-image MSEs comparable magnitudes
    assert 0.2 < l2 / l8 < 5.0
