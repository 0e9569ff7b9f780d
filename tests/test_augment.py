"""Host-side augmentation (data/augment.py): shape preservation, determinism,
and composition with the raw-image training stream.

The reference has no augmentation lever (reference dataset.py:35-89 only
resizes); these tests pin the properties the training A/B relies on."""
import numpy as np

from dct_autoencoder_tpu.data.augment import (
    AugmentConfig,
    Augmenter,
    color_jitter,
    random_resized_crop,
)


def make_image(h=64, w=48, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, size=(3, h, w)).astype(np.float32)


def test_augment_preserves_shape_dtype_range():
    im = make_image()
    aug = Augmenter(AugmentConfig(color_jitter=0.3), seed=1)
    for _ in range(8):
        out = aug(im)
        assert out.shape == im.shape
        assert out.dtype == np.float32
        assert out.min() >= 0.0 and out.max() <= 1.0


def test_augment_deterministic_given_seed():
    im = make_image()
    a = Augmenter(AugmentConfig(color_jitter=0.2), seed=7)
    b = Augmenter(AugmentConfig(color_jitter=0.2), seed=7)
    outs_a = [a(im) for _ in range(4)]
    outs_b = [b(im) for _ in range(4)]
    for x, y in zip(outs_a, outs_b):
        np.testing.assert_array_equal(x, y)
    # a different seed draws a different stream
    c = Augmenter(AugmentConfig(color_jitter=0.2), seed=8)
    assert any(not np.array_equal(c(im), x) for x in outs_a)


def test_identity_config_is_identity():
    im = make_image()
    aug = Augmenter(AugmentConfig(scale=(1.0, 1.0), ratio=(1.0, 1.0), hflip=0.0), seed=0)
    np.testing.assert_array_equal(aug(im), im)


def test_hflip_is_exact():
    im = make_image()
    aug = Augmenter(
        AugmentConfig(scale=(1.0, 1.0), ratio=(1.0, 1.0), hflip=1.0), seed=0
    )
    np.testing.assert_array_equal(aug(im), im[:, :, ::-1])


def test_random_resized_crop_shape_and_variation():
    im = make_image(96, 96)
    rng = np.random.default_rng(3)
    cfg = AugmentConfig(scale=(0.3, 0.9))
    outs = [random_resized_crop(im, rng, cfg) for _ in range(4)]
    for o in outs:
        assert o.shape == im.shape
    # draws differ from each other and from the input
    assert not np.array_equal(outs[0], outs[1])
    assert not np.array_equal(outs[0], im)


def test_color_jitter_zero_is_noop_shape_safe():
    im = make_image()
    rng = np.random.default_rng(0)
    out = color_jitter(im, rng, 0.0)
    np.testing.assert_allclose(out, im, atol=1e-6)


def test_stream_integration_shapes_stable(tmp_path):
    """augment in load_and_transform_dataset: token shapes unchanged (no new
    compiles), patch values differ between augmented and clean streams."""
    from dct_autoencoder_tpu.data.dataset import load_and_transform_dataset
    from dct_autoencoder_tpu.patches.extractor import DCTAutoencoderFeatureExtractor
    from tests.test_data import make_image_shard

    make_image_shard(tmp_path, n=4, size=96)
    proc = DCTAutoencoderFeatureExtractor(
        channels=3, patch_size=8, sample_patches_beta=0.0,
        max_patch_h=12, max_patch_w=12, max_seq_len=12 * 12 * 3,
    )
    url = str(tmp_path / "*.tar")
    clean = list(load_and_transform_dataset(url, proc))
    auged = list(
        load_and_transform_dataset(url, proc, augment=Augmenter(seed=5))
    )
    assert len(clean) == len(auged) == 4
    for c, a in zip(clean, auged):
        assert a["patches"].shape == c["patches"].shape
        assert a["original_sizes"] == c["original_sizes"]
    assert any(
        not np.allclose(np.asarray(c["patches"]), np.asarray(a["patches"]))
        for c, a in zip(clean, auged)
    )


def test_cli_augment_flag_trains(tmp_path, monkeypatch):
    """--augment true end-to-end through the CLI on a tiny run."""
    from dct_autoencoder_tpu.train import cli
    from tests.test_data import make_image_shard
    from tests.test_model import tiny_config

    make_image_shard(tmp_path / "raw", n=4, size=96)
    cfg = tiny_config("lfq")
    cfg_path = tmp_path / "cfg.json"
    cfg.to_json_file(str(cfg_path))
    monkeypatch.chdir(tmp_path)
    cli.main(
        image_dataset_path_or_url=str(tmp_path / "raw" / "*.tar"),
        model_config_path=str(cfg_path),
        dtype="float32",
        batch_size=2,
        train_norm_iters=1,
        max_iters=2,
        sample_patches_beta=0.0,
        learning_rate=1e-4,
        log_every=1,
        save_every=100,
        should_save=False,
        augment=True,
        augment_color_jitter=0.2,
    )
