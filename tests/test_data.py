"""Data layer tests: shard IO roundtrip, streaming pipelines, preproc CLI."""
import os
import tarfile
import io

import numpy as np
import pytest

from dct_autoencoder_tpu.data.dataset import (
    batched,
    dict_collate,
    load_and_transform_dataset,
    load_preprocessed_dataset,
    tuple_collate,
)
from dct_autoencoder_tpu.data.shards import (
    ShardWriter,
    WebDatasetReader,
    expand_urls,
)
from dct_autoencoder_tpu.patches.extractor import DCTAutoencoderFeatureExtractor


def test_expand_urls_brace():
    got = expand_urls("shard-{000000..000002}.tar")
    assert got == ["shard-000000.tar", "shard-000001.tar", "shard-000002.tar"]


def test_shard_write_read_roundtrip(tmp_path):
    pattern = str(tmp_path / "%06d.tar")
    rng = np.random.default_rng(0)
    samples = []
    with ShardWriter(pattern, maxsize=1e9) as w:
        for i in range(5):
            arr = rng.standard_normal((4, 3)).astype(np.float32)
            samples.append(arr)
            w.write(
                {
                    "__key__": f"{i:08d}",
                    "patches.npy": arr,
                    "meta.json": {"i": i},
                    "size.pyd": (i, i + 1),
                }
            )

    reader = WebDatasetReader(str(tmp_path))
    got = list(reader)
    assert len(got) == 5
    for i, s in enumerate(got):
        np.testing.assert_allclose(s["patches.npy"], samples[i])
        assert s["meta.json"]["i"] == i
        assert s["size.pyd"] == (i, i + 1)


def test_shard_writer_rolls_and_compresses(tmp_path):
    pattern = str(tmp_path / "%06d.tar")
    with ShardWriter(pattern, maxsize=1000, compress=True) as w:
        for i in range(10):
            w.write({"__key__": f"{i:08d}", "x.npy": np.zeros(200, dtype=np.float32)})
    shards = sorted(os.listdir(tmp_path))
    assert len(shards) > 1  # rolled
    got = list(WebDatasetReader(str(tmp_path / "*.tar")))
    assert len(got) == 10


def test_reader_skips_corrupt_shard(tmp_path):
    # one good shard + one garbage file
    with ShardWriter(str(tmp_path / "good-%06d.tar")) as w:
        w.write({"__key__": "0", "x.json": {"ok": True}})
    with open(tmp_path / "bad-000000.tar", "wb") as f:
        f.write(b"this is not a tar file at all........")
    got = list(WebDatasetReader(str(tmp_path / "*.tar")))
    assert len(got) == 1 and got[0]["x.json"]["ok"]


def test_collates():
    rows = [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]
    assert dict_collate(rows) == {"a": [1, 2], "b": ["x", "y"]}
    assert tuple_collate([(1, "x"), (2, "y")]) == [[1, 2], ["x", "y"]]
    bs = list(batched(iter(rows), 1))
    assert len(bs) == 2 and bs[0] == {"a": [1], "b": ["x"]}


def make_image_shard(tmp_path, n=6, size=96):
    """Write a shard of jpg+json samples."""
    from PIL import Image

    rng = np.random.default_rng(0)
    with ShardWriter(str(tmp_path / "raw-%06d.tar")) as w:
        for i in range(n):
            arr = (rng.uniform(0, 1, size=(size, size, 3)) * 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            w.write(
                {
                    "__key__": f"{i:08d}",
                    "jpg": buf.getvalue(),
                    "json": {"height": size, "width": size},
                    "txt": f"caption {i}",
                }
            )


def test_load_and_transform_dataset(tmp_path):
    make_image_shard(tmp_path, n=4, size=96)
    proc = DCTAutoencoderFeatureExtractor(
        channels=3, patch_size=8, sample_patches_beta=0.0,
        max_patch_h=12, max_patch_w=12, max_seq_len=12 * 12 * 3,
    )
    got = list(load_and_transform_dataset(str(tmp_path / "*.tar"), proc))
    assert len(got) == 4
    for d in got:
        assert d["patches"].shape[1] == 64
        assert d["original_sizes"] == (96, 96)
        assert d["txt"].startswith("caption")


def test_resolution_filter(tmp_path):
    make_image_shard(tmp_path, n=2, size=48)  # below 12*8=96 min res
    proc = DCTAutoencoderFeatureExtractor(
        channels=3, patch_size=8, sample_patches_beta=0.0,
        max_patch_h=12, max_patch_w=12, max_seq_len=432,
    )
    got = list(load_and_transform_dataset(str(tmp_path / "*.tar"), proc))
    assert got == []


def test_preproc_cli_and_preprocessed_loading(tmp_path):
    make_image_shard(tmp_path / "raw", n=4, size=96)
    from dct_autoencoder_tpu.tools.preproc_dataset import main as preproc_main

    cfg_path = os.path.join(os.path.dirname(__file__), "..", "conf", "patch14-l.json")
    # patch14-l has patch 14; min res = 14*12=168 > 96, so use a local config
    import json

    cfg = json.load(open(cfg_path))
    cfg["patch_size"] = 8
    cfg["max_patch_h"] = cfg["max_patch_w"] = 12
    small_cfg = tmp_path / "cfg.json"
    small_cfg.write_text(json.dumps(cfg))

    n = preproc_main(
        image_dataset_path_or_url=str(tmp_path / "raw" / "*.tar"),
        output_dir=str(tmp_path / "pre"),
        model_config_path=str(small_cfg),
        sample_patches_beta=0.0,
        n=100,
        compress=True,
    )
    assert n == 4
    got = list(load_preprocessed_dataset(str(tmp_path / "pre")))
    assert len(got) == 4
    for d in got:
        assert d["patches"].shape[1] == 64
        assert d["patch_sizes"] == (12, 12)


def test_multihost_shard_ownership(tmp_path):
    for i in range(4):
        with ShardWriter(str(tmp_path / f"s{i}-%06d.tar")) as w:
            w.write({"__key__": "0", "x.json": {"shard": i}})
    all_ids = []
    for pi in range(2):
        r = WebDatasetReader(str(tmp_path / "*.tar"), process_index=pi, process_count=2)
        all_ids.append({s["x.json"]["shard"] for s in r})
    assert all_ids[0] | all_ids[1] == {0, 1, 2, 3}
    assert all_ids[0] & all_ids[1] == set()


def test_size_buckets_and_batched_preprocess(tmp_path):
    from dct_autoencoder_tpu.data.dataset import default_size_buckets, resize_to_bucket

    buckets = default_size_buckets(max_size=512, min_size=256, step=128)
    assert all(0.5 <= h / w <= 2.0 for h, w in buckets)

    rng = np.random.default_rng(0)
    im = rng.uniform(0, 1, size=(3, 300, 500)).astype(np.float32)
    out = resize_to_bucket(im, buckets)
    assert (out.shape[1], out.shape[2]) in buckets

    # batched streaming path: mixed sizes land in buckets, bounded shapes
    make_image_shard(tmp_path, n=6, size=200)
    proc = DCTAutoencoderFeatureExtractor(
        channels=3, patch_size=8, sample_patches_beta=0.0,
        max_patch_h=64, max_patch_w=64, max_seq_len=64 * 64 * 3,
    )
    got = list(
        load_and_transform_dataset(
            str(tmp_path / "*.tar"), proc, size_buckets=buckets, preprocess_batch_size=4,
            min_res_factor=12,
        )
    )
    assert len(got) == 6
    for d in got:
        assert d["original_sizes"] in buckets


def test_preprocess_many_matches_single():
    rng = np.random.default_rng(1)
    proc = DCTAutoencoderFeatureExtractor(
        channels=3, patch_size=8, sample_patches_beta=0.0,
        max_patch_h=8, max_patch_w=8, max_seq_len=192,
    )
    ims = [rng.uniform(0, 1, size=(3, 64, 64)).astype(np.float32) for _ in range(3)]
    ims.append(rng.uniform(0, 1, size=(3, 32, 48)).astype(np.float32))  # second shape
    many = proc.preprocess_many(ims)
    for im, d_many in zip(ims, many):
        d_one = proc.preprocess(im)
        np.testing.assert_allclose(d_many["patches"], d_one["patches"], atol=1e-5)
        np.testing.assert_array_equal(d_many["positions"], d_one["positions"])
        np.testing.assert_array_equal(d_many["channels"], d_one["channels"])
        assert d_many["patch_sizes"] == d_one["patch_sizes"]
