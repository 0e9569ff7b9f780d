"""Tools tests: testpipe parity, progressive decode, AR token dump, CLI train."""
import io
import json
import os

import numpy as np
import pytest


def make_images_dir(tmp_path, n=3, size=64):
    from PIL import Image

    rng = np.random.default_rng(0)
    d = tmp_path / "images"
    d.mkdir()
    for i in range(n):
        arr = (rng.uniform(0, 1, size=(size, size, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"im{i}.png")
    return d


def test_testpipe_tool(tmp_path, capsys):
    from dct_autoencoder_tpu.tools.testpipe import main

    imdir = make_images_dir(tmp_path)
    out = tmp_path / "junk.png"
    main(
        image_dir=str(imdir),
        patch_size=8,
        max_patch_h=8,
        max_patch_w=8,
        max_seq_len=128,
        sample_patches_beta=0.005,
        out_file=str(out),
    )
    assert out.exists()
    captured = capsys.readouterr().out
    assert "number of patches for image 0" in captured
    assert "std" in captured


def test_decode_gif_tool(tmp_path, monkeypatch):
    from dct_autoencoder_tpu.tools import decode_gif
    from dct_autoencoder_tpu.models.factory import get_model_and_processor as real_factory

    from test_model import tiny_config

    def fake_factory(config, dtype=None, sample_patches_beta=0.0, resume_path=None, **kw):
        return real_factory(tiny_config("lfq"), sample_patches_beta=sample_patches_beta)

    monkeypatch.setattr(decode_gif, "get_model_and_processor", fake_factory)

    imdir = make_images_dir(tmp_path, n=1, size=48)
    out = tmp_path / "prog.gif"
    decode_gif.main(
        image=str(imdir / "im0.png"),
        model_load_path=None,
        out_file=str(out),
        n_frames=4,
        max_side=48,
    )
    assert out.exists()
    from PIL import Image

    g = Image.open(out)
    assert getattr(g, "n_frames", 1) == 4


def test_prepare_autoregressive_dataset(tmp_path, monkeypatch):
    from dct_autoencoder_tpu.data.shards import ShardWriter, WebDatasetReader
    from dct_autoencoder_tpu.tools import prepare_autoregressive_dataset as ar
    from dct_autoencoder_tpu.models.factory import get_model_and_processor as real_factory

    from PIL import Image

    from test_model import tiny_config

    # raw shard with captions
    rng = np.random.default_rng(0)
    raw = tmp_path / "raw"
    with ShardWriter(str(raw / "r-%06d.tar")) as w:
        for i in range(4):
            arr = (rng.uniform(0, 1, size=(64, 64, 3)) * 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            w.write(
                {
                    "__key__": f"{i:08d}",
                    "jpg": buf.getvalue(),
                    "json": {"height": 64, "width": 64},
                    "txt": f"caption {i}",
                }
            )

    def fake_factory(config, dtype=None, sample_patches_beta=0.0, resume_path=None, **kw):
        return real_factory(tiny_config("lfq"), sample_patches_beta=sample_patches_beta)

    monkeypatch.setattr(ar, "get_model_and_processor", fake_factory)

    n = ar.main(
        image_dataset_path_or_url=str(raw / "*.tar"),
        output_dir=str(tmp_path / "tok"),
        model_load_path=None,
        sample_patches_beta=0.0,
        batch_size=2,
        n=100,
    )
    assert n == 4
    records = list(WebDatasetReader(str(tmp_path / "tok")))
    assert len(records) == 4
    rec = records[0]["json"]
    assert rec["caption"].startswith("caption")
    emb = rec["image_embedding"]
    assert set(emb.keys()) == {"size", "original_size", "codes"}
    assert all(set(c.keys()) == {"c", "h", "w", "data"} for c in emb["codes"])
    # serde roundtrip through from_dict
    from dct_autoencoder_tpu.patches.container import from_dict

    dp, codes = from_dict(emb)
    assert codes.shape[1] == 4  # tiny config num_codebooks


def test_train_cli_smoke(tmp_path, monkeypatch):
    """One-step training run through the CLI path on a tiny config."""
    from dct_autoencoder_tpu.data.shards import ShardWriter
    from dct_autoencoder_tpu.train import cli
    from PIL import Image

    from test_model import tiny_config

    rng = np.random.default_rng(1)
    raw = tmp_path / "raw"
    with ShardWriter(str(raw / "r-%06d.tar")) as w:
        for i in range(8):
            arr = (rng.uniform(0, 1, size=(64, 64, 3)) * 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            w.write({"__key__": f"{i:08d}", "jpg": buf.getvalue(),
                     "json": {"height": 64, "width": 64}})

    cfg = tiny_config("lfq")
    cfg_path = tmp_path / "cfg.json"
    cfg.to_json_file(str(cfg_path))

    monkeypatch.chdir(tmp_path)
    model = cli.main(
        image_dataset_path_or_url=str(raw / "*.tar"),
        model_config_path=str(cfg_path),
        dtype="float32",
        batch_size=2,
        train_norm_iters=2,
        max_iters=2,
        sample_patches_beta=0.0,
        learning_rate=1e-4,
        log_every=1,
        save_every=100,
        should_save=True,
        out_base=str(tmp_path / "out"),
    )
    # checkpoint written
    outs = list((tmp_path / "out").iterdir())
    assert outs, "no output directory created"
    assert (outs[0] / "model" / "config.json").exists()
    assert (outs[0] / "metrics.jsonl").exists()
