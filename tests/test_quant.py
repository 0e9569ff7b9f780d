"""int8 quantized serving path tests (models/quant.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from dct_autoencoder_tpu.models.factory import get_model_and_processor
from dct_autoencoder_tpu.models.patchnorm import calibrate_patchnorm_batch
from dct_autoencoder_tpu.models.quant import (
    Int8Dense,
    _quantize_weight,
    quantize_dense_params,
    quantize_model_for_serving,
)

from test_model import make_batch, tiny_config


def test_int8_dense_matches_fp_within_quant_error():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 16, 32)).astype(np.float32))
    w = rng.standard_normal((32, 64)).astype(np.float32) * 0.1
    b = rng.standard_normal((64,)).astype(np.float32) * 0.01

    want = x @ w + b

    q, scale = _quantize_weight(w)
    assert q.dtype == np.int8
    params = {"params": {"kernel_q": jnp.asarray(q), "kernel_scale": jnp.asarray(scale), "bias": jnp.asarray(b)}}
    for mode in ("weight_only", "dynamic"):
        got = Int8Dense(64, dtype=jnp.float32, mode=mode).apply(params, x)
        # relative error bounded by the quantization steps
        rel = np.abs(np.asarray(got) - np.asarray(want)).max() / np.abs(np.asarray(want)).max()
        assert rel < 0.03, (mode, rel)


def test_group_wise_weight_quant_tighter():
    """Group-wise scales reduce weight rounding error vs per-channel, and
    Int8Dense consumes the (groups, out) scale layout in both modes."""
    rng = np.random.default_rng(7)
    w = rng.standard_normal((32, 64)).astype(np.float32) * 0.1
    # one outlier row per column blows up the per-channel scale; groups localize it
    w[0] *= 20.0

    q_pc, s_pc = _quantize_weight(w)
    q_g, s_g = _quantize_weight(w, group_size=8)
    assert s_g.shape == (4, 64)
    deq_pc = q_pc.astype(np.float32) * s_pc
    deq_g = (q_g.reshape(4, 8, 64).astype(np.float32) * s_g[:, None, :]).reshape(32, 64)
    err_pc = np.abs(deq_pc - w).mean()
    err_g = np.abs(deq_g - w).mean()
    assert err_g < err_pc * 0.5, (err_g, err_pc)

    x = jnp.asarray(rng.standard_normal((4, 16, 32)).astype(np.float32))
    b = np.zeros(64, np.float32)
    want = np.asarray(x @ w)
    params = {"params": {"kernel_q": jnp.asarray(q_g), "kernel_scale": jnp.asarray(s_g), "bias": jnp.asarray(b)}}
    for mode in ("weight_only", "dynamic"):
        got = Int8Dense(64, dtype=jnp.float32, mode=mode, group_size=8).apply(params, x)
        rel = np.abs(np.asarray(got) - want).max() / np.abs(want).max()
        assert rel < 0.03, (mode, rel)


def test_quantized_model_group_size_end_to_end():
    """quantize_model_for_serving(group_size=...) builds a consistent module/
    param pair and token agreement does not regress vs per-channel scales."""
    cfg = tiny_config("lfq")
    model, proc = get_model_and_processor(cfg, sample_patches_beta=0.0)
    rng = np.random.default_rng(11)
    batch = make_batch(proc, rng, n_images=4)
    model.patchnorm, _ = calibrate_patchnorm_batch(model.patchnorm, batch)
    nb = model.normalize_(batch)
    valid = ~np.asarray(nb.key_pad_mask)
    codes_fp = np.asarray(model.forward(nb, training=False)["codes"])[valid]

    q_pc = quantize_model_for_serving(model, mode="dynamic")
    q_g = quantize_model_for_serving(model, mode="dynamic", group_size=32)
    sc = q_g.params["encoder"]["layers_0"]["self_attn"]["q_proj"]["kernel_scale"]
    assert np.asarray(sc).shape == (cfg.encoder_config.hidden_size // 32, cfg.encoder_config.hidden_size)
    agree_pc = (np.asarray(q_pc.forward(nb, training=False)["codes"])[valid] == codes_fp).mean()
    agree_g = (np.asarray(q_g.forward(nb, training=False)["codes"])[valid] == codes_fp).mean()
    assert agree_g >= agree_pc - 0.005, (agree_g, agree_pc)
    assert agree_g > 0.9


def test_quantize_dense_params_structure():
    w = np.random.default_rng(1).standard_normal((8, 4)).astype(np.float32)
    tree = {"layer": {"kernel": w, "bias": np.zeros(4, np.float32)}, "other": {"x": np.ones(3)}}
    q = quantize_dense_params(tree)
    assert set(q["layer"].keys()) == {"kernel_q", "kernel_scale", "bias"}
    assert np.asarray(q["layer"]["kernel_q"]).dtype == np.int8
    np.testing.assert_array_equal(np.asarray(q["other"]["x"]), tree["other"]["x"])


def test_quantized_model_serving_close_to_fp():
    """End-to-end: the int8 serving model reproduces the fp model's tokens on
    the overwhelming majority of positions and its reconstructions stay
    close."""
    cfg = tiny_config("lfq")
    model, proc = get_model_and_processor(cfg, sample_patches_beta=0.0)
    rng = np.random.default_rng(2)
    batch = make_batch(proc, rng, n_images=4)
    model.patchnorm, _ = calibrate_patchnorm_batch(model.patchnorm, batch)
    nb = model.normalize_(batch)

    out_fp = model.forward(nb, training=False)
    qmodel = quantize_model_for_serving(model)
    out_q = qmodel.forward(nb, training=False)

    valid = ~np.asarray(nb.key_pad_mask)
    codes_fp = np.asarray(out_fp["codes"])[valid]
    codes_q = np.asarray(out_q["codes"])[valid]
    agree = (codes_fp == codes_q).mean()
    assert agree > 0.9, f"token agreement {agree:.3f}"

    # a handful of flipped tokens legitimately move their outputs, so bound
    # the MEAN relative reconstruction drift, not the max
    rec_fp = np.asarray(out_fp["dct_patches"].patches)[valid]
    rec_q = np.asarray(out_q["dct_patches"].patches)[valid]
    rel = np.abs(rec_fp - rec_q).mean() / (np.abs(rec_fp).mean() + 1e-9)
    assert rel < 0.05, rel


def test_quantize_with_bf16_layers():
    """Per-layer bf16 fallback (the int8 sensitivity lever): layers listed in
    *_bf16_layers keep fp Dense params/behavior inside an otherwise-int8
    stack, and agreement with the fp model can only improve."""
    cfg = tiny_config("lfq")
    model, proc = get_model_and_processor(cfg, sample_patches_beta=0.0)
    rng = np.random.default_rng(5)
    batch = make_batch(proc, rng, n_images=4)
    model.patchnorm, _ = calibrate_patchnorm_batch(model.patchnorm, batch)
    nb = model.normalize_(batch)
    out_fp = model.forward(nb, training=False)
    valid = ~np.asarray(nb.key_pad_mask)
    codes_fp = np.asarray(out_fp["codes"])[valid]

    last = cfg.encoder_config.num_hidden_layers - 1
    qall = quantize_model_for_serving(model, mode="dynamic")
    qskip = quantize_model_for_serving(
        model, mode="dynamic", encoder_bf16_layers=(last,), decoder_bf16_layers=(last,)
    )
    # fp layers keep plain Dense params
    lp = qskip.params["encoder"][f"layers_{last}"]["self_attn"]["q_proj"]
    assert "kernel" in lp and "kernel_q" not in lp
    lq = qskip.params["encoder"]["layers_0"]["self_attn"]["q_proj"]
    assert "kernel_q" in lq

    agree_all = (np.asarray(qall.forward(nb, training=False)["codes"])[valid] == codes_fp).mean()
    agree_skip = (np.asarray(qskip.forward(nb, training=False)["codes"])[valid] == codes_fp).mean()
    assert agree_skip >= agree_all - 1e-6, (agree_skip, agree_all)
    assert agree_skip > 0.9


def test_int8_model_save_load_roundtrip(tmp_path):
    """quantize -> save_pretrained -> from_pretrained rebuilds Int8Dense and
    reproduces the quantized model's tokens exactly."""
    from dct_autoencoder_tpu.models.autoencoder import DCTAutoencoder

    cfg = tiny_config("lfq")
    model, proc = get_model_and_processor(cfg, sample_patches_beta=0.0)
    rng = np.random.default_rng(3)
    batch = make_batch(proc, rng, n_images=3)
    model.patchnorm, _ = calibrate_patchnorm_batch(model.patchnorm, batch)
    nb = model.normalize_(batch)

    qmodel = quantize_model_for_serving(model)
    out1 = qmodel.forward(nb, training=False)
    path = str(tmp_path / "q")
    qmodel.save_pretrained(path)

    loaded = DCTAutoencoder.from_pretrained(path)
    assert loaded.config.encoder_config.quantize_int8
    kq = loaded.params["encoder"]["layers_0"]["self_attn"]["q_proj"]["kernel_q"]
    assert np.asarray(kq).dtype == np.int8
    loaded.patchnorm = qmodel.patchnorm
    out2 = loaded.forward(nb, training=False)
    np.testing.assert_array_equal(np.asarray(out1["codes"]), np.asarray(out2["codes"]))


def test_int8_gate_records_and_pipeline_flips(tmp_path):
    """The --gate flow end-to-end: quantize_checkpoint measures agreement,
    records the verdict, and DCTPipeline.from_pretrained(prefer_int8='auto')
    flips to the int8 form only on a passing record."""
    import json
    import os

    from PIL import Image

    from dct_autoencoder_tpu.pipeline import DCTPipeline
    from dct_autoencoder_tpu.tools.quantize_checkpoint import main as quantize_main

    cfg = tiny_config("lfq")
    model, proc = get_model_and_processor(cfg, sample_patches_beta=0.0)
    rng = np.random.default_rng(5)
    batch = make_batch(proc, rng, n_images=3)
    model.patchnorm, _ = calibrate_patchnorm_batch(model.patchnorm, batch)
    src = str(tmp_path / "model")
    model.save_pretrained(src)

    img_dir = str(tmp_path / "imgs")
    os.makedirs(img_dir)
    for i in range(3):
        arr = (rng.uniform(0.1, 0.9, (64, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, f"{i}.png"))

    # threshold 0.0 always passes: the pointer flips serving to int8
    q8 = str(tmp_path / "model-int8")
    quantize_main(src, q8, validate_images=img_dir, gate=True, gate_threshold=0.0)
    rec = json.load(open(os.path.join(src, "int8_serving.json")))
    assert rec["pass"] and rec["mode"] == "dynamic" and rec["bf16_layers"] == [0, 1]
    assert 0.0 <= rec["agreement"] <= 1.0
    pipe = DCTPipeline.from_pretrained(src, dtype=np.float32)
    assert pipe.model.config.encoder_config.quantize_int8
    # explicit opt-out loads the fp form
    pipe_fp = DCTPipeline.from_pretrained(src, dtype=np.float32, prefer_int8="never")
    assert not pipe_fp.model.config.encoder_config.quantize_int8

    # threshold above 1.0 always fails: serving stays fp, 'always' errors
    quantize_main(src, q8, validate_images=img_dir, gate=True, gate_threshold=1.01)
    rec = json.load(open(os.path.join(src, "int8_serving.json")))
    assert not rec["pass"]
    pipe2 = DCTPipeline.from_pretrained(src, dtype=np.float32)
    assert not pipe2.model.config.encoder_config.quantize_int8
    import pytest

    with pytest.raises(FileNotFoundError):
        DCTPipeline.from_pretrained(src, dtype=np.float32, prefer_int8="always")


def test_int8_gate_relative_mode(tmp_path):
    """gate_mode='relative': the verdict compares the int8 flip rate to the
    checkpoint's own noise-equivalence floor and checks end-to-end PSNR
    parity (docs/int8_study_r3.md's criteria, made actionable)."""
    import json
    import os

    from PIL import Image

    from dct_autoencoder_tpu.pipeline import DCTPipeline
    from dct_autoencoder_tpu.tools.quantize_checkpoint import main as quantize_main

    cfg = tiny_config("lfq")
    model, proc = get_model_and_processor(cfg, sample_patches_beta=0.0)
    rng = np.random.default_rng(5)
    batch = make_batch(proc, rng, n_images=3)
    model.patchnorm, _ = calibrate_patchnorm_batch(model.patchnorm, batch)
    src = str(tmp_path / "model")
    model.save_pretrained(src)

    img_dir = str(tmp_path / "imgs")
    os.makedirs(img_dir)
    for i in range(3):
        arr = (rng.uniform(0.1, 0.9, (64, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, f"{i}.png"))

    # generous bounds -> PASS, record carries the full relative evidence;
    # gate_noise_seeds widens the floor estimate and is recorded verbatim
    q8 = str(tmp_path / "model-int8")
    quantize_main(src, q8, validate_images=img_dir, gate=True,
                  gate_mode="relative", flip_ratio_max=1e9, psnr_tolerance=1e9,
                  gate_noise_seeds=3)
    rec = json.load(open(os.path.join(src, "int8_serving.json")))
    assert rec["pass"] and rec["gate_mode"] == "relative"
    assert rec["noise_seeds"] == [1, 2, 3]
    for key in ("int8_flips_per_10k", "noise_floor_flips_per_10k",
                "flip_ratio", "psnr_fp", "psnr_int8", "psnr_delta"):
        assert key in rec, key
    assert rec["flip_ok"] and rec["psnr_ok"]
    pipe = DCTPipeline.from_pretrained(src, dtype=np.float32)
    assert pipe.model.config.encoder_config.quantize_int8

    # impossible psnr tolerance -> FAIL via the psnr criterion
    quantize_main(src, q8, validate_images=img_dir, gate=True,
                  gate_mode="relative", flip_ratio_max=1e9, psnr_tolerance=-100.0)
    rec = json.load(open(os.path.join(src, "int8_serving.json")))
    assert not rec["pass"] and rec["flip_ok"] and not rec["psnr_ok"]
    pipe2 = DCTPipeline.from_pretrained(src, dtype=np.float32)
    assert not pipe2.model.config.encoder_config.quantize_int8
