"""End-to-end model tests: forward, encode/decode, codes roundtrip, save/load."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dct_autoencoder_tpu.models.config import DCTAutoencoderConfig, TransformerConfig
from dct_autoencoder_tpu.models.autoencoder import DCTAutoencoder
from dct_autoencoder_tpu.models.factory import (
    get_max_seq_length,
    get_model_and_processor,
    power_of_two,
)
from dct_autoencoder_tpu.patches.extractor import DCTAutoencoderFeatureExtractor


def tiny_config(vq_type="lfq"):
    tc = TransformerConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
    )
    return DCTAutoencoderConfig(
        image_channels=3,
        patch_size=4,
        max_patch_h=8,
        max_patch_w=8,
        vq_codebook_size=64,
        vq_num_codebooks=4,
        vq_type=vq_type,
        encoder_config=tc,
        decoder_config=tc,
    )


def make_batch(proc, rng, n_images=3, size=32):
    ims = [rng.uniform(0.1, 0.9, size=(3, size, size)).astype(np.float32) for _ in range(n_images)]
    ds = [proc.preprocess(im) for im in ims]
    cols = {k: [d[k] for d in ds] for k in ds[0]}
    return next(proc.iter_batches(iter([cols]), batch_size=None))


@pytest.mark.parametrize("vq_type", ["lfq", "vq"])
def test_forward_shapes(vq_type):
    cfg = tiny_config(vq_type)
    model, proc = get_model_and_processor(cfg, sample_patches_beta=0.0)
    rng = np.random.default_rng(0)
    batch = make_batch(proc, rng)
    batch = model.normalize_(batch)

    out = model.forward(batch, training=False)
    rec = out["dct_patches"]
    assert rec.patches.shape == batch.patches.shape
    codes = np.asarray(out["codes"])
    assert codes.shape == (batch.patches.shape[0], batch.patches.shape[1], 4)
    assert (codes >= 0).all() and (codes < 64).all()


def test_decode_from_codes_matches_decode():
    """Token fidelity: decode_from_codes(codes) must equal decode(encode(x))."""
    cfg = tiny_config("lfq")
    model, proc = get_model_and_processor(cfg, sample_patches_beta=0.0)
    rng = np.random.default_rng(1)
    batch = make_batch(proc, rng)
    batch = model.normalize_(batch)

    encoded, codes, _, _, _ = model.encode(batch, training=False)
    decoded = model.decode(encoded)

    decoded2 = model.decode_from_codes(
        codes,
        key_pad_mask=batch.key_pad_mask,
        attn_mask=batch.attn_mask,
        batched_image_ids=batch.batched_image_ids,
        patch_channels=batch.patch_channels,
        patch_positions=batch.patch_positions,
        patch_sizes=batch.patch_sizes,
        original_sizes=batch.original_sizes,
    )
    np.testing.assert_allclose(
        np.asarray(decoded.patches), np.asarray(decoded2.patches), atol=1e-4
    )


def test_pixel_roundtrip_smoke():
    """Full pipeline: image -> tokens -> model -> pixels, shapes + finite."""
    cfg = tiny_config("lfq")
    model, proc = get_model_and_processor(cfg, sample_patches_beta=0.0)
    rng = np.random.default_rng(2)
    batch = make_batch(proc, rng, n_images=2)
    nb = model.normalize_(batch)
    out = model.forward(nb, training=False)
    un = model.inv_normalize_(out["dct_patches"])
    images = proc.postprocess(un)
    assert len(images) == 2
    for im in images:
        assert np.isfinite(im).all()


def test_training_gradients_finite():
    cfg = tiny_config("lfq")
    model, proc = get_model_and_processor(cfg, sample_patches_beta=0.0)
    rng = np.random.default_rng(3)
    batch = make_batch(proc, rng)
    batch = model.normalize_(batch)

    def loss_fn(params):
        out = model.module.apply({"params": params}, batch, training=True)
        mask = ~batch.key_pad_mask
        rec = jnp.abs(out["dct_patches"].patches - batch.patches)
        rec = (rec * mask[..., None]).sum() / mask.sum()
        ent = model.entropy_loss(out["distances"], mask)
        return rec + 0.1 * out["commit_loss"] + 0.1 * ent

    loss, grads = jax.value_and_grad(loss_fn)(model.params)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert sum(float(jnp.abs(g).sum()) for g in flat) > 0.0


def test_save_load_roundtrip(tmp_path):
    cfg = tiny_config("lfq")
    model, proc = get_model_and_processor(cfg, sample_patches_beta=0.0)
    rng = np.random.default_rng(4)
    batch = make_batch(proc, rng)
    batch = model.normalize_(batch)
    out1 = model.forward(batch, training=False)

    path = os.path.join(tmp_path, "ckpt")
    model.save_pretrained(path)
    model2 = DCTAutoencoder.from_pretrained(path)
    out2 = model2.forward(batch, training=False)
    np.testing.assert_array_equal(np.asarray(out1["codes"]), np.asarray(out2["codes"]))
    np.testing.assert_allclose(
        np.asarray(out1["dct_patches"].patches),
        np.asarray(out2["dct_patches"].patches),
        atol=1e-5,
    )


def test_max_seq_length_formula():
    cfg = tiny_config()
    # reference factory.py:11-33 with max grid 8*8*3 = 192
    assert get_max_seq_length(cfg, 0.0) == 192
    assert get_max_seq_length(cfg, 0.02) == 192  # 150 -> pow2 256 -> capped 192
    assert get_max_seq_length(cfg, 0.05) == 64  # 60 -> pow2 64
    assert power_of_two(1) == 1
    assert power_of_two(3) == 4
    assert power_of_two(256) == 256


def test_attn_bias_parity_mode():
    """'bias' mode must reproduce the reference's +1-logit-bias behavior."""
    cfg = tiny_config()
    cfg.attn_mask_mode = "bias"
    model, proc = get_model_and_processor(cfg, sample_patches_beta=0.0)
    rng = np.random.default_rng(5)
    batch = make_batch(proc, rng)
    batch = model.normalize_(batch)
    out = model.forward(batch, training=False)
    assert np.isfinite(np.asarray(out["dct_patches"].patches)).all()


def test_pipeline_encode_decode_roundtrip(tmp_path):
    """High-level serving API: images -> token records -> images."""
    import jax.numpy as jnp

    from dct_autoencoder_tpu.pipeline import DCTPipeline

    cfg = tiny_config("lfq")
    pipe = DCTPipeline.from_config(cfg, sample_patches_beta=0.0, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    ims = [rng.uniform(0.1, 0.9, size=(3, 32, 32)).astype(np.float32) for _ in range(3)]

    records = pipe.encode(ims)
    assert len(records) == 3
    for rec in records:
        assert rec["original_size"] == (32, 32)
        assert all(len(c["data"]) == cfg.vq_num_codebooks for c in rec["codes"])

    recons = pipe.decode(records)
    assert len(recons) == 3
    for r, im in zip(recons, ims):
        assert r.shape == im.shape
        assert np.isfinite(r).all()

    # save/load keeps the pipeline bit-identical in code space
    path = str(tmp_path / "m")
    pipe.model.save_pretrained(path)
    pipe2 = DCTPipeline.from_pretrained(path, sample_patches_beta=0.0, dtype=jnp.float32)
    records2 = pipe2.encode(ims)
    for a, b in zip(records, records2):
        assert [c["data"] for c in a["codes"]] == [c["data"] for c in b["codes"]]


def test_vq_variants():
    """Separate-codebook-per-head, affine, orthogonal-reg VQ options."""
    from dct_autoencoder_tpu.models.vq import VectorQuantize

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 8, 32)).astype(np.float32))
    mask = jnp.ones((2, 8), dtype=bool)

    for kwargs in [
        dict(separate_codebook_per_head=True),
        dict(affine_param=True),
        dict(orthogonal_reg_weight=0.1),
        dict(use_cosine_sim=True, separate_codebook_per_head=True, affine_param=True),
    ]:
        vq = VectorQuantize(dim=32, codebook_size=16, heads=4, codebook_dim=8, **kwargs)
        params = vq.init(jax.random.PRNGKey(0), x, mask=mask)
        out, idx, loss, _ = vq.apply(params, x, mask=mask, training=True)
        assert out.shape == x.shape
        assert idx.shape == (2, 8, 4)
        assert np.isfinite(float(loss))
        # indices_to_codes consistency: eval-path quantized == decode(indices)
        out_e, idx_e, _, _ = vq.apply(params, x, mask=mask, training=False)
        dec = vq.apply(params, idx_e, method="indices_to_codes")
        np.testing.assert_allclose(np.asarray(out_e), np.asarray(dec), atol=1e-5)
        # gradients flow
        g = jax.grad(
            lambda p: vq.apply(p, x, mask=mask, training=True)[2]
            + jnp.sum(vq.apply(p, x, mask=mask, training=True)[0] ** 2)
        )(params)
        assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g))


def test_remat_matches_no_remat():
    """Gradient checkpointing changes memory, not values or gradients."""
    cfg = tiny_config("lfq")
    model, proc = get_model_and_processor(cfg, sample_patches_beta=0.0)
    rng = np.random.default_rng(10)
    batch = make_batch(proc, rng)
    batch = model.normalize_(batch)

    cfg_r = tiny_config("lfq")
    cfg_r.encoder_config.remat = True
    cfg_r.decoder_config.remat = True
    model_r = DCTAutoencoder(cfg_r)
    model_r.params = model.params
    model_r.patchnorm = model.patchnorm

    def loss(m, params):
        out = m.module.apply({"params": params}, batch, training=True)
        mask = ~batch.key_pad_mask
        return (
            (jnp.abs(out["dct_patches"].patches - batch.patches) * mask[..., None]).sum()
            / mask.sum()
        )

    l1, g1 = jax.value_and_grad(lambda p: loss(model, p))(model.params)
    l2, g2 = jax.value_and_grad(lambda p: loss(model_r, p))(model.params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_dropout_active_in_training():
    cfg = tiny_config("lfq")
    cfg.encoder_config.dropout = 0.5
    cfg.encoder_config.attention_dropout = 0.3
    model, proc = get_model_and_processor(cfg, sample_patches_beta=0.0)
    rng = np.random.default_rng(12)
    batch = make_batch(proc, rng)
    batch = model.normalize_(batch)

    out_eval = model.module.apply({"params": model.params}, batch, training=False)
    out_eval2 = model.module.apply({"params": model.params}, batch, training=False)
    np.testing.assert_array_equal(
        np.asarray(out_eval["codes"]), np.asarray(out_eval2["codes"])
    )

    # training mode with different dropout rngs -> different activations
    o1 = model.module.apply(
        {"params": model.params}, batch, training=True,
        rngs={"dropout": jax.random.PRNGKey(0)},
    )
    o2 = model.module.apply(
        {"params": model.params}, batch, training=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert not np.allclose(
        np.asarray(o1["dct_patches"].patches), np.asarray(o2["dct_patches"].patches)
    )


def test_pipeline_data_parallel_encode_matches_single():
    """Serving dp: DCTPipeline(data_parallel=True) over the 8-device virtual
    mesh emits identical token records to the single-device pipeline."""
    import jax.numpy as jnp

    from dct_autoencoder_tpu.pipeline import DCTPipeline

    cfg = tiny_config("lfq")
    pipe1 = DCTPipeline.from_config(cfg, sample_patches_beta=0.0, dtype=jnp.float32)
    pipe8 = DCTPipeline(pipe1.model, pipe1.processor, data_parallel=True)
    rng = np.random.default_rng(13)
    ims = [rng.uniform(0.1, 0.9, size=(3, 32, 32)).astype(np.float32) for _ in range(6)]

    r1 = pipe1.encode(ims)
    r8 = pipe8.encode(ims)
    assert len(r1) == len(r8) == 6
    for a, b in zip(r1, r8):
        assert [c["data"] for c in a["codes"]] == [c["data"] for c in b["codes"]]
