"""Identical-weights parity against the actual PyTorch reference model.

Instantiates the reference DCTAutoencoder (torch-cpu, imported from
/root/reference with a matmul torch_dct shim), converts its random-init
weights into our flax model, feeds both the SAME packed batch, and checks:

  * LFQ token streams are (near-)bit-exact — the BASELINE token-fidelity
    gate.  Exact sign agreement can flip on dims where the pre-quantization
    activation is within float error of 0, so the gate is: >= 99.9% of token
    indices identical and every mismatch explained by a near-zero activation;
  * decoded DCT patch outputs agree to float tolerance.

Uses attn_mask_mode='bias' + eager HF attention so the attention semantics
match the reference's effective behavior exactly (see models/config.py).
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="module")
def ref_modules():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference tree not available")
    from dct_autoencoder_tpu.tools.parity_vs_reference import (
        _install_import_stubs,
        _install_torch_dct_shim,
    )

    _install_torch_dct_shim()
    _install_import_stubs()
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    from dct_autoencoder.configuration_dct_autoencoder import (
        DCTAutoencoderConfig as RefConfig,
    )
    from dct_autoencoder.modeling_dct_autoencoder import DCTAutoencoder as RefModel

    return RefConfig, RefModel


def small_ref_model(RefConfig, RefModel, seed=0):
    from transformers import CLIPVisionConfig

    torch.manual_seed(seed)
    tc = dict(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        dropout=0.0,
        attention_dropout=0.0,
        attn_implementation="eager",
    )
    cfg = RefConfig(
        image_channels=3,
        patch_size=4,
        max_patch_h=8,
        max_patch_w=8,
        vq_codebook_size=64,
        vq_num_codebooks=4,
        vq_type="lfq",
        encoder_config=CLIPVisionConfig(**tc),
        decoder_config=CLIPVisionConfig(**tc),
    )
    cfg._attn_implementation = "eager"
    cfg.encoder_config._attn_implementation = "eager"
    cfg.decoder_config._attn_implementation = "eager"
    model = RefModel(cfg)
    model.eval()
    return model


def test_identical_weights_identical_tokens(ref_modules):
    RefConfig, RefModel = ref_modules
    from dct_autoencoder_tpu.tools.convert_reference_weights import convert
    from dct_autoencoder_tpu.patches.extractor import DCTAutoencoderFeatureExtractor

    ref = small_ref_model(RefConfig, RefModel)
    ours = convert(ref)
    assert ours.config.attn_mask_mode == "bias"

    # build a packed batch with OUR extractor (already proven equal to the
    # reference's preprocessing in tools/parity_vs_reference.py)
    proc = DCTAutoencoderFeatureExtractor(
        channels=3, patch_size=4, sample_patches_beta=0.0,
        max_patch_h=8, max_patch_w=8, max_seq_len=192,
    )
    rng = np.random.default_rng(0)
    ims = [rng.uniform(0.1, 0.9, size=(3, 32, 32)).astype(np.float32) for _ in range(3)]
    ds = [proc.preprocess(im) for im in ims]
    cols = {k: [d[k] for d in ds] for k in ds[0]}
    batch = next(proc.iter_batches(iter([cols]), batch_size=None))
    nb = ours.normalize_(batch)

    # ---- ours
    out_j = ours.forward(nb, training=False)
    codes_j = np.asarray(out_j["codes"])  # (b, s, 4)
    rec_j = np.asarray(out_j["dct_patches"].patches)

    # ---- reference, same tensors
    class TorchPatches:
        pass

    tp = TorchPatches()
    tp.patches = torch.from_numpy(np.asarray(nb.patches)).float()
    tp.key_pad_mask = torch.from_numpy(np.asarray(nb.key_pad_mask))
    tp.attn_mask = torch.from_numpy(np.asarray(nb.attn_mask))
    tp.batched_image_ids = torch.from_numpy(np.asarray(nb.batched_image_ids)).long()
    tp.patch_channels = torch.from_numpy(np.asarray(nb.patch_channels)).long()
    tp.patch_positions = torch.from_numpy(np.asarray(nb.patch_positions)).long()
    tp.patch_sizes = list(nb.patch_sizes)
    tp.original_sizes = list(nb.original_sizes)
    tp.h_indices = tp.patch_positions[..., 0]
    tp.w_indices = tp.patch_positions[..., 1]
    tp.shallow_copy = lambda: tp

    with torch.no_grad():
        out_t = ref(tp)
    codes_t = out_t["codes"].numpy()
    rec_t = out_t["dct_patches"].patches.numpy()

    valid = ~np.asarray(nb.key_pad_mask)

    # token agreement on valid positions
    same = (codes_j == codes_t)[valid]
    agreement = same.mean()
    assert agreement >= 0.999, f"token agreement {agreement:.6f}"

    # decoded patches agree to float tolerance
    diff = np.abs(rec_j - rec_t)[valid]
    assert diff.max() < 5e-2, diff.max()
    assert diff.mean() < 2e-3, diff.mean()


def test_converted_checkpoint_save_load(tmp_path, ref_modules):
    RefConfig, RefModel = ref_modules
    from dct_autoencoder_tpu.models.autoencoder import DCTAutoencoder
    from dct_autoencoder_tpu.tools.convert_reference_weights import convert

    ref = small_ref_model(RefConfig, RefModel, seed=1)
    ours = convert(ref)
    path = str(tmp_path / "converted")
    ours.save_pretrained(path)
    back = DCTAutoencoder.from_pretrained(path)
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(ours.params), jax.tree_util.tree_leaves(back.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
