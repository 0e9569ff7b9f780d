"""Convert a reference (PyTorch) DCTAutoencoder checkpoint to this framework.

Maps the reference model's state_dict (reference:
dct_autoencoder/modeling_dct_autoencoder.py:19-88 — HF CLIPEncoder stacks,
factorized pos embeds, Linear+LN patch embed, LFQ projections, patchnorm
buffers) onto our flax parameter tree.  Linear weights transpose
(torch (out, in) -> flax (in, out)); LayerNorm weight/bias -> scale/bias.

This is both the migration path for users with trained reference checkpoints
and the harness behind the token-bit-exactness parity test: identical weights
must produce identical LFQ token streams.

Usage (with a reference checkpoint directory):
  python -m dct_autoencoder_tpu.tools.convert_reference_weights \
      --reference_model_path /path/to/ref_ckpt --output_path out/converted
"""
from __future__ import annotations

import argparse
from typing import Any, Dict

import numpy as np

from ..models.autoencoder import DCTAutoencoder
from ..models.config import DCTAutoencoderConfig, TransformerConfig
from ..models.patchnorm import PatchNormState


def _t(w) -> np.ndarray:
    return np.asarray(w.detach().cpu(), dtype=np.float32).T


def _v(w) -> np.ndarray:
    return np.asarray(w.detach().cpu(), dtype=np.float32)


def convert_state_dict(ref_model, config: DCTAutoencoderConfig) -> Dict[str, Any]:
    """Reference torch module -> (flax params dict, PatchNormState)."""
    params: Dict[str, Any] = {}

    # factorized pos embeds (reference modeling...py:41-59)
    for side in ("encoder", "decoder"):
        for axis in ("channel", "height", "width"):
            params[f"{side}_pos_embed_{axis}"] = _v(
                getattr(ref_model, f"{side}_pos_embed_{axis}")
            )

    # patch embed: Sequential(Linear(no bias), LayerNorm) (reference :61-64)
    params["patch_embed_linear"] = {"kernel": _t(ref_model.to_patch_embedding[0].weight)}
    params["patch_embed_norm"] = {
        "scale": _v(ref_model.to_patch_embedding[1].weight),
        "bias": _v(ref_model.to_patch_embedding[1].bias),
    }

    # transformer stacks (HF CLIPEncoder layers)
    def stack(src) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for i, layer in enumerate(src.layers):
            a = layer.self_attn
            out[f"layers_{i}"] = {
                "self_attn": {
                    "q_proj": {"kernel": _t(a.q_proj.weight), "bias": _v(a.q_proj.bias)},
                    "k_proj": {"kernel": _t(a.k_proj.weight), "bias": _v(a.k_proj.bias)},
                    "v_proj": {"kernel": _t(a.v_proj.weight), "bias": _v(a.v_proj.bias)},
                    "out_proj": {
                        "kernel": _t(a.out_proj.weight),
                        "bias": _v(a.out_proj.bias),
                    },
                },
                "layer_norm1": {
                    "scale": _v(layer.layer_norm1.weight),
                    "bias": _v(layer.layer_norm1.bias),
                },
                "layer_norm2": {
                    "scale": _v(layer.layer_norm2.weight),
                    "bias": _v(layer.layer_norm2.bias),
                },
                "fc1": {"kernel": _t(layer.mlp.fc1.weight), "bias": _v(layer.mlp.fc1.bias)},
                "fc2": {"kernel": _t(layer.mlp.fc2.weight), "bias": _v(layer.mlp.fc2.bias)},
            }
        return out

    params["encoder"] = stack(ref_model.encoder)
    params["decoder"] = stack(ref_model.decoder)

    # LFQ projections (reference lfq.py:61-62)
    if config.vq_type == "lfq":
        vq: Dict[str, Any] = {}
        if hasattr(ref_model.vq_model.project_in, "weight"):
            vq["project_in"] = {
                "kernel": _t(ref_model.vq_model.project_in.weight),
                "bias": _v(ref_model.vq_model.project_in.bias),
            }
            vq["project_out"] = {
                "kernel": _t(ref_model.vq_model.project_out.weight),
                "bias": _v(ref_model.vq_model.project_out.bias),
            }
        params["vq_model"] = vq

    # proj_out: Sequential(LayerNorm, Linear(no bias)) (reference :85-88)
    params["proj_out_norm"] = {
        "scale": _v(ref_model.proj_out[0].weight),
        "bias": _v(ref_model.proj_out[0].bias),
    }
    params["proj_out_linear"] = {"kernel": _t(ref_model.proj_out[1].weight)}

    return params


def convert_patchnorm(ref_model) -> PatchNormState:
    import jax.numpy as jnp

    pn = ref_model.patchnorm
    return PatchNormState(
        n=jnp.asarray(_v(pn.n)),
        median=jnp.asarray(_v(pn.median)),
        b=jnp.asarray(_v(pn.b)),
    )


def config_from_reference(ref_config) -> DCTAutoencoderConfig:
    """Reference HF config object -> our config (same field names)."""

    def tc(c) -> TransformerConfig:
        return TransformerConfig(
            hidden_size=c.hidden_size,
            intermediate_size=c.intermediate_size,
            num_hidden_layers=c.num_hidden_layers,
            num_attention_heads=c.num_attention_heads,
            layer_norm_eps=getattr(c, "layer_norm_eps", 1e-5),
            hidden_act=getattr(c, "hidden_act", "quick_gelu"),
        )

    return DCTAutoencoderConfig(
        image_channels=ref_config.image_channels,
        patch_size=ref_config.patch_size,
        max_patch_h=ref_config.max_patch_h,
        max_patch_w=ref_config.max_patch_w,
        vq_codebook_size=ref_config.vq_codebook_size,
        vq_num_codebooks=ref_config.vq_num_codebooks,
        vq_type=ref_config.vq_type,
        encoder_config=tc(ref_config.encoder_config),
        decoder_config=tc(ref_config.decoder_config),
        # replicate the reference's effective attention semantics exactly
        attn_mask_mode="bias",
    )


def convert(ref_model) -> DCTAutoencoder:
    """Reference torch model instance -> ready-to-use DCTAutoencoder."""
    config = config_from_reference(ref_model.config)
    model = DCTAutoencoder(config)
    import jax

    converted = convert_state_dict(ref_model, config)

    # verify the trees line up, then install
    flat_ours = jax.tree_util.tree_flatten_with_path(model.params)[0]
    flat_new = jax.tree_util.tree_flatten_with_path(converted)[0]
    ours_keys = {model._path_str(p): v.shape for p, v in flat_ours}
    new_keys = {model._path_str(p): np.asarray(v).shape for p, v in flat_new}
    missing = set(ours_keys) - set(new_keys)
    extra = set(new_keys) - set(ours_keys)
    assert not missing, f"unconverted params: {sorted(missing)}"
    assert not extra, f"unexpected params: {sorted(extra)}"
    for k in ours_keys:
        assert ours_keys[k] == new_keys[k], f"{k}: {ours_keys[k]} vs {new_keys[k]}"

    import jax.numpy as jnp

    model.params = jax.tree_util.tree_map(jnp.asarray, converted)
    model.patchnorm = convert_patchnorm(ref_model)
    return model


def main(reference_model_path: str, output_path: str, reference_dir: str = "/root/reference"):
    import sys

    from .parity_vs_reference import _install_import_stubs, _install_torch_dct_shim

    _install_torch_dct_shim()
    _install_import_stubs()
    if reference_dir not in sys.path:
        sys.path.insert(0, reference_dir)
    from dct_autoencoder.modeling_dct_autoencoder import DCTAutoencoder as RefModel

    ref = RefModel.from_pretrained(reference_model_path)
    model = convert(ref)
    model.save_pretrained(output_path)
    print("converted checkpoint saved to", output_path)


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--reference_model_path", required=True)
    p.add_argument("--output_path", required=True)
    p.add_argument("--reference_dir", default="/root/reference")
    main(**vars(p.parse_args()))
