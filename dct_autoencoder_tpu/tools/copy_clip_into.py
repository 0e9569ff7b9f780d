"""CLIP-L vision weight transplant for warm-starting (reference: copy_clip_into_.py).

Copies `openai/clip-vit-large-patch14` vision transformer layers into the
encoder (layers 0..n-1) and decoder (layers n..2n-1) of a fresh model, mapping
HF torch tensors -> flax params (Dense kernels transposed).

Requires the `transformers` package with network access (or a local HF cache);
degrades with a clear message otherwise.

Usage:
  python -m dct_autoencoder_tpu.tools.copy_clip_into \
      --model_config_path conf/patch14-l.json --output_path out/warm_start
"""
from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

from ..models.autoencoder import DCTAutoencoder
from ..models.config import DCTAutoencoderConfig


def _copy_layer(dst_layer: dict, src_layer) -> None:
    """Copy one HF CLIPEncoderLayer's tensors into a flax EncoderLayer dict."""

    def t(x):
        return jnp.asarray(np.asarray(x.detach()).T)

    def v(x):
        return jnp.asarray(np.asarray(x.detach()))

    a = src_layer.self_attn
    dst_layer["self_attn"]["q_proj"]["kernel"] = t(a.q_proj.weight)
    dst_layer["self_attn"]["q_proj"]["bias"] = v(a.q_proj.bias)
    dst_layer["self_attn"]["k_proj"]["kernel"] = t(a.k_proj.weight)
    dst_layer["self_attn"]["k_proj"]["bias"] = v(a.k_proj.bias)
    dst_layer["self_attn"]["v_proj"]["kernel"] = t(a.v_proj.weight)
    dst_layer["self_attn"]["v_proj"]["bias"] = v(a.v_proj.bias)
    dst_layer["self_attn"]["out_proj"]["kernel"] = t(a.out_proj.weight)
    dst_layer["self_attn"]["out_proj"]["bias"] = v(a.out_proj.bias)
    dst_layer["layer_norm1"]["scale"] = v(src_layer.layer_norm1.weight)
    dst_layer["layer_norm1"]["bias"] = v(src_layer.layer_norm1.bias)
    dst_layer["layer_norm2"]["scale"] = v(src_layer.layer_norm2.weight)
    dst_layer["layer_norm2"]["bias"] = v(src_layer.layer_norm2.bias)
    dst_layer["fc1"]["kernel"] = t(src_layer.mlp.fc1.weight)
    dst_layer["fc1"]["bias"] = v(src_layer.mlp.fc1.bias)
    dst_layer["fc2"]["kernel"] = t(src_layer.mlp.fc2.weight)
    dst_layer["fc2"]["bias"] = v(src_layer.mlp.fc2.bias)


def transplant(model: DCTAutoencoder, clip_vision_model) -> DCTAutoencoder:
    """Layerwise transplant (reference copy_clip_into_.py:21-27): CLIP layers
    [0, n) -> encoder, [n, 2n) -> decoder."""
    import flax

    params = flax.core.unfreeze(model.params)
    n_enc = model.config.encoder_config.num_hidden_layers
    n_dec = model.config.decoder_config.num_hidden_layers
    src_layers = clip_vision_model.vision_model.encoder.layers
    assert len(src_layers) >= n_enc + n_dec, (
        f"CLIP has {len(src_layers)} layers; need {n_enc + n_dec}"
    )
    for i in range(n_enc):
        _copy_layer(params["encoder"][f"layers_{i}"], src_layers[i])
    for i in range(n_dec):
        _copy_layer(params["decoder"][f"layers_{i}"], src_layers[n_enc + i])
    model.params = flax.core.freeze(params) if isinstance(model.params, flax.core.FrozenDict) else params
    return model


def main(
    model_config_path: str = "./conf/patch14-l.json",
    clip_model_name: str = "openai/clip-vit-large-patch14",
    output_path: str = "./out/warm_start",
):
    try:
        from transformers import CLIPVisionModel
    except ImportError as e:
        raise SystemExit(f"transformers unavailable: {e}")

    cfg = DCTAutoencoderConfig.from_json_file(model_config_path)
    model = DCTAutoencoder(cfg)
    clip = CLIPVisionModel.from_pretrained(clip_model_name)
    model = transplant(model, clip)
    model.save_pretrained(output_path)
    print("saved warm-started model to", output_path)


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_config_path", default="./conf/patch14-l.json")
    p.add_argument("--clip_model_name", default="openai/clip-vit-large-patch14")
    p.add_argument("--output_path", default="./out/warm_start")
    main(**vars(p.parse_args()))
