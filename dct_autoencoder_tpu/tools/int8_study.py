"""int8 dynamic-mode token-agreement study (per-layer sensitivity).

The dynamic int8 path (models/quant.py) is measured FASTER than bf16 at the
headline shapes but flips ~2% of LFQ tokens vs the fp model.  This tool
localizes WHERE the flips originate so the speed can be bought back without
breaking the tokenizer contract:

  * weight_only vs fp        — the serving default's own weight-quant error
  * dynamic (all layers)     — weight + per-token activation quant
  * dynamic, last/first N encoder blocks bf16 — where does protection help?
    (measured: FIRST layers dominate — quant noise amplifies through the
    stack — so protect low indices)
  * group-wise weight scales (g=128) — finer weight quant for both modes
  * one-layer-at-a-time      — exactly one encoder layer int8-dynamic (all
    others exact fp): flips attributable to that layer alone
  * noise_equiv              — fp weights + uniform noise of the SAME
    magnitude as the int8 rounding error (scale/2 per channel).  If its flip
    rate matches weight_only's, the flips are a property of the model's LFQ
    sign margins, not of quantization specifics — i.e. a real floor.

Tokens depend only on the ENCODER (codes come out of encode); decoder
quantization cannot flip them, so variants alter the encoder stack only.
Run on the TPU against the flagship patch14-L config; results recorded in
docs/int8_study_r3.md.

Usage:
  python -m dct_autoencoder_tpu.tools.int8_study [--rows 16] [--per_layer]
  python -m dct_autoencoder_tpu.tools.int8_study \
      --model_path docs/calibrated_run_r3/model --per_layer   # trained weights
                                                              # + real images
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _noise_equiv_model(model, seed: int, skip_layers=()):
    """fp sibling whose stack kernels carry uniform noise at the int8
    rounding magnitude (±scale/2, scale = per-out-channel amax/127).

    skip_layers: layer indices LEFT UNPERTURBED — pass the quantizer's
    bf16-protected layers so the probe models exactly the weights the int8
    form actually rounds (a floor probe that perturbs layers the quantizer
    never touches would overstate the floor)."""
    import copy

    import jax.numpy as jnp

    from ..models.autoencoder import DCTAutoencoder

    rng = np.random.default_rng(seed)
    skip = set(skip_layers)

    def walk(node):
        if isinstance(node, dict):
            if "kernel" in node and getattr(node["kernel"], "ndim", 0) == 2:
                w = np.asarray(node["kernel"], np.float32)
                scale = np.abs(w).max(axis=0) / 127.0
                noise = rng.uniform(-0.5, 0.5, size=w.shape).astype(np.float32)
                out = dict(node)
                out["kernel"] = jnp.asarray(
                    w + noise * scale, dtype=node["kernel"].dtype
                )
                return out
            return {k: walk(v) for k, v in node.items()}
        return node

    def walk_stack(stack_params):
        out = {}
        for k, v in stack_params.items():
            if (
                k.startswith("layers_")
                and k.split("_")[-1].isdigit()
                and int(k.split("_")[-1]) in skip
            ):
                out[k] = v
            else:
                out[k] = walk(v)
        return out

    m = DCTAutoencoder(copy.deepcopy(model.config), dtype=model.dtype)
    params = dict(model.params)
    for stack in ("encoder", "decoder"):
        if stack in params:
            params[stack] = walk_stack(params[stack])
    m.params = params
    m.patchnorm = model.patchnorm
    m.vq_stats = model.vq_stats
    return m


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None, help="model config json (default conf/patch14-l.json)")
    p.add_argument(
        "--model_path",
        default=None,
        help="trained checkpoint dir; uses its weights + real fixture images "
        "instead of random init + synthetic patches",
    )
    p.add_argument("--image_dir", default="/root/reference/images")
    p.add_argument("--resize", type=int, default=448)
    p.add_argument("--rows", type=int, default=16)
    p.add_argument("--seq", type=int, default=256)
    p.add_argument("--per_layer", action="store_true", help="one-layer-at-a-time sweep")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ..models.autoencoder import DCTAutoencoder
    from ..models.config import DCTAutoencoderConfig
    from ..models.patchnorm import calibrate_patchnorm_batch
    from ..models.quant import quantize_model_for_serving
    from ..patches.container import DCTPatches

    rng = np.random.default_rng(args.seed)
    if args.model_path:
        import glob

        from ..data.images import load_images_chw
        from ..models.factory import get_model_and_processor

        model, proc = get_model_and_processor(
            None, dtype=jnp.bfloat16, sample_patches_beta=0.0,
            resume_path=args.model_path,
        )
        cfg = model.config
        ims = load_images_chw(
            sorted(glob.glob(os.path.join(args.image_dir, "*.jpg"))), args.resize
        )
        ds = proc.preprocess_many(ims)
        cols = {k: [d[k] for d in ds] for k in ds[0]}
        batch = next(proc.iter_batches(iter([cols]), batch_size=None))
        from ..train.loop import prepare_train_batch

        batch, _ = prepare_train_batch(batch)
    else:
        here = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        cfg_path = args.config or os.path.join(here, "conf", "patch14-l.json")
        cfg = DCTAutoencoderConfig.from_json_file(cfg_path)
        model = DCTAutoencoder(cfg, dtype=jnp.bfloat16, seed=args.seed)

        b, s = args.rows, args.seq
        n_img = 4
        ids = np.sort(rng.integers(0, n_img, size=(b, s))).astype(np.int32)
        lengths = rng.integers(s // 2, s, size=(b,))
        pad = np.arange(s)[None, :] >= lengths[:, None]
        batch = DCTPatches(
            patches=jnp.asarray(
                rng.standard_normal((b, s, cfg.patch_dim)).astype(np.float32)
            ),
            key_pad_mask=jnp.asarray(pad),
            attn_mask=None,
            batched_image_ids=jnp.asarray(ids),
            patch_channels=jnp.asarray(
                rng.integers(0, cfg.image_channels, (b, s)).astype(np.int32)
            ),
            patch_positions=jnp.asarray(
                rng.integers(
                    0, min(cfg.max_patch_h, cfg.max_patch_w), (b, s, 2)
                ).astype(np.int32)
            ),
        )
        model.patchnorm, _ = calibrate_patchnorm_batch(model.patchnorm, batch)
    nb = model.normalize_(batch)
    valid = ~np.asarray(nb.key_pad_mask)

    def codes_of(m):
        _, codes, _, _, _ = m.encode(nb, training=False)
        return np.asarray(codes)[valid]  # (tokens, num_codebooks)

    codes_fp = codes_of(model)
    n_codes = codes_fp.size
    print(f"# {codes_fp.shape[0]} tokens x {codes_fp.shape[1]} codebooks = {n_codes} codes")

    def report(name, m):
        agree = float((codes_of(m) == codes_fp).mean())
        print(json.dumps({"variant": name, "token_agreement": round(agree, 5),
                          "flipped_per_10k": round((1 - agree) * 1e4, 1)}), flush=True)
        return agree

    L = cfg.encoder_config.num_hidden_layers
    report("weight_only", quantize_model_for_serving(model, mode="weight_only"))
    report("dynamic", quantize_model_for_serving(model, mode="dynamic"))
    report(
        "dynamic_last1_bf16",
        quantize_model_for_serving(model, mode="dynamic", encoder_bf16_layers=(L - 1,)),
    )
    report(
        "dynamic_last2_bf16",
        quantize_model_for_serving(
            model, mode="dynamic", encoder_bf16_layers=(L - 2, L - 1)
        ),
    )
    report(
        "dynamic_first2_bf16",
        quantize_model_for_serving(model, mode="dynamic", encoder_bf16_layers=(0, 1)),
    )
    report(
        "weight_only_g128",
        quantize_model_for_serving(model, mode="weight_only", group_size=128),
    )
    report(
        "dynamic_g128",
        quantize_model_for_serving(model, mode="dynamic", group_size=128),
    )
    report(
        "dynamic_g128_first2_bf16",
        quantize_model_for_serving(
            model, mode="dynamic", group_size=128, encoder_bf16_layers=(0, 1)
        ),
    )

    # floor probe: fp weights + uniform noise at the int8 rounding magnitude.
    # Matching weight_only's flip rate proves the flips come from LFQ sign
    # margins, not from quantization specifics.
    for seed in (1, 2):
        report(f"noise_equiv_seed{seed}", _noise_equiv_model(model, seed))

    if args.per_layer:
        for i in range(L):
            others = tuple(j for j in range(L) if j != i)
            report(
                f"only_layer_{i}_dynamic",
                quantize_model_for_serving(model, mode="dynamic", encoder_bf16_layers=others),
            )


if __name__ == "__main__":
    main()
