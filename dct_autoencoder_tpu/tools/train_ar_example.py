"""End-to-end AR example: tokenize -> train a decoder-only LM -> sample ->
decode back to pixels.

Usage:
  python -m dct_autoencoder_tpu.tools.train_ar_example \
      --model_path out/<run>/model --image_dir /root/reference/images \
      [--steps 200] [--out out_ar]

Closes the loop the reference only gestures at (its
prepare_autoregressive_dataset.py dumps records "for training downstream
autoregressive models" and stops): tokenizes images with a trained
DCTAutoencoder, trains models/ar.ARTokenModel on the records with
teacher forcing, then samples a code sequence for a held-out image's
position layout and decodes it through the tokenizer — demonstrating that
the exported token-dump schema is actually consumable for generation.
"""
from __future__ import annotations

import argparse
import json
import os
from typing import List

import numpy as np


def records_to_arrays(records: List[dict], max_len: int):
    """Token records (to_dict schema) -> fixed-shape AR training arrays."""
    n = len(records)
    C = len(records[0]["codes"][0]["data"])
    codes = np.zeros((n, max_len, C), np.int32)
    chans = np.zeros((n, max_len), np.int32)
    poss = np.zeros((n, max_len, 2), np.int32)
    pad = np.ones((n, max_len), bool)
    for i, rec in enumerate(records):
        toks = rec["codes"][:max_len]
        for t, tok in enumerate(toks):
            codes[i, t] = tok["data"]
            chans[i, t] = tok["c"]
            poss[i, t] = (tok["h"], tok["w"])
        pad[i, : len(toks)] = False
    return codes, chans, poss, pad


def main(
    model_path: str,
    image_dir: str,
    steps: int = 200,
    batch_size: int = 8,
    max_len: int = 128,
    learning_rate: float = 3e-4,
    hidden: int = 256,
    layers: int = 4,
    out: str = "out_ar",
    seed: int = 0,
):
    import jax
    import jax.numpy as jnp
    import optax
    from PIL import Image

    from ..models.ar import ARConfig, ARTokenModel, ar_loss, sample_codes_scan
    from ..models.config import TransformerConfig
    from ..pipeline import DCTPipeline

    pipe = DCTPipeline.from_pretrained(model_path, sample_patches_beta=0.02)
    import random as _r

    pipe.processor.rng = _r.Random(seed)
    cfg_tok = pipe.model.config

    # one fixed bucket sized to the tokenizer's grid: one compiled shape
    target = min(448, cfg_tok.patch_size * cfg_tok.max_patch_h)
    files = sorted(
        f for f in os.listdir(image_dir) if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    ims = []
    for f in files:
        im = Image.open(os.path.join(image_dir, f)).convert("RGB").resize(
            (target, target), Image.BICUBIC
        )
        ims.append(np.asarray(im, np.float32).transpose(2, 0, 1) / 255.0)
    records = pipe.encode(ims * max(1, (batch_size * 4) // max(len(ims), 1)))
    print(f"tokenized {len(records)} records")

    codes, chans, poss, pad = records_to_arrays(records, max_len)

    ar_cfg = ARConfig(
        codebook_size=cfg_tok.vq_codebook_size,
        num_codebooks=cfg_tok.vq_num_codebooks,
        image_channels=cfg_tok.image_channels,
        max_patch_h=cfg_tok.max_patch_h,
        max_patch_w=cfg_tok.max_patch_w,
        transformer=TransformerConfig(
            hidden_size=hidden, intermediate_size=hidden * 4,
            num_hidden_layers=layers, num_attention_heads=max(hidden // 64, 4),
        ),
    )
    model = ARTokenModel(ar_cfg)
    rng = jax.random.PRNGKey(seed)
    params = model.init(
        rng, jnp.asarray(codes[:1]), jnp.asarray(chans[:1]), jnp.asarray(poss[:1]),
        jnp.asarray(pad[:1]), training=False,
    )["params"]
    tx = optax.adamw(optax.warmup_cosine_decay_schedule(0, learning_rate, 20, max(steps, 21)))
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, codes, chans, poss, pad):
        def loss_fn(p):
            logits = model.apply({"params": p}, codes, chans, poss, pad, training=True)
            return ar_loss(logits, codes, ~pad)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    os.makedirs(out, exist_ok=True)
    nprng = np.random.default_rng(seed)
    losses = []
    with open(os.path.join(out, "ar_metrics.jsonl"), "w") as f:
        for i in range(steps):
            idx = nprng.integers(0, codes.shape[0], batch_size)
            params, opt_state, loss = train_step(
                params, opt_state,
                jnp.asarray(codes[idx]), jnp.asarray(chans[idx]),
                jnp.asarray(poss[idx]), jnp.asarray(pad[idx]),
            )
            losses.append(float(loss))
            if i % 20 == 0:
                print(f"ar step {i}: loss {losses[-1]:.4f}")
                f.write(json.dumps({"step": i, "loss": losses[-1]}) + "\n")
    print(f"ar loss {losses[0]:.4f} -> {losses[-1]:.4f}")

    # persist the AR checkpoint for the serving daemon's /generate endpoint
    from ..models.ar import save_ar_model

    save_ar_model(os.path.join(out, "ar_model"), ar_cfg, params)
    print(f"ar checkpoint written to {out}/ar_model")

    # sample codes for a real layout and decode through the tokenizer
    tmpl = records[0]
    n = min(len(tmpl["codes"]), max_len)
    chans_t = jnp.asarray([[t["c"] for t in tmpl["codes"][:n]]], jnp.int32)
    poss_t = jnp.asarray([[[t["h"], t["w"]] for t in tmpl["codes"][:n]]], jnp.int32)
    # one-program scan sampler: a single device dispatch for the whole
    # decode loop (models/ar.py:sample_codes_scan)
    sampled = sample_codes_scan(ar_cfg, params, chans_t, poss_t, jax.random.PRNGKey(1), temperature=1.0)
    rec = dict(tmpl)
    rec["codes"] = [
        dict(c=int(chans_t[0, t]), h=int(poss_t[0, t, 0]), w=int(poss_t[0, t, 1]),
             data=[int(v) for v in np.asarray(sampled[0, t])])
        for t in range(n)
    ]
    img = pipe.decode([rec])[0]
    from PIL import Image as PILImage

    PILImage.fromarray((np.clip(img, 0, 1).transpose(1, 2, 0) * 255).astype(np.uint8)).save(
        os.path.join(out, "ar_sample.png")
    )
    print(f"sampled image written to {out}/ar_sample.png")
    return losses


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", required=True)
    p.add_argument("--image_dir", default="/root/reference/images")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_len", type=int, default=128)
    p.add_argument("--learning_rate", type=float, default=3e-4)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--out", default="out_ar")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    main(**vars(args))
