"""Checkpoint diagnosis probe (reference: diagnose_splotchiness.py).

Loads a checkpoint, runs one batch of fixture images through
normalize -> encode -> decode -> inverse-normalize, and reports per-stage
statistics (token counts, normalized-patch distribution, code histogram
stats, reconstruction error per channel) plus an optional side-by-side PNG —
the structured version of the reference's bpdb scratchpad.

Usage:
  python -m dct_autoencoder_tpu.tools.diagnose \
      --model_load_path out/<ts>/model --image_dir /root/reference/images
"""
from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np
from PIL import Image

from ..models.factory import get_model_and_processor
from ..ops.stats import calculate_perplexity
from .viz import make_image_grid


def main(
    model_load_path: str,
    image_dir: str = "./images",
    n_images: int = 4,
    max_side: int = 448,
    out_file: Optional[str] = "diagnose.png",
    platform: str = "default",
):
    from . import set_platform

    set_platform(platform)
    import jax.numpy as jnp

    model, proc = get_model_and_processor(
        None, dtype=jnp.float32, sample_patches_beta=0.0, resume_path=model_load_path
    )

    files = sorted(
        f for f in os.listdir(image_dir) if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )[:n_images]
    ims = []
    for f in files:
        im = Image.open(os.path.join(image_dir, f)).convert("RGB")
        if max(im.size) > max_side:
            s = max_side / max(im.size)
            im = im.resize((int(im.width * s), int(im.height * s)), Image.BICUBIC)
        ims.append(np.asarray(im, dtype=np.float32).transpose(2, 0, 1) / 255.0)

    ds = [proc.preprocess(im) for im in ims]
    cols = {k: [d[k] for d in ds] for k in ds[0]}
    batch = next(proc.iter_batches(iter([cols]), batch_size=None))
    valid = ~np.asarray(batch.key_pad_mask)
    print(f"batch: {batch.patches.shape}, {valid.sum()} valid tokens, {len(ims)} images")

    nb = model.normalize_(batch)
    nvals = np.asarray(nb.patches)[valid]
    print(
        f"normalized patches: median {np.median(nvals):+.3f} std {nvals.std():.3f} "
        f"clip-rate {(np.abs(nvals) >= 6.0).mean():.4f}"
    )

    out = model.forward(nb, training=False)
    codes = np.asarray(out["codes"])[valid]
    ppl = float(calculate_perplexity(codes, model.config.vq_codebook_size))
    print(f"codes: perplexity {ppl:.1f} / {model.config.vq_codebook_size}")

    rec = model.inv_normalize_(out["dct_patches"])
    rec_images = proc.postprocess(rec)
    for f, im, r in zip(files, ims, rec_images):
        err = np.clip(r, 0, 1) - im
        mse = float((err**2).mean())
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        per_c = [float(np.abs(err[c]).mean()) for c in range(3)]
        print(f"{f}: PSNR {psnr:.2f} dB, per-channel L1 {per_c}")

    if out_file:
        make_image_grid(ims, [np.clip(r, 0, 1) for r in rec_images], filename=out_file)


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_load_path", required=True)
    p.add_argument("--image_dir", default="./images")
    p.add_argument("--n_images", type=int, default=4)
    p.add_argument("--max_side", type=int, default=448)
    p.add_argument("--out_file", default="diagnose.png")
    p.add_argument("--platform", default="default")
    main(**vars(p.parse_args()))
