"""Checkpoint evaluation harness: PSNR + code perplexity on held-out images.

The reference tracks reconstruction quality only through ad-hoc wandb image
grids and in-training loss curves (reference main.py:195-214, 263-265); this
tool turns quality into a measurable, comparable number per checkpoint:

  * reconstruct held-out images through the FULL encode->decode pipeline
    (preprocess -> pack -> normalize -> transformer -> LFQ/VQ -> decode ->
    postprocess) at a fixed, seeded token budget, report RGB-space PSNR;
  * code perplexity over the emitted token streams (reference
    util.py:391-410) — codebook-usage health.

The token draw is re-seeded per checkpoint so every checkpoint sees the SAME
packed shapes (one compile, reused across the whole scan) and the SAME token
budget (PSNR numbers are comparable run-to-run).

Usage:
  python -m dct_autoencoder_tpu.tools.eval --scan out/<ts> \
      --images /root/reference/images/baboon.jpg,/root/reference/images/zebra.jpg
  python -m dct_autoencoder_tpu.tools.eval --checkpoint out/<ts>/model
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import random
from typing import Dict, List, Sequence

import numpy as np


def load_images(paths: Sequence[str], resize: int = 448) -> List[np.ndarray]:
    """Load RGB images as (c, h, w) float32 in [0,1], resized to resize^2."""
    from ..data.images import load_images_chw

    return load_images_chw(paths, resize)


from ..ops.stats import psnr  # shared definition


def evaluate_checkpoint(
    pipe,
    images: List[np.ndarray],
    seed: int,
) -> Dict[str, float]:
    """One checkpoint: mean/per-image PSNR + code perplexity."""
    from ..ops.stats import calculate_perplexity

    # identical stochastic token budget per checkpoint -> identical packed
    # shapes -> the jitted forward compiles once for the whole scan
    pipe.processor.rng = random.Random(seed)
    records = pipe.encode(images)
    recs = pipe.decode(records)
    psnrs = [psnr(r, o) for r, o in zip(recs, images)]

    codes = np.concatenate(
        [np.asarray([c["data"] for c in rec["codes"]]) for rec in records], axis=0
    )  # (total_tokens, num_codebooks)
    ppl = float(
        calculate_perplexity(codes, pipe.model.config.vq_codebook_size)
    )
    return {
        "psnr": float(np.mean(psnrs)),
        "psnr_per_image": [round(p, 3) for p in psnrs],
        "perplexity": ppl,
        "n_tokens": int(codes.shape[0]),
    }


def scan_checkpoints(out_dir: str) -> List[str]:
    """Step-stamped checkpoints (ckpt_<step>) plus the final model dir."""
    ckpts = sorted(glob.glob(os.path.join(out_dir, "ckpt_*")))
    final = os.path.join(out_dir, "model")
    if os.path.isdir(final):
        ckpts.append(final)
    return ckpts


def main(
    checkpoint: str = None,
    scan: str = None,
    images: str = "/root/reference/images/baboon.jpg,/root/reference/images/zebra.jpg",
    resize: int = 448,
    sample_patches_beta: float = 0.02,
    seed: int = 7,
    output: str = None,
):
    from ..pipeline import DCTPipeline

    paths = scan_checkpoints(scan) if scan else [checkpoint]
    assert paths and paths[0], "pass --checkpoint <model_dir> or --scan <out_dir>"
    ims = load_images([p for p in images.split(",") if p], resize=resize)

    out_path = output or (os.path.join(scan, "eval.jsonl") if scan else None)
    if out_path and os.path.exists(out_path):
        # one run = one file: a re-run (different --images/--seed) must not
        # mix rows with a stale earlier scan
        os.remove(out_path)
    results = []
    pipe = None
    for path in paths:
        if pipe is None:
            # measurement tool: always evaluate the fp checkpoint itself —
            # never the int8-gate serving flip (prefer_int8='auto' is for
            # serving loaders, tools/serve.py)
            pipe = DCTPipeline.from_pretrained(
                path, sample_patches_beta=sample_patches_beta, prefer_int8="never"
            )
        else:
            # reuse the pipeline (and its jit cache): swap weights only
            from ..models.autoencoder import DCTAutoencoder

            fresh = DCTAutoencoder.from_pretrained(path, dtype=pipe.model.dtype)
            pipe.model.params = fresh.params
            pipe.model.patchnorm = fresh.patchnorm
            pipe.model.vq_stats = fresh.vq_stats
        step = os.path.basename(path.rstrip("/"))
        res = {"checkpoint": path, "step": step, **evaluate_checkpoint(pipe, ims, seed)}
        results.append(res)
        print(json.dumps(res))
        if out_path:
            with open(out_path, "a") as f:
                f.write(json.dumps(res) + "\n")
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--scan", type=str, default=None)
    p.add_argument(
        "--images",
        type=str,
        default="/root/reference/images/baboon.jpg,/root/reference/images/zebra.jpg",
    )
    p.add_argument("--resize", type=int, default=448)
    p.add_argument("--sample_patches_beta", type=float, default=0.02)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--output", type=str, default=None)
    main(**vars(p.parse_args()))
