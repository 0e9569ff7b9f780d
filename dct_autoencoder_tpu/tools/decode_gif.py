"""Progressive-decode GIF demo (reference: decode_gif.py:16-125).

Decodes an image from its first i quantized codes for i = 1..n_frames,
rendering (original | reconstruction) frames into an animated GIF — shows the
coarse-to-fine property of the importance-ordered token stream.  Uses PIL's
GIF writer (no imageio dependency).

Usage:
  python -m dct_autoencoder_tpu.tools.decode_gif \
      --image /root/reference/images/bold.jpg --model_load_path out/<ts>/model
"""
from __future__ import annotations

import argparse
from typing import Optional

import numpy as np
from PIL import Image

from ..models.factory import get_model_and_processor
from ..patches.container import DCTPatches


def mask_and_rec(model, batch: DCTPatches, codes, n_keep: int) -> DCTPatches:
    """Decode keeping only the first n_keep tokens (reference decode_gif.py:60-77).

    Instead of slicing to a dynamic length (recompiles per i), tokens >= n_keep
    are marked as padding so one compiled decode serves every frame.
    """
    s = batch.patches.shape[1]
    keep = np.arange(s) < n_keep
    pad = np.asarray(batch.key_pad_mask) | ~keep[None, :]
    ids = np.asarray(batch.batched_image_ids)
    attn = (ids[:, None, :, None] == ids[:, None, None, :]) & (~pad[:, None, None, :])
    masked = batch.replace(
        key_pad_mask=np.asarray(pad),
        attn_mask=np.asarray(attn),
    )
    out = model.decode_from_codes(
        np.asarray(codes),
        key_pad_mask=masked.key_pad_mask,
        attn_mask=masked.attn_mask,
        batched_image_ids=masked.batched_image_ids,
        patch_channels=masked.patch_channels,
        patch_positions=masked.patch_positions,
        patch_sizes=masked.patch_sizes,
        original_sizes=masked.original_sizes,
    )
    # zero out the dropped tokens so they land as zeros on the DCT canvas
    patches = np.array(out.patches)  # materialized copy (jax arrays are read-only)
    patches[pad] = 0.0
    return out.replace(patches=patches)


def main(
    image: str,
    model_load_path: Optional[str] = None,
    out_file: str = "progressive.gif",
    n_frames: int = 16,
    sample_patches_beta: float = 0.0,
    max_side: int = 448,
    duration_ms: int = 250,
    platform: str = "default",
):
    from . import set_platform

    set_platform(platform)
    import jax.numpy as jnp

    model, proc = get_model_and_processor(
        None, dtype=jnp.float32, sample_patches_beta=sample_patches_beta,
        resume_path=model_load_path,
    )

    im = Image.open(image).convert("RGB")
    if max(im.size) > max_side:
        s = max_side / max(im.size)
        im = im.resize((int(im.width * s), int(im.height * s)), Image.BICUBIC)
    x = np.asarray(im, dtype=np.float32).transpose(2, 0, 1) / 255.0

    d = proc.preprocess(x)
    batch = next(proc.iter_batches(iter([{k: [v] for k, v in d.items()}]), batch_size=None))
    nb = model.normalize_(batch)
    _, codes, _, _, _ = model.encode(nb, training=False)

    n_tokens = int((~np.asarray(batch.key_pad_mask)).sum())
    frames = []
    for i in range(1, n_frames + 1):
        n_keep = max(1, round(n_tokens * i / n_frames))
        rec_patches = mask_and_rec(model, nb, codes, n_keep)
        rec_un = model.inv_normalize_(rec_patches)
        rec = proc.postprocess(rec_un)[0]
        rec = np.clip(rec, 0, 1)
        pair = np.concatenate([x, rec], axis=2).transpose(1, 2, 0)
        frames.append(Image.fromarray((pair * 255).astype(np.uint8)))
        print(f"frame {i}/{n_frames}: {n_keep} tokens")

    frames[0].save(
        out_file,
        save_all=True,
        append_images=frames[1:],
        duration=duration_ms,
        loop=0,
    )
    print("saved", out_file)


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image", required=True)
    p.add_argument("--model_load_path", default=None)
    p.add_argument("--out_file", default="progressive.gif")
    p.add_argument("--n_frames", type=int, default=16)
    p.add_argument("--sample_patches_beta", type=float, default=0.0)
    p.add_argument("--max_side", type=int, default=448)
    p.add_argument("--platform", default="default")
    main(**vars(p.parse_args()))
