"""Colorspace roundtrip + noise-robustness probe (reference: test_colorspaces.py).

Renders side-by-side (original | IPT roundtrip | YCbCr roundtrip) panels and
prints per-space roundtrip error and noise-amplification factors.  PNG output
instead of the reference's interactive matplotlib/bpdb session.

Usage:
  python -m dct_autoencoder_tpu.tools.test_colorspaces \
      --image /root/reference/images/girl.jpg --out_file colorspaces.png
"""
from __future__ import annotations

import argparse

import numpy as np
from PIL import Image

from ..ops.colorspace import ipt_to_rgb, rgb_to_ipt, rgb_to_ycbcr, ycbcr_to_rgb
from .viz import to_pil


def main(
    image: str,
    out_file: str = "colorspaces.png",
    noise_std: float = 0.02,
    max_side: int = 384,
    platform: str = "cpu",
):
    from . import set_platform

    set_platform(platform)
    import jax.numpy as jnp

    im = Image.open(image).convert("RGB")
    if max(im.size) > max_side:
        s = max_side / max(im.size)
        im = im.resize((int(im.width * s), int(im.height * s)), Image.BICUBIC)
    x = np.asarray(im, dtype=np.float32).transpose(2, 0, 1) / 255.0

    spaces = {
        "ipt": (rgb_to_ipt, ipt_to_rgb),
        "ycbcr": (rgb_to_ycbcr, ycbcr_to_rgb),
    }

    panels = [x]
    rng = np.random.default_rng(0)
    noise = rng.normal(0, noise_std, size=x.shape).astype(np.float32)
    for name, (fwd, inv) in spaces.items():
        rt = np.asarray(inv(fwd(jnp.asarray(x))))
        err = np.abs(rt - x).mean()
        # noise amplification: perturb in the transformed space
        y = np.asarray(fwd(jnp.asarray(x)))
        y_noised = y + noise
        back = np.asarray(inv(jnp.asarray(y_noised)))
        amp = np.abs(back - x).mean() / noise_std
        print(f"{name}: roundtrip L1 {err:.2e}, noise amplification x{amp:.2f}")
        panels.append(np.clip(rt, 0, 1))
        panels.append(np.clip(back, 0, 1))

    h = min(p.shape[1] for p in panels)
    w = min(p.shape[2] for p in panels)
    strip = np.concatenate([p[:, :h, :w] for p in panels], axis=2)
    to_pil(strip).save(out_file)
    print("saved", out_file, "(original | ipt rt | ipt noised | ycbcr rt | ycbcr noised)")


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image", required=True)
    p.add_argument("--out_file", default="colorspaces.png")
    p.add_argument("--noise_std", type=float, default=0.02)
    p.add_argument("--max_side", type=int, default=384)
    p.add_argument("--platform", default="cpu")
    main(**vars(p.parse_args()))
