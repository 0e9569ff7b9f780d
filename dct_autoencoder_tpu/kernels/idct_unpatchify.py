"""Pallas TPU kernel: fused DCT-plane -> IDCT -> IPT->RGB (decode front-end).

The inverse of kernels/dct_patchify.py: takes reconstructed (cropped) DCT
planes, applies the orthonormal inverse DCT as two HIGHEST-precision MXU
matmuls per channel — the zero-pad to the original pixel size is folded into
TRUNCATED DCT matrices, so the padded plane never materializes — and converts
IPT -> RGB on the VPU.  One HBM read of the cropped plane, one write of the
pixels.  (The token->plane scatter stays in XLA: revert_patching's scatter and
the patch-layout transpose don't lower to Mosaic profitably; see the forward
kernel's notes.)

Single-cell design (one grid cell per image, ALL channels): mirrors the
forward kernel's measured result — the earlier per-channel grid under the
16 MB default VMEM scope had to recompute the three IDCT planes for every
output channel (3x MXU work) and lost to XLA; one cell under a 100 MB scope
does each IDCT once.  VMEM live set is ~8 f32 pixel planes + the two DCT
matrices, bounding images to MAX_FUSED_AREA (same guard as the forward).

Measured on v5e at the real decode shape (434x434 crop -> 448px, batch 16):
**0.97 ms vs 1.37 ms for the XLA pad->idct2->ipt_to_rgb path (1.41x)**,
max|diff| 1.8e-4 — promoted to the TPU decode default in
patches/extractor.py _get_postproc_fn under the same auto/area policy as
the forward kernel.

Equivalent XLA path: extractor._get_postproc_fn's zero-pad -> idct2 ->
ipt_to_rgb (reference feature_extraction...py:289-310).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.colorspace import _IPT2LMS, _LMS2RGB, IPT_GAMMA
from ..ops.dct import dct_matrix
from .dct_patchify import MAX_FUSED_AREA  # shared single-cell VMEM guard


def _signed_pow(x, gamma):
    return jnp.sign(x) * jnp.exp(gamma * jnp.log(jnp.maximum(jnp.abs(x), 1e-30)))


def _kernel(y_ref, dh_ref, dw_ref, out_ref):
    """One image per grid cell.

    y: (1, 3, ch, cw) cropped DCT plane; dh: (ch, H); dw: (cw, W);
    out: (1, 3, H, W) RGB.

    Inverse DCT with implicit zero-padding: X = (D_H[:ch])^T Y D_W[:cw] —
    the truncated matrices ARE the pad.  The three IDCT'd IPT planes are
    accumulated straight into the three pre-gamma LMS planes so at most one
    IDCT output is live at a time (liveness: 3 accumulators + 1 plane).
    """
    dh = dh_ref[:]  # (ch, H)
    dw = dw_ref[:]  # (cw, W)

    m1 = _IPT2LMS.astype(np.float32)
    m2 = _LMS2RGB.astype(np.float32)

    pre = None  # 3 pre-gamma LMS planes (H, W)
    for c in range(3):
        y = y_ref[0, c]  # (ch, cw)
        # a[k, r] = sum_i y[i, k] dh[i, r]  ->  a = Y^T D_H[:ch]  (cw, H)
        a = jax.lax.dot_general(
            y, dh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        # x[r, s] = sum_k a[k, r] dw[k, s]  ->  x = D_H^T Y D_W  (H, W)
        x = jax.lax.dot_general(
            a, dw, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        contrib = [float(m1[i, c]) * x for i in range(3)]
        pre = contrib if pre is None else [pre[i] + contrib[i] for i in range(3)]

    # LMS -> RGB: accumulate per output channel so one gamma'd plane is live
    for j in range(3):
        out = None
        for i in range(3):
            term = float(m2[j, i]) * _signed_pow(pre[i], 1.0 / IPT_GAMMA)
            out = term if out is None else out + term
        out_ref[0, j] = out


def fused_idct_unpatchify_rgb(
    y: jnp.ndarray,
    out_h: int,
    out_w: int,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """(B, 3, ch, cw) cropped DCT planes -> (B, 3, out_h, out_w) RGB pixels.

    Equivalent to: zero-pad plane to (out_h, out_w) -> idct2 -> ipt_to_rgb
    (reference feature_extraction...py:289-310), with the zero-pad folded into
    truncated DCT matrices (no padded plane ever materializes).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, c, ch, cw = y.shape
    assert c == 3

    dh = jnp.asarray(dct_matrix(out_h, np.float32)[:ch])  # (ch, H)
    dw = jnp.asarray(dct_matrix(out_w, np.float32)[:cw])  # (cw, W)

    return pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 3, ch, cw), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, out_h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cw, out_w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, out_h, out_w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, 3, out_h, out_w), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(y.astype(jnp.float32), dh, dw)
