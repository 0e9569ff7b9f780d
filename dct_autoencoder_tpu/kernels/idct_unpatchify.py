"""Pallas TPU kernel: fused DCT-plane -> IDCT -> IPT->RGB (decode front-end).

The inverse of kernels/dct_patchify.py: takes reconstructed (cropped) DCT
planes, zero-pads them to the original pixel size, applies the orthonormal
inverse DCT as two MXU matmuls, and converts IPT -> RGB — one kernel per
image, one HBM read of the plane and one write of the pixels.  (The
token->plane scatter stays in XLA: revert_patching's scatter and the
patch-layout transpose don't lower to Mosaic profitably; see the forward
kernel's notes.)

Grid (batch, channel): IPT->RGB mixes all three channels, so each cell
recomputes the three IDCT planes and emits one output channel — the same
per-channel split that keeps the forward kernel under the 16 MB VMEM scope
(an all-channels cell needs ~25 MB at 448px).  Larger images use the XLA
path (extractor default — measured faster at these sizes anyway; this kernel
is the bandwidth-optimized design point).
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


def _signed_pow(x, gamma):
    return jnp.sign(x) * jnp.exp(gamma * jnp.log(jnp.maximum(jnp.abs(x), 1e-30)))


def _kernel(y_ref, dh_ref, dw_ref, out_ref):
    """One (image, output-channel) grid cell.

    y: (1, 3, ch, cw) cropped DCT plane; dh: (ch, H); dw: (cw, W);
    out: (1, 1, H, W) — RGB channel `j = program_id(1)`.  The per-channel
    grid keeps VMEM under the 16 MB scope at 448px (an all-channels cell
    needs ~25 MB); the IDCT recompute is the price.

    Inverse DCT with implicit zero-padding: X = (D_H[:ch])^T Y D_W[:cw] —
    the truncated matrices ARE the pad.
    """
    j = pl.program_id(1)
    dh = dh_ref[:]  # (ch, H)
    dw = dw_ref[:]  # (cw, W)

    m1 = _IPT2LMS.astype(np.float32)
    m2 = _LMS2RGB.astype(np.float32)

    # accumulate the three pre-gamma LMS planes channel by channel so at most
    # one IDCT'd plane is live at a time (VMEM liveness: 4 planes, not 6)
    pre = None
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

    # out_j = sum_i m2[j, i] * |pre_i|^(1/gamma) sgn(pre_i): accumulate with a
    # scalar-selected coefficient so only one lms plane is live
    out = None
    for i in range(3):
        lms_i = _signed_pow(pre[i], 1.0 / IPT_GAMMA)
        coef = jax.lax.switch(
            j, [lambda r=r, i=i: jnp.float32(m2[r, i]) for r in range(3)]
        )
        term = coef * lms_i
        out = term if out is None else out + term
    out_ref[0, 0] = out


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
        grid=(b, 3),
        in_specs=[
            pl.BlockSpec((1, 3, ch, cw), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, out_h), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cw, out_w), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, out_h, out_w), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, 3, out_h, out_w), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(y.astype(jnp.float32), dh, dw)
