"""Pallas TPU kernel: fused RGB->IPT -> whole-image DCT -> patchify.

The preprocessing front-end as one kernel per image: read the RGB image from
HBM once, do the 3x3 IPT color matmul + signed-gamma on the VPU, the
orthonormal 2-D DCT as two MXU matmuls (`D_H X D_W^T` — the TPU-native
formulation replacing the reference's CPU-FFT detour,
feature_extraction...py:130-142), crop the frequency plane, and write tokens
directly in packed (ph*pw, c, p*p) layout.  The XLA pipeline materializes the
IPT image, the DCT plane, and the patchified copy in HBM (~3x the traffic);
here only the token layout is written.

Everything is VMEM-resident per grid cell (one cell per image), so image area
is bounded by VMEM: (3 + 3) * H * W * 4 bytes plus the two DCT matrices —
fine through ~1024px.  Grid: (batch,).

Measured on v5e at 448px/batch-16: the XLA pipeline wins (2.26 ms vs
4.83 ms) because it batches the HIGHEST-precision DCT matmul over all
b*3 channel planes at once, while this kernel's (image, channel) grid — forced
by the 16 MB VMEM scope — issues many smaller matmuls.  The extractor
therefore defaults to the XLA path; this kernel stays available
(use_fused_kernel='pallas') for bandwidth-constrained regimes and as the
fused-front-end design point.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.colorspace import _M_IPT, _RGB2LMS, IPT_GAMMA
from ..ops.dct import dct_matrix


def _signed_pow(x, gamma):
    return jnp.sign(x) * jnp.exp(gamma * jnp.log(jnp.maximum(jnp.abs(x), 1e-30)))


def _kernel(x_ref, dh_ref, dw_ref, out_ref):
    """One (image, output-channel) grid cell.

    x: (1, 3, H, W) RGB; dh: (ch, H); dw: (cw, W); out: (1, 1, ch, cw)
    cropped DCT plane for IPT channel `j = program_id(1)`.

    The per-channel grid keeps VMEM under the 16 MB scoped limit at 448px+
    (an all-channels cell needs ~17 MB); the LMS recompute it costs is cheap
    VPU work.  The patch-layout transpose happens in XLA outside — Mosaic
    cannot lower a 4-D transpose of 14-aligned tiles.
    """
    j = pl.program_id(1)
    x = x_ref[0]  # (3, H, W)

    # RGB -> LMS -> signed gamma (3x3 channel matmul on the VPU)
    m1 = _RGB2LMS.astype(np.float32)
    lms = [
        _signed_pow(m1[i, 0] * x[0] + m1[i, 1] * x[1] + m1[i, 2] * x[2], IPT_GAMMA)
        for i in range(3)
    ]
    # IPT channel j: switch over the three static rows of the 3x3 matrix
    # (an array constant may not be captured by a pallas kernel)
    m2 = _M_IPT.astype(np.float32)

    def _mix(r):
        return lambda: float(r[0]) * lms[0] + float(r[1]) * lms[1] + float(r[2]) * lms[2]

    ipt_j = jax.lax.switch(j, [_mix(m2[0]), _mix(m2[1]), _mix(m2[2])])

    dh = dh_ref[:]  # (ch, H)
    dw = dw_ref[:]  # (cw, W)

    # whole-image orthonormal DCT restricted to the cropped plane:
    # (ch, H) @ (H, W) -> (ch, W); (ch, W) @ (W, cw)^T -> (ch, cw)
    # HIGHEST precision: default f32 matmul runs as bf16 passes on the MXU,
    # which is catastrophic for DCT coefficients (DC term ~ sqrt(H*W)/2)
    a = jax.lax.dot_general(
        dh, ipt_j, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    y = jax.lax.dot_general(
        a, dw, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[0, 0] = y


def fused_ipt_dct_patchify(
    x: jnp.ndarray,
    patch_size: int,
    crop_h: int,
    crop_w: int,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """(B, 3, H, W) RGB in [0,1] -> (B, ph*pw, 3, p*p) DCT patch tokens.

    crop_h/crop_w: patch-multiple crop of the DCT plane (reference semantics:
    DCT at full image size, then crop the frequency plane).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, c, h, w = x.shape
    assert c == 3
    p = patch_size
    ph, pw = crop_h // p, crop_w // p

    dh = jnp.asarray(dct_matrix(h, np.float32)[:crop_h])  # (ch, H)
    dw = jnp.asarray(dct_matrix(w, np.float32)[:crop_w])  # (cw, W)

    out = pl.pallas_call(
        _kernel,
        grid=(b, 3),
        in_specs=[
            pl.BlockSpec((1, 3, h, w), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((crop_h, h), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((crop_w, w), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, crop_h, crop_w), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, 3, crop_h, crop_w), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.float32), dh, dw)
    # patch layout (b, ph*pw, 3, p*p) — one XLA transpose-copy of the small plane
    out = out.reshape(b, 3, ph, p, pw, p).transpose(0, 2, 4, 1, 3, 5)
    return out.reshape(b, ph * pw, 3, p * p)
