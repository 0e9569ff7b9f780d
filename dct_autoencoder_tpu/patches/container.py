"""DCTPatches — the ragged-packed-batch record threaded through every layer.

TPU-native counterpart of the reference dataclass
(reference: dct_autoencoder/dct_patches.py:6-51).  Registered as a JAX pytree:
the tensor fields are leaves (static `(b, max_seq_len, ...)` shapes so the
whole record flows through `jit`/`pjit` unchanged), while the per-image Python
metadata (`patch_sizes`, `original_sizes`, `_data`) rides along as hashable
aux data and never touches the device.

Also provides the JSON token-stream (de)serialization used by the
autoregressive-dataset export (reference: dct_patches.py:54-122), with the
same schema so token dumps are interchangeable with the reference's.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DCTPatches:
    # (b, s, patch_size**2) DCT patch tokens (or model features mid-pipeline)
    patches: jnp.ndarray
    # (b, s) True where padding
    key_pad_mask: jnp.ndarray
    # (b, 1, s, s) True where attention is allowed (same image & not padding)
    attn_mask: jnp.ndarray
    # (b, s) id of the packed image each token belongs to
    batched_image_ids: jnp.ndarray
    # (b, s) channel index of each token
    patch_channels: jnp.ndarray
    # (b, s, 2) (h, w) patch-grid position of each token
    patch_positions: jnp.ndarray
    # python-land metadata: ph, pw patch-grid size per image
    patch_sizes: Tuple[Tuple[int, int], ...] = dataclasses.field(
        metadata=dict(static=True), default=()
    )
    # h, w of the original image pixels per image
    original_sizes: Tuple[Tuple[int, int], ...] = dataclasses.field(
        metadata=dict(static=True), default=()
    )
    # arbitrary side-channel data carried through packing (e.g. captions)
    _data: Optional[Tuple[Tuple[str, Tuple[Any, ...]], ...]] = dataclasses.field(
        metadata=dict(static=True), default=None
    )

    @property
    def h_indices(self) -> jnp.ndarray:
        return self.patch_positions[..., 0]

    @property
    def w_indices(self) -> jnp.ndarray:
        return self.patch_positions[..., 1]

    @property
    def data_dict(self) -> Dict[str, List[Any]]:
        if self._data is None:
            return {}
        return {k: list(v) for k, v in self._data}

    def replace(self, **kwargs) -> "DCTPatches":
        return dataclasses.replace(self, **kwargs)

    # parity alias with the reference's shallow_copy/.to API surface
    def shallow_copy(self) -> "DCTPatches":
        return dataclasses.replace(self)


def to_dict(dct_patches: DCTPatches, codes: jnp.ndarray) -> List[dict]:
    """Serialize packed token streams to JSON-able per-image records.

    Schema-compatible with the reference exporter (dct_patches.py:54-83):
    each image gets {"size", "original_size", "codes": [{"c","h","w","data"}]}.
    Vectorized with numpy — no per-token Python loops.
    """
    codes = np.asarray(codes)
    image_ids = np.asarray(dct_patches.batched_image_ids)
    pad = np.asarray(dct_patches.key_pad_mask)
    channels = np.asarray(dct_patches.patch_channels)
    positions = np.asarray(dct_patches.patch_positions)

    b, s, _ = codes.shape
    assert image_ids.shape == (b, s)

    objs: List[dict] = []
    for batch_i in range(b):
        row_valid = ~pad[batch_i]
        n_images = int(image_ids[batch_i][row_valid].max()) + 1 if row_valid.any() else 0
        for image_i in range(n_images):
            m = (image_ids[batch_i] == image_i) & row_valid
            cs = channels[batch_i, m]
            hs = positions[batch_i, m, 0]
            ws = positions[batch_i, m, 1]
            ds = codes[batch_i, m]
            objs.append(
                {
                    "size": tuple(dct_patches.patch_sizes[len(objs)]),
                    "original_size": tuple(dct_patches.original_sizes[len(objs)]),
                    "codes": [
                        {"c": int(c), "h": int(h), "w": int(w), "data": d.tolist()}
                        for c, h, w, d in zip(cs, hs, ws, ds)
                    ],
                }
            )
    return objs


def from_dict(obj: dict) -> Tuple[DCTPatches, np.ndarray]:
    """Inverse of to_dict for a single image record (reference dct_patches.py:86-122)."""
    patch_size = tuple(obj["size"])
    original_size = tuple(obj["original_size"])
    h_indices = [d["h"] for d in obj["codes"]]
    w_indices = [d["w"] for d in obj["codes"]]
    channels = [d["c"] for d in obj["codes"]]
    codes = [d["data"] for d in obj["codes"]]

    n = len(h_indices)
    dct_patches = DCTPatches(
        patches=jnp.zeros((1,), dtype=jnp.float32),
        key_pad_mask=jnp.zeros((1, n), dtype=bool),
        attn_mask=jnp.ones((1, 1, n, n), dtype=bool),
        batched_image_ids=jnp.zeros((1, n), dtype=jnp.int32),
        patch_channels=jnp.asarray(channels, dtype=jnp.int32)[None],
        patch_positions=jnp.stack(
            [jnp.asarray(h_indices, dtype=jnp.int32), jnp.asarray(w_indices, dtype=jnp.int32)],
            axis=-1,
        )[None],
        patch_sizes=(patch_size,),
        original_sizes=(original_size,),
    )
    return dct_patches, np.asarray(codes, dtype=np.int64)
