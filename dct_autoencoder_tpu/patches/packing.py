"""Host-side NaViT-style sequence packing into static-shape device batches.

The variable-length token streams produced per image are greedily packed into
rows of at most `max_seq_len` tokens (reference:
feature_extraction_dct_autoencoder.py:454-605).  XLA wants static shapes, so
packing is host-side numpy (vectorized per row, no per-token Python loops) and
yields dense `(b, max_seq_len)` arrays + masks that flow through jit unchanged.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from .container import DCTPatches


@dataclasses.dataclass
class GroupPatchesState:
    """Carry-over packing state across dataloader pulls.

    Mirrors reference GroupPatchesState (feature_extraction...py:96-104):
    `groups` is a list of completed rows, each row a list of per-image
    (patches, positions, channels) numpy triples; `group` is the open row.
    """

    groups: List[List[Tuple[np.ndarray, np.ndarray, np.ndarray]]]
    group: List[Tuple[np.ndarray, np.ndarray, np.ndarray]]
    seq_len: int

    @staticmethod
    def empty() -> "GroupPatchesState":
        return GroupPatchesState(groups=[], group=[], seq_len=0)


def group_patches_by_max_seq_len(
    items: List[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    max_seq_len: int,
    state: Optional[GroupPatchesState] = None,
) -> GroupPatchesState:
    """Greedy first-fit packing (reference feature_extraction...py:454-513).

    items: list of (patches (k, pz), positions (k, 2), channels (k,)).
    A row is closed as soon as the next image would overflow it.
    """
    if state is None:
        state = GroupPatchesState.empty()

    for patches, pos, channels in items:
        k = patches.shape[0]
        assert k <= max_seq_len, f"image with {k} tokens exceeds max_seq_len {max_seq_len}"
        assert pos.shape[0] == k and channels.shape[0] == k

        if state.seq_len + k > max_seq_len:
            state.groups.append(state.group)
            state.group = []
            state.seq_len = 0

        state.group.append((patches, pos, channels))
        state.seq_len += k

    return state


def batch_groups(
    groups: List[List[Tuple[np.ndarray, np.ndarray, np.ndarray]]],
    max_seq_len: int,
    patch_sizes: Tuple[Tuple[int, int], ...] = (),
    original_sizes: Tuple[Tuple[int, int], ...] = (),
    _data: Optional[Dict[str, List[Any]]] = None,
    dtype=np.float32,
    with_attn_mask: bool = True,
) -> DCTPatches:
    """Collate completed rows into a static-shape DCTPatches batch.

    Reference: feature_extraction...py:515-605.  Builds, per row: concatenated
    patch tokens right-padded to max_seq_len, per-token image ids, the key
    padding mask, and (with_attn_mask) the block-diagonal attention mask
    `(ids_i == ids_j) & ~pad_j`.  The model itself derives masking from the
    ids, so hot paths can skip the O(b*s^2) mask with with_attn_mask=False.

    Buffer assembly runs in the native packing runtime when built
    (ext/packing.cpp), with a numpy fallback.
    """
    from . import native

    b = len(groups)
    s = max_seq_len

    flat: List[Tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    row_ids: List[int] = []
    image_slot: List[int] = []
    row_offsets: List[int] = []
    for row_i, row in enumerate(groups):
        offset = 0
        for slot, item in enumerate(row):
            flat.append(item)
            row_ids.append(row_i)
            image_slot.append(slot)
            row_offsets.append(offset)
            offset += item[0].shape[0]

    pz = flat[0][0].shape[-1] if flat else 0
    lengths = np.asarray([p.shape[0] for p, _, _ in flat], dtype=np.int64)
    if flat:
        cat_patches = np.concatenate([np.asarray(p, dtype=np.float32) for p, _, _ in flat])
        cat_positions = np.concatenate([np.asarray(pos, dtype=np.int32) for _, pos, _ in flat])
        cat_channels = np.concatenate([np.asarray(ch, dtype=np.int32) for _, _, ch in flat])
    else:
        cat_patches = np.zeros((0, pz), dtype=np.float32)
        cat_positions = np.zeros((0, 2), dtype=np.int32)
        cat_channels = np.zeros((0,), dtype=np.int32)

    patches, positions, channels, image_ids, key_pad_mask = native.fill_batch(
        cat_patches,
        cat_positions,
        cat_channels,
        lengths,
        np.asarray(row_ids, dtype=np.int64),
        np.asarray(image_slot, dtype=np.int64),
        np.asarray(row_offsets, dtype=np.int64),
        b,
        s,
    )

    attn_mask = None
    if with_attn_mask:
        attn_mask = jnp.asarray(native.build_attn_mask(image_ids, key_pad_mask)[:, None])

    data_tuple = None
    if _data:
        data_tuple = tuple((k, tuple(v)) for k, v in _data.items())

    return DCTPatches(
        patches=jnp.asarray(patches.astype(dtype) if dtype != np.float32 else patches),
        key_pad_mask=jnp.asarray(key_pad_mask),
        attn_mask=attn_mask,
        batched_image_ids=jnp.asarray(image_ids),
        patch_channels=jnp.asarray(channels),
        patch_positions=jnp.asarray(positions),
        patch_sizes=tuple(tuple(ps) for ps in patch_sizes),
        original_sizes=tuple(tuple(os) for os in original_sizes),
        _data=data_tuple,
    )
