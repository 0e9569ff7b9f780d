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
) -> DCTPatches:
    """Collate completed rows into a static-shape DCTPatches batch.

    Reference: feature_extraction...py:515-605.  Builds, per row: concatenated
    patch tokens right-padded to max_seq_len, per-token image ids, the key
    padding mask, and the block-diagonal attention mask
    `(ids_i == ids_j) & ~pad_j`.
    """
    b = len(groups)
    s = max_seq_len
    pz = groups[0][0][0].shape[-1] if b and groups[0] else 0
    for row in groups:
        for p, _, _ in row:
            pz = p.shape[-1]
            break
        if pz:
            break

    patches = np.zeros((b, s, pz), dtype=dtype)
    positions = np.zeros((b, s, 2), dtype=np.int32)
    channels = np.zeros((b, s), dtype=np.int32)
    image_ids = np.zeros((b, s), dtype=np.int32)
    lengths = np.zeros((b,), dtype=np.int32)

    for row_i, row in enumerate(groups):
        offset = 0
        for image_id, (p, pos, ch) in enumerate(row):
            k = p.shape[0]
            patches[row_i, offset : offset + k] = p
            positions[row_i, offset : offset + k] = pos
            channels[row_i, offset : offset + k] = ch
            image_ids[row_i, offset : offset + k] = image_id
            offset += k
        lengths[row_i] = offset

    key_pad_mask = lengths[:, None] <= np.arange(s)[None, :]
    attn_mask = (image_ids[:, None, :, None] == image_ids[:, None, None, :]) & (
        ~key_pad_mask[:, None, None, :]
    )

    data_tuple = None
    if _data:
        data_tuple = tuple((k, tuple(v)) for k, v in _data.items())

    return DCTPatches(
        patches=jnp.asarray(patches),
        key_pad_mask=jnp.asarray(key_pad_mask),
        attn_mask=jnp.asarray(attn_mask),
        batched_image_ids=jnp.asarray(image_ids),
        patch_channels=jnp.asarray(channels),
        patch_positions=jnp.asarray(positions),
        patch_sizes=tuple(tuple(ps) for ps in patch_sizes),
        original_sizes=tuple(tuple(os) for os in original_sizes),
        _data=data_tuple,
    )
