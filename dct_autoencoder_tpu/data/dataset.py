"""Streaming dataset pipelines (reference: dct_autoencoder/dataset.py).

Two sources feed training:
  * raw image shards (jpg + json metadata) -> resolution filter -> resize cap
    -> on-device preprocess (IPT+DCT+patchify+importance sampling);
  * preprocessed shards written by tools/preproc_dataset.py (or by the
    reference's preproc script — .pth tensors decode too).

Plus the list-of-dicts column collate the packing generator consumes
(reference dataset.py:8-25).
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, Iterator, List, Optional, Tuple

import numpy as np

from ..patches.extractor import DCTAutoencoderFeatureExtractor
from .shards import WebDatasetReader, warn_and_continue


def dict_collate(rows: List[Dict]) -> Dict[str, List]:
    """List of row dicts -> dict of column lists (reference dataset.py:8-15)."""
    assert len(rows) > 0
    columns = rows[0].keys()
    out: Dict[str, List] = {k: [] for k in columns}
    for row in rows:
        for k in columns:
            out[k].append(row[k])
    return out


def tuple_collate(rows: List[Tuple]) -> List[List]:
    """List of row tuples -> list of column lists (reference dataset.py:18-25)."""
    assert len(rows) > 0
    n = len(rows[0])
    out: List[List] = [[] for _ in range(n)]
    for row in rows:
        for i, col in enumerate(row):
            out[i].append(col)
    return out


def batched(stream: Iterable[Dict], batch_size: int) -> Iterator[Dict[str, List]]:
    """Group a sample stream into collated column-dict batches (DataLoader stand-in)."""
    buf: List[Dict] = []
    for row in stream:
        buf.append(row)
        if len(buf) == batch_size:
            yield dict_collate(buf)
            buf = []
    if buf:
        yield dict_collate(buf)


def _resize_cap(im: np.ndarray, max_size: int) -> np.ndarray:
    """Cap the longest side at max_size with antialiased resize (PIL)."""
    _, h, w = im.shape
    if max(h, w) <= max_size:
        return im
    from PIL import Image

    ar = h / w
    if h > w:
        nh, nw = max_size, int(max_size / ar)
    else:
        nw, nh = max_size, int(ar * max_size)
    pil = Image.fromarray((im.transpose(1, 2, 0) * 255).astype(np.uint8))
    pil = pil.resize((nw, nh), Image.BICUBIC)
    return np.asarray(pil, dtype=np.float32).transpose(2, 0, 1) / 255.0


def load_and_transform_dataset(
    dataset_url: str,
    dct_processor: DCTAutoencoderFeatureExtractor,
    shuffle_buffer: int = 0,
    seed: int = 0,
    process_index: int = 0,
    process_count: int = 1,
    min_res_factor: int = 12,
) -> Iterator[Dict[str, Any]]:
    """Raw image shards -> per-image preprocess dicts (reference dataset.py:35-89).

    Filters out images below 12x patch_size, caps the longest side at
    max(768, patch_size * max_patch) before the on-device DCT.
    """
    min_res = dct_processor.patch_size * min_res_factor
    max_size = max(
        dct_processor.patch_size
        * max(dct_processor.max_patch_w, dct_processor.max_patch_h),
        768,
    )

    reader = WebDatasetReader(
        dataset_url,
        shuffle_buffer=shuffle_buffer,
        seed=seed,
        process_index=process_index,
        process_count=process_count,
    )

    for sample in reader:
        try:
            meta = sample.get("json")
            im = None
            for k in ("jpg", "jpeg", "png"):
                if k in sample:
                    im = sample[k]
                    break
            if im is None:
                continue
            if meta is not None:
                h, w = meta.get("height"), meta.get("width")
                if h is None or w is None or h < min_res or w < min_res:
                    continue
            else:
                if im.shape[1] < min_res or im.shape[2] < min_res:
                    continue
            im = _resize_cap(im, max_size)
            d = dct_processor.preprocess(im)
            extra = {
                k: v
                for k, v in sample.items()
                if k not in ("jpg", "jpeg", "png", "json", "__key__")
            }
            d.update(extra)
            yield d
        except Exception as e:
            if not warn_and_continue(e):
                raise


def load_preprocessed_dataset(
    dataset_url: str,
    shuffle_buffer: int = 0,
    seed: int = 0,
    process_index: int = 0,
    process_count: int = 1,
) -> Iterator[Dict[str, Any]]:
    """Preprocessed shards -> per-image token dicts (reference dataset.py:27-33).

    Accepts both this framework's .npy fields and the reference's .pth fields.
    """
    reader = WebDatasetReader(
        dataset_url,
        shuffle_buffer=shuffle_buffer,
        seed=seed,
        process_index=process_index,
        process_count=process_count,
    )
    for sample in reader:
        d: Optional[Dict[str, Any]] = None
        for suffix in ("npy", "pth"):
            if f"patches.{suffix}" in sample:
                d = dict(
                    patches=np.asarray(sample[f"patches.{suffix}"]),
                    positions=np.asarray(sample[f"positions.{suffix}"]),
                    channels=np.asarray(sample[f"channels.{suffix}"]),
                    original_sizes=tuple(sample["original_size.pyd"]),
                    patch_sizes=tuple(sample["patch_size.pyd"]),
                )
                break
        if d is not None:
            yield d
