"""JPEG zigzag ordering as static permutations.

The reference builds the zigzag index grid with a Python walk and applies it
with scatter/gather at runtime (reference: dct_autoencoder/util.py:231-331).
Here the walk happens once on host (cached per (h, w)) and application is a
static `take` — XLA compiles a static permutation to a copy, no scatter needed.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp


@lru_cache(maxsize=None)
def zigzag(h: int, w: int) -> np.ndarray:
    """(h, w) int array: entry [r, c] is that cell's rank in zigzag order.

    Matches reference util.py:231-273 (JPEG codec diagonal walk).
    """
    out = np.empty((h, w), dtype=np.int64)
    row, col = 0, 0
    for rank in range(h * w):
        out[row, col] = rank
        up_right = (row + col) % 2 == 0
        if up_right:
            if col == w - 1:
                row += 1
            elif row == 0:
                col += 1
            else:
                row -= 1
                col += 1
        else:
            if row == h - 1:
                col += 1
            elif col == 0:
                row += 1
            else:
                row += 1
                col -= 1
    return out


@lru_cache(maxsize=None)
def _inverse_zigzag_perm(h: int, w: int) -> np.ndarray:
    """perm such that flat_zigzag[k] = x_rowmajor[perm[k]]."""
    return np.argsort(zigzag(h, w).reshape(-1))


def flatten_zigzag(x: jnp.ndarray) -> jnp.ndarray:
    """Flatten trailing (h, w) axes in zigzag order (reference util.py:276-295)."""
    h, w = x.shape[-2], x.shape[-1]
    perm = jnp.asarray(_inverse_zigzag_perm(h, w))
    flat = x.reshape(*x.shape[:-2], h * w)
    return jnp.take(flat, perm, axis=-1)


def unflatten_zigzag(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Inverse of flatten_zigzag (reference util.py:298-311)."""
    perm = jnp.asarray(zigzag(h, w).reshape(-1))
    return jnp.take(x, perm, axis=-1).reshape(*x.shape[:-1], h, w)


class ZigzagFlattener:
    """Stateful (h, w)-bound zigzag helper (reference util.py:314-331)."""

    def __init__(self, h: int, w: int):
        self.h = h
        self.w = w
        self.zigzag = zigzag(h, w)

    def flatten(self, x: jnp.ndarray) -> jnp.ndarray:
        assert x.shape[-2] == self.h and x.shape[-1] == self.w
        return flatten_zigzag(x)

    def unflatten(self, x: jnp.ndarray) -> jnp.ndarray:
        return unflatten_zigzag(x, self.h, self.w)
