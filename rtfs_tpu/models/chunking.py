"""Sequence chunking utilities: 50%-overlap split/merge + band-split widths.

Counterparts of the reference ``src/models/utils/utils.py:9-77`` — used by
legacy dual-path / band-split variants, and the substrate for
sequence-sharded execution of long utterances (split chunks over a mesh
axis, merge with overlap-add).

Layout: channels-last (B, T, C).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np


def pad_segment(x: jnp.ndarray, block_size: int) -> Tuple[jnp.ndarray, int]:
    """Pad (B, T, C) so T splits into 50%-overlapping blocks."""
    b, t, c = x.shape
    stride = block_size // 2
    rest = block_size - (stride + t % block_size) % block_size
    if rest > 0:
        x = jnp.pad(x, ((0, 0), (0, rest), (0, 0)))
    x = jnp.pad(x, ((0, 0), (stride, stride), (0, 0)))
    return x, rest


def split_feature(x: jnp.ndarray, block_size: int) -> Tuple[jnp.ndarray, int]:
    """(B, T, C) -> (B, K, block_size, C) 50%-overlapping chunks."""
    x, rest = pad_segment(x, block_size)
    b, t, c = x.shape
    stride = block_size // 2
    b1 = x[:, :-stride].reshape(b, -1, block_size, c)
    b2 = x[:, stride:].reshape(b, -1, block_size, c)
    block = jnp.stack([b1, b2], axis=2).reshape(b, -1, block_size, c)
    return block, rest


def merge_feature(x: jnp.ndarray, rest: int) -> jnp.ndarray:
    """Inverse of split_feature: (B, K, block_size, C) -> (B, T, C)."""
    b, k, block_size, c = x.shape
    stride = block_size // 2
    x = x.reshape(b, -1, block_size * 2, c)
    x1 = x[:, :, :block_size].reshape(b, -1, c)[:, stride:]
    x2 = x[:, :, block_size:].reshape(b, -1, c)[:, :-stride]
    out = x1 + x2
    if rest > 0:
        out = out[:, :-rest]
    return out


def get_bandwidths(win: int, sr: int = 16000) -> List[int]:
    """Band-split widths table (reference ``utils.py:58-77``)."""
    enc_dim = win // 2 + 1
    def bw(hz):
        return int(np.floor(hz / (sr / 2.0) * enc_dim))

    band_width = [bw(100)] * 5 + [bw(250)] * 6 + [bw(500)] * 4 + [bw(1000)] * 4
    if sr > 160000:
        band_width += [bw(2000)]
    assert enc_dim > int(np.sum(band_width))
    band_width.append(enc_dim - int(np.sum(band_width)))
    return band_width
