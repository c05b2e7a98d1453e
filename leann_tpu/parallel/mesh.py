"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_sizes: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("dp", "shard"),
    devices=None,
) -> Mesh:
    """Mesh over available devices. Default: put everything on `shard`
    (corpus parallel), dp=1; pass axis_sizes to split, e.g. (2, 4)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (1, n)
    if int(np.prod(axis_sizes)) != n:
        raise ValueError(f"axis sizes {axis_sizes} != device count {n}")
    arr = np.asarray(devices).reshape(axis_sizes)
    return Mesh(arr, tuple(axis_names)[: arr.ndim])
