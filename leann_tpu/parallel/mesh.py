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


def init_distributed() -> bool:
    """Multi-host bring-up (SURVEY §2.4): call once per process before
    building a mesh that spans hosts. Initializes the JAX distributed
    runtime from the standard env contract
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or a
    managed-cluster environment jax can auto-detect). No-op on a single
    host — single-process meshes need no coordinator, and calling
    jax.distributed.initialize there would hang waiting for peers.

    Returns True when a multi-process runtime was (or already is)
    initialized. Corpus shards then ride local ICI inside each host's
    mesh slice; only the final [B, k] merge crosses DCN.
    """
    import os

    already = getattr(jax.distributed, "global_state", None)
    if already is not None and getattr(already, "client", None) is not None:
        return True
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    if not coord and not nproc:
        return False
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(nproc) if nproc else None,
        process_id=(int(os.environ["JAX_PROCESS_ID"])
                    if os.environ.get("JAX_PROCESS_ID") else None),
    )
    return True
