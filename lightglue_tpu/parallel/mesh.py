"""Device-mesh helpers.

The reference has no distributed layer (SURVEY.md §2d — no NCCL/MPI anywhere);
on TPU, scaling out is a first-class concern: throughput-oriented matching is
data-parallel over the ``pairs`` batch axis across ICI-connected chips, with
params replicated. These helpers centralize mesh construction and shardings
so model code stays sharding-agnostic (pure functions over pytrees) and the
placement lives at the call boundary, jax-style.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices (or all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    if len(axis_names) == 1:
        arr = np.asarray(devices)
    else:
        raise NotImplementedError("only 1-D meshes for now")
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across ``axis``; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
