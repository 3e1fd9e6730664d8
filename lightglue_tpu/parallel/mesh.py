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
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Data-parallel mesh over the first ``n_devices`` devices (or all).

    Multi-host serving topology: a 2-axis mesh ``axis_names=("dcn", "data")``
    with ``shape=(n_hosts, chips_per_host)`` — the outer axis spans hosts
    over DCN, the inner axis chips over ICI. Batch data parallelism shards
    pairs over BOTH axes (P(("dcn", "data"))): each pair stays on one chip,
    so the forward needs no collectives at all and DCN only carries input
    dispatch/result gather — the layout where DCN bandwidth cannot hurt
    step time.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    arr = np.asarray(devices)
    if shape is not None:
        arr = arr.reshape(tuple(shape))
    elif len(axis_names) > 1:
        raise ValueError("multi-axis mesh needs an explicit shape")
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis=None) -> NamedSharding:
    """Shard the leading (batch) axis across ``axis`` (default: ALL mesh
    axes, so 2-axis host x chip meshes flatten onto the batch); replicate
    the rest."""
    if axis is None:
        axis = tuple(mesh.axis_names)
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
