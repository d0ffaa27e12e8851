"""Device mesh helpers.

The reference is single-GPU (SURVEY.md §2.5); multi-chip support here is
a new first-class component: a ``Mesh`` with a ``data`` axis for batch
(data-parallel) sharding and a ``time`` axis for sharding long
spectrogram time axes (the sequence-parallel analog used by
``parallel.halo``).  Within a slice the collectives ride ICI; XLA
inserts them from sharding annotations (GSPMD) — no hand-written
transport.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_time: int = 1,
              devices=None) -> Mesh:
    """Mesh over ('data', 'time').  Defaults to all devices on 'data'."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_time
    dev = np.asarray(devices[:n_data * n_time]).reshape(n_data, n_time)
    return Mesh(dev, ("data", "time"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def time_sharding(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    """Shard the trailing (time) axis of a (..., F, T) array over 'time'."""
    spec = [None] * (ndim - 1) + ["time"]
    return NamedSharding(mesh, P(*spec))
