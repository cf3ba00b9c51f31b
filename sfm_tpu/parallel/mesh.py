"""Device mesh construction and sharding helpers.

NO reference counterpart — the reference is strictly single-GPU
(survey §2.6: `cudaGLSetGLDevice(0)` src/main.cpp:175, no NCCL/MPI).
The TPU framework scales over `jax.sharding.Mesh` with XLA collectives
riding ICI; DCN is only touched at host boundaries (image ingest,
checkpoints).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first n_devices local devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n_devices]), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded_leading(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def pad_to_multiple(n: int, m: int) -> int:
    return -(-n // m) * m
