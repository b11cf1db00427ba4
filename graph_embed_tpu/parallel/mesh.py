"""Device mesh helpers.

The reference is single-node shared-memory (OpenMP only, CMakeLists.txt:
18-24); the TPU-native scaling axis is the edge list sharded over a 1D mesh
with vertex-block sharding for the dense terms (SURVEY.md SS2.2, SS5
long-context row).  Collectives ride ICI via XLA -- no NCCL/MPI analogue
needed.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

EDGE_AXIS = "x"


def make_mesh(n_devices: int | None = None, *, axis: str = EDGE_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    return jax.make_mesh((n_devices,), (axis,), devices=devs[:n_devices])


def edge_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(EDGE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
