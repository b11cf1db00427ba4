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


def make_mesh(n_devices: int | None = None, *, axis: str = EDGE_AXIS,
              allow_cpu_fallback: bool = True) -> Mesh:
    """1D device mesh over the default backend's devices.

    When more devices are requested than the default backend has (e.g. a
    dry-run of an 8-chip sharding on a 1-chip host), fall back to virtual
    CPU devices -- ``--xla_force_host_platform_device_count`` controls how
    many exist.  Note remote-attached TPU plugins may ignore a
    ``JAX_PLATFORMS=cpu`` environment override, so the fallback asks for the
    CPU backend explicitly."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs) and allow_cpu_fallback:
        try:
            cpu = jax.devices("cpu")
            if len(cpu) >= n_devices:
                devs = cpu
        except RuntimeError:
            pass
    if n_devices > len(devs):
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    return jax.make_mesh((n_devices,), (axis,), devices=devs[:n_devices])


def edge_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(EDGE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
