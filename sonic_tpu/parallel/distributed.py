"""Multi-host (multi-process) runtime — jax.distributed + global meshes.

SURVEY.md §5 lists the distributed communication backend as a first-class
component even though the reference has none: scaling past one host rides
`jax.distributed.initialize` + a global device mesh, with XLA/GSPMD
inserting ICI collectives inside a slice and DCN collectives across
slices. Every sharded entry point in this package (`prove(mesh=...)`,
`msm_sharded`, `ntt_sharded`, `SRS.new(mesh=...)`) takes an explicit
`jax.sharding.Mesh` and is agnostic to whether its devices span
processes — this module only standardizes process bring-up and mesh
construction.

Single-host virtual testing: `XLA_FLAGS=--xla_force_host_platform_device
_count=N` (tests/conftest.py) exercises the same code paths on one
process; the driver's dryrun compiles + executes the full sharded prove
that way.
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import make_mesh


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Bring up the multi-process runtime (idempotent; no-op when
    single-process).

    Arguments default from the standard env (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) — the same contract as
    jax.distributed.initialize, which also auto-detects on supported
    cluster schedulers (GKE/Slurm). After this, jax.devices() is GLOBAL
    (every chip in the slice) and jax.local_devices() is this host's.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None
    if coordinator_address is None and num_processes in (None, 1):
        return  # single-process: nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis: str = "shard") -> Mesh:
    """1-D mesh over ALL devices (every process's chips).

    Device order follows jax.devices() — processes grouped together, so a
    contiguous leading-axis shard lands on one host and collectives
    between neighboring shards ride ICI before DCN.
    """
    return Mesh(np.array(jax.devices()), (axis,))


def local_mesh(axis: str = "shard") -> Mesh:
    """Mesh over this process's local devices only."""
    return Mesh(np.array(jax.local_devices()), (axis,))


def host_slice_mesh(hosts_axis: str = "dcn", chips_axis: str = "ici") -> Mesh:
    """2-D (processes, chips-per-process) mesh: shard cross-host work on
    `dcn` (e.g. independent proof batches) and intra-host work on `ici`
    (e.g. MSM lanes, NTT rows) so heavy collectives stay on ICI."""
    n_proc = jax.process_count()
    devs = np.array(jax.devices())
    per = devs.size // n_proc
    return Mesh(devs.reshape(n_proc, per), (hosts_axis, chips_axis))
