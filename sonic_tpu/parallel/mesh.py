"""Device mesh + sharded MSM — the multi-chip scaling layer.

The reference is single-threaded (SURVEY.md §2.3 parallelism inventory:
none); scaling here is additive and maps onto the math: MSM lanes and SRS
degree ranges shard across a `jax.sharding.Mesh`, and XLA/GSPMD inserts the
collectives (bucket-grid tree reduction -> cross-device point adds).

Design: the Pippenger lane axis (K) is the data-parallel axis. Each device
scans its own lane slice (embarrassingly parallel, zero communication);
the lane-fold tree then reduces across devices — log2(ndev) rounds of
batched Jacobian adds riding ICI, followed by local folds.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..curve.group import GroupOps, Jacobian, Affine, g1
from ..msm import pippenger


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis,))


def shard_leading(arr, mesh: Mesh, axis: str = "shard"):
    """Place an array with its leading axis sharded over the mesh."""
    spec = P(axis, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


@partial(jax.jit, static_argnums=(0, 2))
def _fold_local_lanes(group: GroupOps, buckets, ndev: int):
    """(K, W, B) bucket grids, K sharded over ndev devices -> (ndev, W, B).

    Reshapes the sharded lane axis to (ndev, lanes_per_device) — the outer
    axis keeps the sharding, so the scan over the inner axis is
    communication-free on every device (GSPMD partitions it trivially)."""
    K = buckets.x.shape[0]
    lpd = K // ndev

    def split(a):
        return jnp.moveaxis(a.reshape((ndev, lpd) + a.shape[1:]), 1, 0)

    per = jax.tree.map(split, buckets)  # (lpd, ndev, W, B)
    init = jax.tree.map(lambda a: a[0], per)
    rest = jax.tree.map(lambda a: a[1:], per)

    def step(acc, cur):
        return group.add(acc, Jacobian(*cur)), None

    if lpd == 1:
        return init
    acc, _ = jax.lax.scan(step, init, tuple(rest))
    return acc


def msm_sharded(
    group: GroupOps,
    points: Affine,
    scalars_std: jnp.ndarray,
    mesh: Mesh,
    c: int | None = None,
    lanes_per_device: int = 8,
    axis: str = "shard",
    signed: bool = True,
) -> Jacobian:
    """MSM with points/scalars sharded over the mesh's lane axis.

    Reuses the exact single-chip phase kernels (msm/pippenger.py): inputs
    are laid out lane-major with the lane axis sharded, so the bucket scan
    runs communication-free per device; lanes then fold locally on each
    device (communication-free scan) and the final ndev partial grids
    tree-reduce across the mesh (GSPMD collectives over ICI).
    """
    ndev = mesh.devices.size
    K = lanes_per_device * ndev
    n = scalars_std.shape[0]
    if c is None:
        # same window policy as pippenger.msm: small MSMs favor fewer
        # buckets; large ones amortize the bucket scans over more points.
        c = pippenger._pick_c(n)
    n_pad = K
    while n_pad < n:
        n_pad *= 2
    pad = n_pad - n
    if pad:
        zero_limbs = jnp.zeros((pad,) + points.x.shape[1:], jnp.uint32)
        points = Affine(
            jnp.concatenate([points.x, zero_limbs], 0),
            jnp.concatenate([points.y, zero_limbs], 0),
            jnp.concatenate([points.inf, jnp.ones((pad,), bool)], 0),
        )
        scalars_std = jnp.concatenate(
            [scalars_std, jnp.zeros((pad, scalars_std.shape[1]), jnp.uint32)],
            0,
        )
    steps = n_pad // K
    digs, nbuckets = pippenger._prep_digits(scalars_std, c, signed)
    W = digs.shape[-1]
    tail = points.x.shape[1:]

    pts = Affine(
        shard_leading(points.x.reshape((K, steps) + tail), mesh, axis),
        shard_leading(points.y.reshape((K, steps) + tail), mesh, axis),
        shard_leading(points.inf.reshape(K, steps), mesh, axis),
    )
    pdig = shard_leading(digs.reshape(K, steps, W), mesh, axis)

    # allow_pallas=False: the Pallas accumulate kernel assumes a single
    # unsharded 128-lane grid; under GSPMD sharding the K = lanes*ndev
    # axis can hit the kernel's dispatch condition (e.g. 16 devices x 8
    # lanes) with per-device shapes it was never built for. The dense jnp
    # scan partitions correctly and is bit-identical.
    buckets = pippenger._accumulate_buckets(
        group, pts, pdig, nbuckets, signed, allow_pallas=False
    )
    buckets = _fold_local_lanes(group, buckets, ndev)  # (ndev, W, B)
    buckets = pippenger._fold_lanes(group, buckets)  # cross-device
    totals = pippenger._bucket_weighted_sum(group, buckets)
    return pippenger._window_combine(group, totals, c)
