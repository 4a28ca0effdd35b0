"""Multi-scalar multiplication (Pippenger) for TPU.

Replaces the reference's serial MSM folds (`CommitmentScheme.hs:26-29,45-48`
— every commit and opening is one of these) with a lane-parallel bucket
method:

  - scalars are split into W windows of c bits (digits);
  - points are split across K independent lanes; a lax.scan walks each
    lane's chunk, adding one point per lane per step into its (lane, window,
    digit) bucket — K*W batched mixed additions per step, with no index
    collisions inside a step;
  - lanes are tree-reduced, buckets weighted-summed (running-sum trick),
    windows combined with c doublings each.

Total group work ~ N*W additions (optimal Pippenger work) with K*W-way
batch parallelism in the dominant phase.

The three phases are SEPARATELY jitted and orchestrated from Python: XLA
compile time is superlinear in module size, and the phases reuse each
other's cache across calls. The same phase kernels run per-shard in the
multi-chip path (sonic_tpu/parallel), with partial bucket grids combined
over the mesh.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..curve.group import GroupOps, Jacobian, Affine, g1, g2
from ..fields import constants as C

# Window size (bits) and lane count. c must divide LIMB_BITS.
DEFAULT_C = 8
DEFAULT_LANES = 64


def _digits(scalars_std: jnp.ndarray, c: int) -> jnp.ndarray:
    """(N, FR_LIMBS) standard-form limbs -> (N, W) c-bit digits, little-endian
    windows. c must divide the 16-bit limb size."""
    assert C.LIMB_BITS % c == 0
    per_limb = C.LIMB_BITS // c
    mask = np.uint32((1 << c) - 1)
    parts = [(scalars_std >> np.uint32(c * i)) & mask for i in range(per_limb)]
    stacked = jnp.stack(parts, axis=-1)  # (N, L, per_limb)
    return stacked.reshape(scalars_std.shape[:-1] + (-1,)).astype(jnp.int32)


@partial(jax.jit, static_argnums=(0, 3))
def _accumulate_buckets(
    group: GroupOps, points: Affine, digits: jnp.ndarray, c: int
) -> Jacobian:
    """Scan phase: points (K, T, ...), digits (K, T, W) -> buckets
    (K, W, 2^c) Jacobian. Digit 0 lands in a trash bucket (never read)."""
    K, T = digits.shape[0], digits.shape[1]
    W = digits.shape[2]
    nbuckets = 1 << c
    buckets = group.infinity((K, W, nbuckets))
    k_idx = jnp.arange(K)[:, None]
    w_idx = jnp.arange(W)[None, :]

    def step(buckets, xs):
        x_t, y_t, inf_t, dig_t = xs  # (K, ...), (K,), (K, W)
        cur = Jacobian(
            buckets.x[k_idx, w_idx, dig_t],
            buckets.y[k_idx, w_idx, dig_t],
            buckets.z[k_idx, w_idx, dig_t],
        )
        q = Affine(
            x_t[:, None],
            y_t[:, None],
            jnp.broadcast_to(inf_t[:, None], (K, W)),
        )
        new = group.add_mixed(cur, q)
        buckets = Jacobian(
            buckets.x.at[k_idx, w_idx, dig_t].set(new.x),
            buckets.y.at[k_idx, w_idx, dig_t].set(new.y),
            buckets.z.at[k_idx, w_idx, dig_t].set(new.z),
        )
        return buckets, None

    xs = (
        jnp.moveaxis(points.x, 1, 0),
        jnp.moveaxis(points.y, 1, 0),
        jnp.moveaxis(points.inf, 1, 0),
        jnp.moveaxis(digits, 1, 0),
    )
    buckets, _ = jax.lax.scan(step, buckets, xs)
    return buckets


@partial(jax.jit, static_argnums=0)
def _fold_lanes(group: GroupOps, buckets: Jacobian) -> Jacobian:
    """Reduce the leading (lane) axis to nothing: (K, W, B) -> (W, B).

    A lax.scan of K-1 batched adds — same total group work as a tree fold
    (the W*B batch already saturates the vector units), but the add body
    compiles ONCE at the (W, B) shape instead of log2(K) tree rounds each
    compiling at a different shape (XLA compile time dominates the CPU
    test/dryrun path)."""
    if buckets.x.shape[0] == 1:
        return jax.tree.map(lambda a: a[0], buckets)
    init = jax.tree.map(lambda a: a[0], buckets)
    rest = jax.tree.map(lambda a: a[1:], buckets)

    def step(acc, cur):
        return group.add(acc, Jacobian(*cur)), None

    acc, _ = jax.lax.scan(step, init, tuple(rest))
    return acc


@partial(jax.jit, static_argnums=0)
def _bucket_weighted_sum(group: GroupOps, buckets: Jacobian) -> Jacobian:
    """(W, B) buckets -> (W,) window totals: sum_b b*B_b by running sums."""
    nbuckets = buckets.x.shape[1]
    W = buckets.x.shape[0]

    def bucket_step(carry, b_rev):
        racc, total = carry
        cur = jax.tree.map(lambda a: a[:, b_rev], buckets)
        racc = group.add(racc, Jacobian(*cur))
        total = group.add(total, racc)
        return (racc, total), None

    init = (group.infinity((W,)), group.infinity((W,)))
    (_, totals), _ = jax.lax.scan(
        bucket_step, init, jnp.arange(nbuckets - 1, 0, -1)
    )
    return totals


@partial(jax.jit, static_argnums=(0, 2))
def _window_combine(group: GroupOps, totals: Jacobian, c: int) -> Jacobian:
    """(W,) window totals -> final point: result = sum_w totals[w] << (c w)."""
    W = totals.x.shape[0]

    def window_step(res, w_rev):
        # inner scan: the double body compiles once, not c times
        res, _ = jax.lax.scan(
            lambda r, _: (group.double(r), None), res, None, length=c
        )
        cur = jax.tree.map(lambda a: a[w_rev], totals)
        return group.add(res, Jacobian(*cur)), None

    res, _ = jax.lax.scan(
        window_step, group.infinity(()), jnp.arange(W - 1, -1, -1)
    )
    return res


def msm(
    group: GroupOps,
    points: Affine,
    scalars_std: jnp.ndarray,
    c: int | None = None,
    lanes: int = DEFAULT_LANES,
) -> Jacobian:
    """Sum_i scalars[i] * points[i].

    points: Affine batch with leading axis N. scalars_std: (N, FR_LIMBS)
    uint32 in STANDARD (non-Montgomery) form. Returns unbatched Jacobian.

    Python-orchestrated pipeline of jitted phases (see module docstring).
    """
    n = scalars_std.shape[0]
    if c is None:
        # small MSMs: fewer buckets (short weighted-sum scan) wins; the
        # extra windows cost little at these sizes.
        c = 4 if n <= 1024 else DEFAULT_C
    # Pad N to a power of two: zero scalars contribute nothing (digit-0
    # trash bucket) and infinity points are absorbed by add_mixed, while
    # the compiled phase programs get reused across the protocol's many
    # different commit/open sizes.
    n_pad = 1
    while n_pad < n:
        n_pad *= 2
    K = min(lanes, max(1, n_pad))
    pad = n_pad - n
    if pad:
        zero_limbs = jnp.zeros((pad,) + points.x.shape[1:], jnp.uint32)
        points = Affine(
            jnp.concatenate([points.x, zero_limbs], 0),
            jnp.concatenate([points.y, zero_limbs], 0),
            jnp.concatenate([points.inf, jnp.ones((pad,), bool)], 0),
        )
        scalars_std = jnp.concatenate(
            [scalars_std, jnp.zeros((pad, scalars_std.shape[1]), jnp.uint32)], 0
        )
    steps = (n + pad) // K

    digs = _digits(scalars_std, c)  # (N', W)
    W = digs.shape[-1]
    coord_tail = points.x.shape[1:]
    pts = Affine(
        points.x.reshape((K, steps) + coord_tail),
        points.y.reshape((K, steps) + coord_tail),
        points.inf.reshape(K, steps),
    )
    pdig = digs.reshape(K, steps, W)

    buckets = _accumulate_buckets(group, pts, pdig, c)
    buckets = _fold_lanes(group, buckets)  # (W, B, ...)
    totals = _bucket_weighted_sum(group, buckets)
    return _window_combine(group, totals, c)


def msm_g1(points, scalars_std, c=None, lanes=DEFAULT_LANES):
    return msm(g1, points, scalars_std, c, lanes)


def msm_g2(points, scalars_std, c=None, lanes=DEFAULT_LANES):
    return msm(g2, points, scalars_std, c, lanes)
