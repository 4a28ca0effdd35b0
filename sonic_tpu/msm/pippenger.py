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

# Window size (bits) and lane count. 1 <= c <= 16.
DEFAULT_C = 8
DEFAULT_LANES = 64


def _pick_lanes(n_pad: int) -> int:
    """128 lanes on TPU (the fused Pallas accumulate runs one point
    stream per vector lane); 64 elsewhere."""
    if jax.default_backend() == "tpu" and n_pad >= 128:
        return 128
    return min(DEFAULT_LANES, max(1, n_pad))


def _pick_c(n: int) -> int:
    """Window size policy (signed digits). Scan-phase work is ~N*W mixed
    adds with W ~= 256/c + 1 against 2^(c-1) buckets.

    On TPU the dense accumulate streams the whole (K, W, B) grid every
    step (~N*W*B*coord_bytes*passes total), so with measured ~200 GB/s
    effective traffic and ~12 M adds/s the compute term (W*81 ns/point)
    and the traffic term (W*B*4.3 ns/point) balance at B ~ 17 -> c=5.
    Off-TPU the scatter accumulate prefers larger c (fewer scattered
    rows) once N amortizes the bucket scans."""
    if jax.default_backend() == "tpu":
        # fused Pallas accumulate: per-step cost = add formula (~W-prop)
        # + 12B one-hot selects; measured optimum c=6 (9.6 M adds/s)
        return 4 if n <= 256 else 6
    if n <= 256:
        return 4
    if n <= 4096:
        return 7
    if n <= 1 << 15:
        return 9
    return 10


def _digits(scalars_std: jnp.ndarray, c: int) -> jnp.ndarray:
    """(..., L) standard-form 16-bit limbs -> (..., W) c-bit digits,
    little-endian windows, W = ceil(16L / c). Any 1 <= c <= 16 (digits may
    straddle limb boundaries)."""
    assert 1 <= c <= C.LIMB_BITS
    L = scalars_std.shape[-1]
    total_bits = L * C.LIMB_BITS
    W = (total_bits + c - 1) // c
    mask = np.uint32((1 << c) - 1)
    cols = []
    for j in range(W):
        li, off = divmod(j * c, C.LIMB_BITS)
        v = scalars_std[..., li] >> np.uint32(off)
        if off + c > C.LIMB_BITS and li + 1 < L:
            v = v | (scalars_std[..., li + 1] << np.uint32(C.LIMB_BITS - off))
        cols.append(v & mask)
    return jnp.stack(cols, axis=-1).astype(jnp.int32)


def _signed_digits(scalars_std: jnp.ndarray, c: int) -> jnp.ndarray:
    """(..., L) limbs -> (..., W+1) signed digits in (-2^(c-1), 2^(c-1)].

    Standard signed-window recoding: digit v > 2^(c-1) becomes v - 2^c
    with a carry into the next window; the final carry gets its own
    top window. Halves the bucket count (index = |digit|, sign folds into
    a point negation — negating an affine point is just y -> -y)."""
    d = _digits(scalars_std, c)
    half = 1 << (c - 1)
    full = 1 << c
    W = d.shape[-1]
    outs = []
    carry = jnp.zeros(d.shape[:-1], jnp.int32)
    for j in range(W):
        v = d[..., j] + carry
        flip = v > half
        outs.append(jnp.where(flip, v - full, v))
        carry = flip.astype(jnp.int32)
    outs.append(carry)
    return jnp.stack(outs, axis=-1)


@partial(jax.jit, static_argnames=("c", "signed"))
def _digits_jit(scalars_std: jnp.ndarray, c: int, signed: bool):
    # one dispatch for the whole W-step recoding loop (it is ~100 cheap
    # elementwise ops; unjitted each was a separate device round-trip)
    if signed:
        return _signed_digits(scalars_std, c)
    return _digits(scalars_std, c)


def _prep_digits(scalars_std: jnp.ndarray, c: int, signed: bool):
    """-> (digits, nbuckets). Signed: buckets index |digit| in [0, 2^(c-1)];
    unsigned: [0, 2^c). Bucket 0 is trash either way."""
    nbuckets = ((1 << (c - 1)) + 1) if signed else (1 << c)
    return _digits_jit(scalars_std, c, signed), nbuckets


def _signed_point(group, y_t, dig_t, K, W):
    """Broadcast the affine y to (K, W) and negate where the signed digit
    is negative (point negation is y -> -y)."""
    y_b = jnp.broadcast_to(y_t[:, None], (K, W) + y_t.shape[1:])
    return group.F.select(
        dig_t < 0,
        jnp.broadcast_to(group.F.neg(y_t)[:, None], y_b.shape),
        y_b,
    )


@partial(jax.jit, static_argnums=(0, 3, 4))
def _accumulate_buckets_scatter(
    group: GroupOps,
    points: Affine,
    digits: jnp.ndarray,
    nbuckets: int,
    signed: bool = False,
) -> Jacobian:
    """Scatter-indexed scan phase: points (K, T, ...), digits (K, T, W) ->
    buckets (K, W, nbuckets) Jacobian. Digit 0 lands in a trash bucket
    (never read). Signed digits index |digit| and add -P (y negated) when
    the digit is negative.

    XLA:CPU lowers the batched gather/scatter well; on TPU scatter cost
    explodes superlinearly with K*B (measured 0.06-1.7 M adds/s vs the
    12 M adds/s the VPU sustains) — TPU uses the dense variant below.
    """
    K, T = digits.shape[0], digits.shape[1]
    W = digits.shape[2]
    buckets = group.infinity((K, W, nbuckets))
    k_idx = jnp.arange(K)[:, None]
    w_idx = jnp.arange(W)[None, :]

    def step(buckets, xs):
        x_t, y_t, inf_t, dig_t = xs  # (K, ...), (K,), (K, W)
        if signed:
            bidx = jnp.abs(dig_t)
            y_use = _signed_point(group, y_t, dig_t, K, W)
        else:
            bidx = dig_t
            y_use = y_t[:, None]
        cur = Jacobian(
            buckets.x[k_idx, w_idx, bidx],
            buckets.y[k_idx, w_idx, bidx],
            buckets.z[k_idx, w_idx, bidx],
        )
        q = Affine(
            x_t[:, None],
            y_use,
            jnp.broadcast_to(inf_t[:, None], (K, W)),
        )
        new = group.add_mixed(cur, q)
        buckets = Jacobian(
            buckets.x.at[k_idx, w_idx, bidx].set(new.x),
            buckets.y.at[k_idx, w_idx, bidx].set(new.y),
            buckets.z.at[k_idx, w_idx, bidx].set(new.z),
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


@partial(jax.jit, static_argnums=(0, 3, 4))
def _accumulate_buckets_dense(
    group: GroupOps,
    points: Affine,
    digits: jnp.ndarray,
    nbuckets: int,
    signed: bool = False,
) -> Jacobian:
    """Dense one-hot scan phase — same contract as the scatter variant,
    no gather/scatter ops.

    Per step, the current bucket row is read with a masked reduction over
    the bucket axis and written back with a select: the whole (K, W, B)
    grid streams through the VPU each step, so the phase is HBM-bandwidth
    bound at ~3*K*W*B*coord_bytes per step — vastly cheaper on TPU than
    XLA's serialized scatter (which also touches the grid, per element).
    Window size trades adds (W ~ 256/c) against bandwidth (B ~ 2^(c-1));
    the two balance near c=7 at 800 GB/s and 12 M adds/s.
    """
    K, T = digits.shape[0], digits.shape[1]
    W = digits.shape[2]
    buckets = group.infinity((K, W, nbuckets))
    iota_b = jnp.arange(nbuckets)
    cn = points.x.ndim - 2  # coord tail dims (1 for Fq, 2 for Fq2)

    def step(buckets, xs):
        x_t, y_t, inf_t, dig_t = xs  # (K, ...), (K,), (K, W)
        if signed:
            bidx = jnp.abs(dig_t)
            y_use = _signed_point(group, y_t, dig_t, K, W)
        else:
            bidx = dig_t
            y_use = jnp.broadcast_to(
                y_t[:, None], (K, W) + y_t.shape[1:]
            )
        onehot = bidx[:, :, None] == iota_b  # (K, W, B)
        mask = onehot.reshape(onehot.shape + (1,) * cn)

        def read(a):
            return jnp.where(mask, a, 0).sum(axis=2, dtype=a.dtype)

        cur = Jacobian(read(buckets.x), read(buckets.y), read(buckets.z))
        q = Affine(
            jnp.broadcast_to(x_t[:, None], (K, W) + x_t.shape[1:]),
            y_use,
            jnp.broadcast_to(inf_t[:, None], (K, W)),
        )
        new = group.add_mixed(cur, q)

        def write(a, n):
            return jnp.where(mask, jnp.expand_dims(n, 2), a)

        buckets = Jacobian(
            write(buckets.x, new.x),
            write(buckets.y, new.y),
            write(buckets.z, new.z),
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


def _accumulate_buckets(
    group: GroupOps,
    points: Affine,
    digits: jnp.ndarray,
    nbuckets: int,
    signed: bool = False,
    allow_pallas: bool = True,
) -> Jacobian:
    """Backend-dispatched bucket accumulation (bit-identical variants).

    TPU + G1 + signed digits at 128 lanes runs the fused Pallas kernel
    (VMEM-resident bucket grid — msm/pallas_acc.py); other combinations
    fall back to the dense (TPU) or scatter (CPU) jnp scans.
    `allow_pallas=False` forces the jnp variant — required under vmap or
    mesh sharding, where pallas_call is not GSPMD-partitionable (the
    batched paths pack instances into lanes instead)."""
    if jax.default_backend() == "tpu":
        # B <= 129 keeps the double-buffered (B, L, 128) out block in VMEM
        if (
            allow_pallas
            and group.name == "G1"
            and signed
            and digits.shape[0] == 128
            and nbuckets <= 129
        ):
            from .pallas_acc import accumulate_pallas

            return accumulate_pallas(points, digits, nbuckets)
        return _accumulate_buckets_dense(group, points, digits, nbuckets, signed)
    return _accumulate_buckets_scatter(group, points, digits, nbuckets, signed)


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


@partial(jax.jit, static_argnums=(0, 2))
def _msm_tail(group: GroupOps, buckets: Jacobian, c: int) -> Jacobian:
    """Fused tail: lane fold + bucket weighted sum + window combine as ONE
    jitted program (three separate dispatches cost ~120 ms of a 420 ms
    2^16 MSM on the tunnel backend — BENCH_NOTES.md phase split)."""
    folded = _fold_lanes(group, buckets)
    totals = _bucket_weighted_sum(group, folded)
    return _window_combine(group, totals, c)


@partial(jax.jit, static_argnums=(0, 2))
def _msm_tail_batched(group: GroupOps, buckets: Jacobian, c: int) -> Jacobian:
    """Vmapped fused tail for the batched MSM pipelines."""
    folded = jax.vmap(lambda b: _fold_lanes(group, b))(buckets)
    totals = jax.vmap(lambda b: _bucket_weighted_sum(group, b))(folded)
    return jax.vmap(lambda t: _window_combine(group, t, c))(totals)


def _pad_pow2_points(points: Affine, scalars_std: jnp.ndarray, scalar_axis=0):
    """Pad point/scalar count N to a power of two. Zero scalars contribute
    nothing (digit-0 trash bucket) and infinity points are absorbed by
    add_mixed, while the compiled phase programs get reused across the
    protocol's many different commit/open sizes."""
    n = points.x.shape[0]
    n_pad = 1
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
        widths = [(0, 0)] * scalars_std.ndim
        widths[scalar_axis] = (0, pad)
        scalars_std = jnp.pad(scalars_std, widths)
    return points, scalars_std, n_pad


def msm(
    group: GroupOps,
    points: Affine,
    scalars_std: jnp.ndarray,
    c: int | None = None,
    lanes: int | None = None,
    signed: bool = True,
) -> Jacobian:
    """Sum_i scalars[i] * points[i].

    points: Affine batch with leading axis N. scalars_std: (N, FR_LIMBS)
    uint32 in STANDARD (non-Montgomery) form. Returns unbatched Jacobian.

    Python-orchestrated pipeline of jitted phases (see module docstring).
    """
    n = scalars_std.shape[0]
    if c is None:
        c = _pick_c(n)
    points, scalars_std, n_pad = _pad_pow2_points(points, scalars_std)
    K = _pick_lanes(n_pad) if lanes is None else min(lanes, max(1, n_pad))
    steps = n_pad // K

    digs, nbuckets = _prep_digits(scalars_std, c, signed)  # (N', W)
    W = digs.shape[-1]
    coord_tail = points.x.shape[1:]
    pts = Affine(
        points.x.reshape((K, steps) + coord_tail),
        points.y.reshape((K, steps) + coord_tail),
        points.inf.reshape(K, steps),
    )
    pdig = digs.reshape(K, steps, W)

    buckets = _accumulate_buckets(group, pts, pdig, nbuckets, signed)
    return _msm_tail(group, buckets, c)


def msm_batched(
    group: GroupOps,
    points: Affine,
    scalars_std: jnp.ndarray,
    c: int | None = None,
    lanes: int | None = None,
    signed: bool = True,
    mesh=None,
) -> Jacobian:
    """M independent MSMs SHARING one point table: scalars (M, N, L) ->
    Jacobian batch (M,).

    The hsc helper's m commits/opens all target the same SRS slice
    (Signature.hs:40-57 — embarrassingly parallel), so the whole batch
    runs as ONE vmapped phase pipeline instead of m sequential MSMs.

    With `mesh`, the M axis is the data-parallel axis: digits shard over
    the devices (points replicated) and the whole pipeline partitions
    communication-free (each device owns a slice of the m proofs).

    Large M auto-chunks so the (M, K, W, B) bucket grid stays within a
    fixed HBM budget; chunks reuse the same compiled phase programs.
    """
    m, n = scalars_std.shape[0], scalars_std.shape[1]
    if c is None:
        c = _pick_c(n)
    # ~1.5 GB bucket-grid budget: grid bytes/instance = K*W*B * 3 coords
    # * limbs * 4 (Fq2 coords double it)
    K_est = min(lanes, max(1, n)) if lanes is not None else _pick_lanes(n)
    W_est = (scalars_std.shape[-1] * C.LIMB_BITS + c - 1) // c + (1 if signed else 0)
    B_est = ((1 << (c - 1)) + 1) if signed else (1 << c)
    coord_bytes = int(np.prod(points.x.shape[1:])) * 4 * 3
    per_instance = K_est * W_est * B_est * coord_bytes
    chunk = max(1, (3 << 29) // max(per_instance, 1))
    if jax.default_backend() == "tpu" and group.name == "G1" and signed:
        chunk = min(chunk, 128)  # chunks ride the fused 128-lane kernel
    if mesh is not None:
        ndev = mesh.devices.size
        chunk = max(ndev, chunk - chunk % ndev)
    if m > chunk:
        # pad M to a chunk multiple (zero scalars -> infinity results) so
        # every chunk reuses ONE compiled shape, then slice back to m
        m_up = ((m + chunk - 1) // chunk) * chunk
        if m_up != m:
            scalars_std = jnp.pad(
                scalars_std, ((0, m_up - m), (0, 0), (0, 0))
            )
        outs = [
            msm_batched(
                group, points, scalars_std[i : i + chunk], c, lanes, signed, mesh
            )
            for i in range(0, m_up, chunk)
        ]
        out = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *outs)
        return jax.tree.map(lambda a: a[:m], out)
    points, scalars_std, n_pad = _pad_pow2_points(
        points, scalars_std, scalar_axis=1
    )
    K = _pick_lanes(n_pad) if lanes is None else min(lanes, max(1, n_pad))
    steps = n_pad // K

    digs, nbuckets = _prep_digits(scalars_std, c, signed)  # (M, N', W)
    W = digs.shape[-1]
    coord_tail = points.x.shape[1:]

    # Fused Pallas path: pack the M instances into the 128-lane axis
    # (K' = 128/M lanes each) — the whole helper batch is ONE kernel.
    if (
        mesh is None
        and lanes is None
        and signed
        and nbuckets <= 129
        and jax.default_backend() == "tpu"
        and group.name == "G1"
        and m <= 128
    ):
        from .pallas_acc import LANES, accumulate_batched_pallas

        m_p = 1
        while m_p < m:
            m_p *= 2
        kp = LANES // m_p
        if n_pad % kp == 0:
            if m_p != m:
                digs = jnp.pad(
                    digs, ((0, m_p - m), (0, 0), (0, 0))
                )
            pts_k = Affine(
                points.x.reshape((kp, n_pad // kp) + coord_tail),
                points.y.reshape((kp, n_pad // kp) + coord_tail),
                points.inf.reshape(kp, n_pad // kp),
            )
            pdig = digs.reshape(m_p, kp, n_pad // kp, W)
            buckets = accumulate_batched_pallas(pts_k, pdig, nbuckets)
            out = _msm_tail_batched(group, buckets, c)
            if m_p != m:
                out = jax.tree.map(lambda a: a[:m], out)
            return out
    pts = Affine(
        points.x.reshape((K, steps) + coord_tail),
        points.y.reshape((K, steps) + coord_tail),
        points.inf.reshape(K, steps),
    )
    pdig = digs.reshape(m, K, steps, W)
    m_pad = m
    if mesh is not None:
        from ..parallel.mesh import shard_leading

        ndev = mesh.devices.size
        m_pad = ((m + ndev - 1) // ndev) * ndev
        if m_pad != m:
            # all-zero digit rows -> infinity results, sliced off below
            pdig = jnp.pad(pdig, ((0, m_pad - m), (0, 0), (0, 0), (0, 0)))
        pdig = shard_leading(pdig, mesh)

    buckets = jax.vmap(
        lambda d: _accumulate_buckets(
            group, pts, d, nbuckets, signed, allow_pallas=False
        )
    )(pdig)  # (M, K, W, B)
    out = _msm_tail_batched(group, buckets, c)
    if m_pad != m:
        out = jax.tree.map(lambda a: a[:m], out)
    return out


def msm_g1(points, scalars_std, c=None, lanes=None):
    return msm(g1, points, scalars_std, c, lanes)


def msm_g2(points, scalars_std, c=None, lanes=None):
    return msm(g2, points, scalars_std, c, lanes)
