"""Fused Pallas bucket-accumulation kernel — the MSM hot loop on TPU.

The Pippenger scan phase is the prover's dominant cost (SURVEY.md §3.5
item 1). TPU has no per-lane random access, so bucket updates must be
dense one-hot selects (BENCH_NOTES.md); the jnp dense variant
(pippenger._accumulate_buckets_dense) streams the whole (K, W, B) bucket
grid through HBM ~5 times per scan step. This kernel keeps the grid
RESIDENT IN VMEM across the entire scan:

  grid = (window_chunks, step_chunks), step innermost. The output block
  holds one window-chunk's (B-bucket) grid; its index map ignores the
  step axis, so Pallas keeps it in VMEM across all steps and flushes it
  to HBM once per window chunk. Points stream in (Tb, L, 128) blocks.
  Per (step, window): one full RCB16 complete mixed addition on an
  (L, 128) panel — all 11 Montgomery multiplies fused in VMEM — plus a
  B-row masked read and write that never leave VMEM.

HBM traffic drops from ~5*N*W*B*288 bytes to (points in once per window
chunk) + (bucket grid out once) — the phase becomes compute-bound at the
fused add rate. Layout follows fields/pallas_mul.py: limb axis in
sublanes (L = 24 for Fq, a multiple of the 8-sublane tile), 128 point
lanes in the lane axis.

Bit-exact with pippenger._accumulate_buckets_dense (tested in interpret
mode); G1 only — the protocol's Pippenger MSMs are all G1
(CommitmentScheme.hs commits/openings live in G1).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import constants as C
from ..fields.limb import FQ
from ..fields.pallas_mul import (
    MASK,
    SHIFT,
    _carry_sweep_k,
    _conv_acc,
    _sub_limbs_k,
)
from ..curve.group import Jacobian

LANES = 128


# -- field ops on (L, K) panels (Fq, Montgomery form) -----------------------


def _cond_sub_mod(x, mod):
    diff, borrow = _sub_limbs_k(x, mod)
    return jnp.where((borrow == 0)[None], diff, x)


def _fadd(a, b, mod):
    s = _carry_sweep_k(a + b, a.shape[0])
    return _cond_sub_mod(s, mod)


def _fsub(a, b, mod):
    diff, borrow = _sub_limbs_k(a, b)
    added = _carry_sweep_k(diff + mod, a.shape[0])
    return jnp.where((borrow != 0)[None], added, diff)


def _fneg(a, mod):
    return _fsub(jnp.zeros_like(a), a, mod)


def _fmul(a, b, npr, mod):
    """Montgomery product (the _mont_mul_kernel body, reusable inline)."""
    L = a.shape[0]
    t = _carry_sweep_k(_conv_acc(a, b, 2 * L), 2 * L)
    m = _carry_sweep_k(_conv_acc(t[:L], npr, L), L)
    t2 = _carry_sweep_k(_conv_acc(m, mod, 2 * L) + t, 2 * L + 1)
    return _cond_sub_mod(t2[L : 2 * L], mod)


def _fmul12(a, mod):
    """a * 12 = 3b for the G1 curve constant b = 4 (addition chain)."""
    a2 = _fadd(a, a, mod)
    a4 = _fadd(a2, a2, mod)
    a8 = _fadd(a4, a4, mod)
    return _fadd(a8, a4, mod)


def _fmul3(a, mod):
    return _fadd(_fadd(a, a, mod), a, mod)


def _sel(cond_k, a, b):
    """Per-lane select: cond (K,), operands (L, K)."""
    return jnp.where(cond_k[None], a, b)


def _add_mixed_panel(px, py, pz, qx, qy, q_inf, npr, mod):
    """RCB16 complete mixed addition (group.py _add_mixed_impl) on (L, K)
    panels. q_inf: (K,) uint32 flag; returns p when set."""
    sxy_p = _fadd(px, py, mod)
    sxy_q = _fadd(qx, qy, mod)
    t0 = _fmul(px, qx, npr, mod)
    t1 = _fmul(py, qy, npr, mod)
    t3 = _fmul(sxy_q, sxy_p, npr, mod)
    yz = _fmul(qy, pz, npr, mod)
    xz = _fmul(qx, pz, npr, mod)
    u01 = _fadd(t0, t1, mod)
    t4 = _fadd(yz, py, mod)
    y3 = _fadd(xz, px, mod)
    t3 = _fsub(t3, u01, mod)
    t0 = _fmul3(t0, mod)
    t2 = _fmul12(pz, mod)
    z3 = _fadd(t1, t2, mod)
    t1 = _fsub(t1, t2, mod)
    y3 = _fmul12(y3, mod)
    m0 = _fmul(t3, t1, npr, mod)
    m1 = _fmul(t4, y3, npr, mod)
    m2 = _fmul(t1, z3, npr, mod)
    m3 = _fmul(y3, t0, npr, mod)
    m4 = _fmul(z3, t4, npr, mod)
    m5 = _fmul(t0, t3, npr, mod)
    x3 = _fsub(m0, m1, mod)
    y3 = _fadd(m2, m3, mod)
    z3 = _fadd(m4, m5, mod)
    keep = q_inf != 0
    return (_sel(keep, px, x3), _sel(keep, py, y3), _sel(keep, pz, z3))


# -- kernel ------------------------------------------------------------------


def _acc_kernel(
    x_ref,      # (Tb, L, K) u32  point x, Montgomery
    y_ref,      # (Tb, L, K) u32
    inf_ref,    # (Tb, K) int32
    dig_ref,    # (Wb, Tb, K) int32 signed digits
    const_ref,  # (3, L, 1) u32: [nprime, modulus, mont_one]
    out_ref,    # (3, Wb, B, L, K) u32 bucket grid (x, y, z)
    *,
    L: int,
    B: int,
    Wb: int,
    Tb: int,
):
    """Every bucket-row access uses STATIC (w, b) indices — the window
    and bucket loops are unrolled — so Mosaic lowers them to direct VMEM
    addresses. (Dynamic double-indexing measured ~100x slower; folding w
    into the lane axis hits Mosaic's unsupported sublane->lane reshape.)
    Per (t, w): one (L, 128)-panel RCB16 mixed addition plus a one-hot
    read/select-write pass over the B rows."""
    t_chunk = pl.program_id(1)
    npr = jnp.broadcast_to(const_ref[0], (L, LANES))
    mod = jnp.broadcast_to(const_ref[1], (L, LANES))

    @pl.when(t_chunk == 0)
    def _init():
        # infinity = (0 : 1 : 0); y rows get the Montgomery one
        out_ref[0] = jnp.zeros_like(out_ref[0])
        out_ref[1] = jnp.broadcast_to(
            const_ref[2][None, None], (Wb, B, L, LANES)
        )
        out_ref[2] = jnp.zeros_like(out_ref[2])

    def t_body(t, _):
        qx = x_ref[t]
        qy0 = y_ref[t]
        q_inf = inf_ref[t].astype(jnp.uint32)
        qy_neg = _fneg(qy0, mod)

        for w in range(Wb):  # static unroll: direct bucket addressing
            dig = dig_ref[w, t]  # (K,) int32
            bidx = jnp.abs(dig)
            qy = _sel(dig < 0, qy_neg, qy0)

            zero = jnp.zeros((L, LANES), jnp.uint32)
            cx, cy, cz = zero, zero, zero
            hits = []
            for b in range(B):
                hit = (bidx == b)[None]
                hits.append(hit)
                cx = cx + jnp.where(hit, out_ref[0, w, b], 0)
                cy = cy + jnp.where(hit, out_ref[1, w, b], 0)
                cz = cz + jnp.where(hit, out_ref[2, w, b], 0)

            nx, ny, nz = _add_mixed_panel(
                cx, cy, cz, qx, qy, q_inf, npr, mod
            )

            for b in range(B):
                hit = hits[b]
                out_ref[0, w, b] = jnp.where(hit, nx, out_ref[0, w, b])
                out_ref[1, w, b] = jnp.where(hit, ny, out_ref[1, w, b])
                out_ref[2, w, b] = jnp.where(hit, nz, out_ref[2, w, b])
        return 0

    jax.lax.fori_loop(0, Tb, t_body, 0)


@partial(
    jax.jit, static_argnames=("nbuckets", "wb", "tb", "interpret")
)
def _acc_pallas(
    xs, ys, infs, digs, nbuckets: int, wb: int, tb: int, interpret: bool
):
    """xs, ys: (T, L, K); infs: (T, K) int32; digs: (W, T, K) int32.
    Returns bucket grid (3, W, B, L, K)."""
    T, L, K = xs.shape
    W = digs.shape[0]
    assert K == LANES and W % wb == 0 and T % tb == 0
    consts = jnp.stack(
        [
            jnp.asarray(FQ.nprime_limbs, jnp.uint32),
            jnp.asarray(FQ.mod_limbs, jnp.uint32),
            jnp.asarray(
                C.int_to_limbs(FQ.mont_r % FQ.modulus, L), jnp.uint32
            ),
        ]
    )[..., None]
    grid = (W // wb, T // tb)
    return pl.pallas_call(
        partial(_acc_kernel, L=L, B=nbuckets, Wb=wb, Tb=tb),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tb, L, K), lambda w, t: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tb, L, K), lambda w, t: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tb, K), lambda w, t: (t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (wb, tb, K), lambda w, t: (w, t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (3, L, 1), lambda w, t: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (3, wb, nbuckets, L, K),
            lambda w, t: (0, w, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (3, W, nbuckets, L, K), jnp.uint32
        ),
        interpret=interpret,
    )(xs, ys, infs, digs, consts)


def _pick_wb(nbuckets: int, L: int) -> int:
    """Largest window-chunk whose (3, Wb, B, L, 128) block stays ~<= 3 MB
    (Pallas double-buffers the revisited output block, and the VMEM limit
    is 16 MB total including streamed inputs)."""
    budget = 3 << 20
    per_w = 3 * nbuckets * L * LANES * 4
    wb = max(1, budget // per_w)
    return 8 if wb >= 8 else (4 if wb >= 4 else (2 if wb >= 2 else 1))


def accumulate_pallas(
    points,
    digits: jnp.ndarray,
    nbuckets: int,
    interpret: bool = False,
    wb: int | None = None,
    tb: int = 16,
) -> Jacobian:
    """Drop-in for pippenger._accumulate_buckets (G1, signed digits):
    points (K, T, L) Affine batch, digits (K, T, W) -> (K, W, B) Jacobian.

    K*T points are re-laid out as (T', L, 128) panels: the kernel's lane
    axis is the point-stream axis, so K here only shapes the OUTPUT grid
    (the caller's lane count, folded by _fold_lanes afterwards).
    """
    K, T = digits.shape[0], digits.shape[1]
    W = digits.shape[2]
    assert K == LANES, "pallas accumulate runs at 128 lanes"
    L = points.x.shape[-1]

    xs = jnp.moveaxis(points.x, 1, 0)  # (T, K, L)
    ys = jnp.moveaxis(points.y, 1, 0)
    xs = jnp.swapaxes(xs, 1, 2)  # (T, L, K)
    ys = jnp.swapaxes(ys, 1, 2)
    infs = jnp.moveaxis(points.inf, 1, 0).astype(jnp.int32)  # (T, K)
    digs = jnp.transpose(digits, (2, 1, 0))  # (W, T, K)

    if wb is None:
        wb = _pick_wb(nbuckets, L)
    if W % wb:
        pad = wb - W % wb
        digs = jnp.pad(digs, ((0, pad), (0, 0), (0, 0)))
        Wp = W + pad
    else:
        Wp = W
    if T % tb:
        padt = tb - T % tb
        xs = jnp.pad(xs, ((0, padt), (0, 0), (0, 0)))
        ys = jnp.pad(ys, ((0, padt), (0, 0), (0, 0)))
        infs = jnp.pad(infs, ((0, padt), (0, 0)), constant_values=1)
        digs = jnp.pad(digs, ((0, 0), (0, padt), (0, 0)))

    grid_out = _acc_pallas(
        xs, ys, infs, digs, nbuckets, wb, tb, interpret
    )  # (3, Wp, B, L, K)
    out = jnp.moveaxis(grid_out[:, :W], -1, 1)  # (3, K, W, B, L)
    return Jacobian(out[0], out[1], out[2])


def accumulate_batched_pallas(
    points,
    digits: jnp.ndarray,
    nbuckets: int,
    interpret: bool = False,
    wb: int | None = None,
    tb: int = 16,
) -> Jacobian:
    """Batched variant for msm_batched: M instances SHARING one point
    table pack into the 128-lane axis (lane = (m, k') with K' = 128/M
    lanes per instance), so the whole helper batch is ONE kernel launch.

    points: (K', T, L) Affine (shared); digits: (M, K', T, W) ->
    (M, K', W, B) Jacobian. Requires M * K' == 128.
    """
    M, Kp, T, W = digits.shape
    assert M * Kp == LANES, (M, Kp)
    L = points.x.shape[-1]

    # (T, L, K') -> replicate over M -> (T, L, M*K'); lane = m*K' + k'
    def widen(a):  # (K', T, L) -> (T, L, M*K')
        a = jnp.transpose(a, (1, 2, 0))  # (T, L, K')
        a = jnp.broadcast_to(a[:, :, None, :], (T, L, M, Kp))
        return a.reshape(T, L, LANES)

    xs = widen(points.x)
    ys = widen(points.y)
    infs = (
        jnp.broadcast_to(
            jnp.transpose(points.inf, (1, 0))[:, None, :], (T, M, Kp)
        )
        .reshape(T, LANES)
        .astype(jnp.int32)
    )
    digs = jnp.transpose(digits, (3, 2, 0, 1)).reshape(W, T, LANES)

    if wb is None:
        wb = _pick_wb(nbuckets, L)
    if W % wb:
        pad = wb - W % wb
        digs = jnp.pad(digs, ((0, pad), (0, 0), (0, 0)))
        Wp = W + pad
    else:
        Wp = W
    if T % tb:
        padt = tb - T % tb
        xs = jnp.pad(xs, ((0, padt), (0, 0), (0, 0)))
        ys = jnp.pad(ys, ((0, padt), (0, 0), (0, 0)))
        infs = jnp.pad(infs, ((0, padt), (0, 0)), constant_values=1)
        digs = jnp.pad(digs, ((0, 0), (0, padt), (0, 0)))

    grid_out = _acc_pallas(
        xs, ys, infs, digs, nbuckets, wb, tb, interpret
    )  # (3, Wp, B, L, M*K')
    out = grid_out[:, :W].reshape(3, W, nbuckets, L, M, Kp)
    out = jnp.transpose(out, (0, 4, 5, 1, 2, 3))  # (3, M, K', W, B, L)
    return Jacobian(out[0], out[1], out[2])
