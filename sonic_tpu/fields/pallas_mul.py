"""Pallas TPU kernel for Montgomery modular multiplication.

This is the innermost "native" kernel of the framework — the TPU
counterpart of the GMP layer the reference reaches through GHC Integer
(SURVEY.md §2.3 galois-field row): one fused VMEM-resident pass computing
t = a*b (schoolbook limb convolution), m = t*N' mod R, and the Montgomery
folding (t + m*N)/R with a final conditional subtract — per batch panel,
with no HBM round-trips between the three convolutions. The jnp fallback
path (limb._mul_lm) materializes every (La, Lb, batch) partial-product
tensor in HBM; fusing the whole product in VMEM is the difference between
HBM-bandwidth-bound and VPU-bound.

Layout: limb-major (L, TB) panels. The batch axis sits in the 128-wide
lane dimension (full VPU utilization); the limb axis (16 for Fr, 24 for
Fq — both multiples of the 8-sublane tile) sits in sublanes. All limb
loops are unrolled at trace time: straight-line uint32 VPU code.

The kernel is bit-exact with the jnp path in `limb.py` (same column
arithmetic, same packed-carry resolution); `limb.mul` dispatches here for
large batches on TPU backends (SONIC_TPU_PALLAS=0/1 forces it off/on).
"""
from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import constants as C
from .limb import FieldSpec

MASK = np.uint32(C.LIMB_MASK)
SHIFT = C.LIMB_BITS

# Panel width: one block of the batch axis per grid step. 512 lanes = 4
# vector registers per limb row; a full Fq kernel instance stays well
# under the VMEM budget (~1.2 MB of live panels).
PANEL = 512
# Below this flat batch size the pallas_call dispatch overhead outweighs
# the fusion win; the jnp path keeps those (they are not hot anyway).
MIN_BATCH = 512


def _iota0(n: int, tail: tuple) -> jnp.ndarray:
    """uint32 iota along axis 0 of shape (n,) + tail (kernel-safe: Pallas
    rejects captured np-derived constants, lax iota it is)."""
    return jax.lax.broadcasted_iota(jnp.uint32, (n,) + tail, 0)


def _resolve_carries_k(g: jnp.ndarray, p: jnp.ndarray):
    """Kernel-local clone of limb._resolve_carries (packed-integer carry
    resolution; see that docstring). g, p: (L, TB) uint32 in {0,1}."""
    L = g.shape[0]
    tail = g.shape[1:]
    chunk = 24
    cout = jnp.zeros(tail, jnp.uint32)
    outs = []
    for s in range(0, L, chunk):
        n = min(s + chunk, L) - s
        iota = _iota0(n, (1,) * len(tail))
        # sum as int32: Mosaic lacks unsigned reductions; the packed words
        # stay < 2^24 so the reinterpret is exact
        gw = (
            (g[s : s + n] << iota).astype(jnp.int32).sum(axis=0)
        ).astype(jnp.uint32)
        pw = (
            (p[s : s + n] << iota).astype(jnp.int32).sum(axis=0)
        ).astype(jnp.uint32)
        a_w = gw | pw
        s_w = a_w + gw + cout
        c_w = a_w ^ gw ^ s_w
        outs.append((c_w[None] >> iota) & jnp.uint32(1))
        cout = (c_w >> np.uint32(n)) & jnp.uint32(1)
    cin = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return cin, cout


def _shift_up1(a: jnp.ndarray) -> jnp.ndarray:
    pad = jnp.zeros((1,) + a.shape[1:], a.dtype)
    return jnp.concatenate([pad, a[:-1]], axis=0)


def _carry_sweep_k(cols: jnp.ndarray, out_limbs: int) -> jnp.ndarray:
    k_in = cols.shape[0]
    if k_in < out_limbs:
        cols = jnp.concatenate(
            [cols, jnp.zeros((out_limbs - k_in,) + cols.shape[1:], cols.dtype)],
            axis=0,
        )
    elif k_in > out_limbs:
        cols = cols[:out_limbs]
    y = (cols & MASK) + _shift_up1(cols >> SHIFT)
    g = (y >> SHIFT).astype(jnp.uint32)
    p = ((y & MASK) == MASK).astype(jnp.uint32)
    cin, _ = _resolve_carries_k(g, p)
    return (y + cin) & MASK


def _sub_limbs_k(a: jnp.ndarray, b: jnp.ndarray):
    g = (a < b).astype(jnp.uint32)
    p = (a == b).astype(jnp.uint32)
    bin_, bout = _resolve_carries_k(g, p)
    return (a - b - bin_) & MASK, bout


def _conv_acc(a: jnp.ndarray, b: jnp.ndarray, out_cols: int) -> jnp.ndarray:
    """Column sums of the limb product, accumulator form: (La, TB) x (Lb, TB)
    -> (out_cols, TB) uint32, NOT carry-propagated.

    Same column arithmetic as limb._conv_lm (partial products split into
    16-bit hi/lo halves so column sums stay far from 2^32), but built by
    accumulating into one (out_cols, TB) buffer with static-slice adds —
    the shape Mosaic keeps resident in vector registers/VMEM.
    """
    La, Lb = a.shape[0], b.shape[0]
    tail = a.shape[1:]
    acc = jnp.zeros((out_cols,) + tail, jnp.uint32)

    def _row(upd, row):
        # zero-pad upd to out_cols at offset `row` (static concat — Pallas
        # TC lowers neither .at[].add scatters nor dynamic_slice)
        parts = []
        if row:
            parts.append(jnp.zeros((row,) + tail, jnp.uint32))
        parts.append(upd)
        post = out_cols - row - upd.shape[0]
        if post:
            parts.append(jnp.zeros((post,) + tail, jnp.uint32))
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)

    for i in range(min(La, out_cols)):
        p = a[i][None] * b  # (Lb, TB), exact in uint32 (16x16-bit inputs)
        lo = p & MASK
        hi = p >> SHIFT
        w_lo = min(Lb, out_cols - i)
        acc = acc + _row(lo[:w_lo], i)
        w_hi = min(Lb, out_cols - i - 1)
        if w_hi > 0:
            acc = acc + _row(hi[:w_hi], i + 1)
    return acc


def _mont_mul_kernel(a_ref, b_ref, npr_ref, mod_ref, o_ref, *, L: int):
    """One (L, PANEL) panel: full Montgomery product in VMEM."""
    a = a_ref[:]
    b = b_ref[:]
    tail = a.shape[1:]
    npr = jnp.broadcast_to(npr_ref[:], (L,) + tail)
    mod = jnp.broadcast_to(mod_ref[:], (L,) + tail)
    # t = a * b, carry-propagated to 2L limbs
    t = _carry_sweep_k(_conv_acc(a, b, 2 * L), 2 * L)
    # m = (t mod R) * N' mod R
    m = _carry_sweep_k(_conv_acc(t[:L], npr, L), L)
    # t2 = t + m*N  (low L limbs vanish); result = t2 >> (16 L), < 2N
    t2 = _carry_sweep_k(_conv_acc(m, mod, 2 * L) + t, 2 * L + 1)
    hi = t2[L : 2 * L]
    diff, borrow = _sub_limbs_k(hi, mod)
    o_ref[:] = jnp.where((borrow == 0)[None], diff, hi)


@partial(jax.jit, static_argnames=("spec", "interpret"))
def mont_mul(a, b, spec: FieldSpec, interpret: bool = False):
    """Montgomery product (a*b*R^-1 mod N) via the Pallas kernel.

    a, b: (..., L) uint32 Montgomery-form limb arrays (broadcastable).
    Bit-exact with limb.mul. `interpret=True` runs the kernel in the
    Pallas interpreter (CPU test path).
    """
    a, b = jnp.broadcast_arrays(a, b)
    L = spec.nlimbs
    batch = a.shape[:-1]
    n = int(np.prod(batch)) if batch else 1
    n_pad = ((n + PANEL - 1) // PANEL) * PANEL
    am = a.reshape(n, L).T  # (L, n): batch -> lanes
    bm = b.reshape(n, L).T
    if n_pad != n:
        pad = [(0, 0), (0, n_pad - n)]
        am = jnp.pad(am, pad)
        bm = jnp.pad(bm, pad)
    npr = jnp.asarray(spec.nprime_limbs).reshape(L, 1)
    mod = jnp.asarray(spec.mod_limbs).reshape(L, 1)
    out = pl.pallas_call(
        partial(_mont_mul_kernel, L=L),
        grid=(n_pad // PANEL,),
        in_specs=[
            pl.BlockSpec((L, PANEL), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, PANEL), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (L, PANEL), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L, n_pad), jnp.uint32),
        interpret=interpret,
    )(am, bm, npr, mod)
    return out[:, :n].T.reshape(batch + (L,))


def wants_pallas(flat_batch: int) -> bool:
    """Dispatch policy for limb.mul: large batches on a real TPU backend.

    SONIC_TPU_PALLAS=1 forces the kernel everywhere (interpret mode off
    TPU is far too slow for production, so =1 is for debugging only);
    =0 disables it.
    """
    flag = os.environ.get("SONIC_TPU_PALLAS", "auto")
    if flag == "0":
        return False
    if flat_batch < MIN_BATCH:
        return False
    if flag == "1":
        return True
    return jax.default_backend() == "tpu"
