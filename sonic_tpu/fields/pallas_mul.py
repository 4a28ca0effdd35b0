"""Pallas TPU kernel for Montgomery modular multiplication.

This is the innermost "native" kernel of the framework — the TPU
counterpart of the GMP layer the reference reaches through GHC Integer
(SURVEY.md §2.3 galois-field row): one fused VMEM-resident pass computing
t = a*b (schoolbook limb convolution), m = t*N' mod R, and the Montgomery
folding (t + m*N)/R with a final conditional subtract — per batch panel,
with no HBM round-trips between the three convolutions.

Layout: limb-major (L, TB) panels. The batch axis sits in the 128-wide
lane dimension (full VPU utilization); the limb axis (16 for Fr, 24 for
Fq — both multiples of the 8-sublane tile) sits in sublanes. All limb
loops are unrolled at trace time: straight-line uint32 VPU code.

The kernel is bit-exact with the jnp path in `limb.py` (same column
arithmetic); `limb.mul` dispatches here automatically for large batches
on TPU backends (SONIC_TPU_PALLAS=0/1 forces it off/on).
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
from .limb import (
    FieldSpec,
    _carry_sweep_lm,
    _cond_sub_mod_lm,
    _const_lm,
)

MASK = np.uint32(C.LIMB_MASK)
SHIFT = C.LIMB_BITS

# Panel width: one block of the batch axis per grid step. 512 lanes = 4
# vector registers per limb row; a full Fq kernel instance stays well
# under the VMEM budget (~1.2 MB of live panels).
PANEL = 512
# Below this flat batch size the pallas_call dispatch overhead outweighs
# the fusion win; the jnp path keeps those (they are not hot anyway).
MIN_BATCH = 512


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
    for i in range(min(La, out_cols)):
        p = a[i][None] * b  # (Lb, TB), exact in uint32 (16x16-bit inputs)
        lo = p & MASK
        hi = p >> SHIFT
        w_lo = min(Lb, out_cols - i)
        acc = acc.at[i : i + w_lo].add(lo[:w_lo])
        w_hi = min(Lb, out_cols - i - 1)
        if w_hi > 0:
            acc = acc.at[i + 1 : i + 1 + w_hi].add(hi[:w_hi])
    return acc


def _mont_mul_kernel(a_ref, b_ref, o_ref, *, spec: FieldSpec):
    """One (L, PANEL) panel: full Montgomery product in VMEM."""
    L = spec.nlimbs
    a = a_ref[:]
    b = b_ref[:]
    tail = a.shape[1:]
    # t = a * b, carry-propagated to 2L limbs
    t = _carry_sweep_lm(_conv_acc(a, b, 2 * L), 2 * L)
    # m = (t mod R) * N' mod R
    npr = jnp.broadcast_to(_const_lm(spec.nprime_limbs, len(tail)), (L,) + tail)
    m = _carry_sweep_lm(_conv_acc(t[:L], npr, L), L)
    # t2 = t + m*N  (low L limbs vanish); result = t2 >> (16 L), < 2N
    mod = jnp.broadcast_to(_const_lm(spec.mod_limbs, len(tail)), (L,) + tail)
    t2 = _carry_sweep_lm(_conv_acc(m, mod, 2 * L) + t, 2 * L + 1)
    o_ref[:] = _cond_sub_mod_lm(t2[L : 2 * L], spec)


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
    out = pl.pallas_call(
        partial(_mont_mul_kernel, spec=spec),
        grid=(n_pad // PANEL,),
        in_specs=[
            pl.BlockSpec((L, PANEL), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, PANEL), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (L, PANEL), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L, n_pad), jnp.uint32),
        interpret=interpret,
    )(am, bm)
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
