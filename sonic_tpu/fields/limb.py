"""Limb-decomposed modular big-integer arithmetic for TPU (JAX).

This module is the TPU-native equivalent of the reference's galois-field /
GMP layer (SURVEY.md §2.3): all BLS12-381 Fr (255-bit) and Fq (381-bit)
arithmetic, vectorized over arbitrary batch dimensions.

Representation
--------------
A field element is a little-endian vector of 16-bit limbs held in uint32
lanes: shape (..., L) with L = 16 (Fr) or 24 (Fq). Canonical elements have
every limb < 2^16 and value < modulus. Elements flowing through multiply
chains are kept in Montgomery form (value * R mod N, R = 2^(16 L)).

Why 16-bit limbs: TPU has no 64-bit integer multiply; a 16x16 product fits
exactly in a uint32. Partial products are split into hi/lo 16-bit halves
before accumulation, so column sums stay < 2^23 — far from overflow — and
carries are propagated once per operation with a short unrolled sweep.

All loops are over *static* limb counts (unrolled at trace time), so
everything jits to straight-line XLA with no dynamic shapes.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import constants as C

MASK = np.uint32(C.LIMB_MASK)
SHIFT = C.LIMB_BITS


@dataclasses.dataclass(frozen=True)
class FieldSpec:
    """Static parameters of one prime field in limb form."""

    name: str
    modulus: int
    nlimbs: int

    def __post_init__(self):
        L = self.nlimbs
        object.__setattr__(self, "mont_r", 1 << (SHIFT * L))
        object.__setattr__(self, "mont_r2", self.mont_r**2 % self.modulus)
        object.__setattr__(
            self, "nprime", (-pow(self.modulus, -1, self.mont_r)) % self.mont_r
        )
        object.__setattr__(
            self, "mod_limbs", np.array(C.int_to_limbs(self.modulus, L), np.uint32)
        )
        object.__setattr__(
            self, "nprime_limbs", np.array(C.int_to_limbs(self.nprime, L), np.uint32)
        )
        object.__setattr__(
            self, "r2_limbs", np.array(C.int_to_limbs(self.mont_r2, L), np.uint32)
        )
        # modulus - 2, bit-decomposed msb-first (for Fermat inversion)
        bits = [(self.modulus - 2) >> i & 1 for i in range(self.modulus.bit_length())]
        object.__setattr__(self, "inv_exp_bits", np.array(bits[::-1], np.uint32))

    # -- host-side converters ------------------------------------------------

    def from_int(self, v, mont: bool = True) -> jnp.ndarray:
        """Python int (or nested list of ints) -> limb array (Montgomery).

        Large batches (> 4096 elements — e.g. the (Q, n) circuit matrices
        at n=2^16) take a vectorized path: limb decomposition as L masked
        shifts over the whole object array (C-level loops instead of a
        Python loop per element), with the Montgomery conversion done as
        ONE device multiply by R^2 (mont_mul(v, R^2) = v*R exactly, with
        the canonical conditional subtract — bit-identical to the host
        loop)."""
        arr = np.asarray(v, dtype=object)
        if arr.size > 4096:
            flat = arr.ravel() % self.modulus  # object ints, C-level loop
            out = np.zeros((flat.size, self.nlimbs), np.uint32)
            mask = (1 << C.LIMB_BITS) - 1
            for i in range(self.nlimbs):
                out[:, i] = (flat & mask).astype(np.uint32)
                flat = flat >> C.LIMB_BITS
            limbs = jnp.asarray(out.reshape(arr.shape + (self.nlimbs,)))
            if mont:
                r2 = C.int_to_limbs(
                    self.mont_r * self.mont_r % self.modulus, self.nlimbs
                )
                limbs = mul(limbs, jnp.asarray(r2, jnp.uint32), self)
            return limbs
        out = np.zeros(arr.shape + (self.nlimbs,), np.uint32)
        if arr.size == 0:
            return jnp.asarray(out)
        it = np.nditer(arr, flags=["multi_index", "refs_ok"])
        for x in it:
            val = int(x.item()) % self.modulus
            if mont:
                val = val * self.mont_r % self.modulus
            out[it.multi_index] = C.int_to_limbs(val, self.nlimbs)
        return jnp.asarray(out)

    def to_int(self, a, mont: bool = True):
        """Limb array -> Python int(s) (undoing Montgomery)."""
        arr = np.asarray(a)
        rinv = pow(self.mont_r, -1, self.modulus)
        if arr.ndim == 1:
            v = C.limbs_to_int(arr)
            return v * rinv % self.modulus if mont else v
        flat = arr.reshape(-1, self.nlimbs)
        vals = [C.limbs_to_int(row) for row in flat]
        if mont:
            vals = [v * rinv % self.modulus for v in vals]
        out = np.empty(len(vals), dtype=object)
        out[:] = vals
        return out.reshape(arr.shape[:-1])

    def zeros(self, shape=()) -> jnp.ndarray:
        return jnp.zeros(tuple(shape) + (self.nlimbs,), jnp.uint32)

    def ones(self, shape=()) -> jnp.ndarray:
        one = self.from_int(1)
        return jnp.broadcast_to(one, tuple(shape) + (self.nlimbs,))


FR = FieldSpec("Fr", C.R_MOD, C.FR_LIMBS)
FQ = FieldSpec("Fq", C.Q_MOD, C.FQ_LIMBS)


# ---------------------------------------------------------------------------
# Carry machinery
# ---------------------------------------------------------------------------






# ---------------------------------------------------------------------------
# Limb-major ("lm") internals
#
# Products and carries are computed with the LIMB AXIS LEADING: arrays are
# (L, ...batch) so the batch lands in the TPU lane dimension (full 128-lane
# VPU utilization; the (..., L) layout wastes 81-87% of lanes) and the limb
# convolution runs as L shifted multiply-accumulates over (L, batch) panels
# — never materializing the (batch, La, Lb) outer product whose tile padding
# (5.3x for L=24) blows HBM at MSM scale. Public ops moveaxis at the
# boundary; XLA cancels adjacent transposes between chained ops.
# ---------------------------------------------------------------------------


def _to_lm(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.moveaxis(x, -1, 0)


def _from_lm(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.moveaxis(x, 0, -1)


def _shift_up_lm(a: jnp.ndarray, d: int) -> jnp.ndarray:
    pad = jnp.zeros((d,) + a.shape[1:], a.dtype)
    return jnp.concatenate([pad, a[:-d]], axis=0)


def _shear_sum(x: jnp.ndarray, shift0: int, out_cols: int) -> jnp.ndarray:
    """sum_i shift(x[i], by i+shift0), clipped to out_cols columns.

    x: (R, C, ...tail). Row i contributes x[i, j] to output column
    i + j + shift0. Implemented with the pad/reshape shear trick — O(1)
    HLO ops total (vs O(R) concat/pad chains), which keeps compile time
    linear in the formula, not in the limb count: pad each row to width
    out_cols+1 with shift0 leading zeros, flatten the leading two axes
    (row stride out_cols+1), truncate to R*out_cols, and reshape to
    (R, out_cols) — row i lands shifted right by exactly i. Entries that
    would spill past out_cols are masked to zero first so the stride
    aliasing is harmless."""
    R, Cc = x.shape[0], x.shape[1]
    tail = x.shape[2:]
    Wp = out_cols + 1
    # mask[i, j] = 1 iff i + j + shift0 < out_cols  (static constant)
    i_idx = np.arange(R)[:, None]
    j_idx = np.arange(Cc)[None, :]
    keep = (i_idx + j_idx + shift0) < out_cols
    if not keep.all():
        x = x * jnp.asarray(
            keep.astype(np.uint32).reshape((R, Cc) + (1,) * len(tail))
        )
    pad_right = Wp - shift0 - Cc
    if pad_right < 0:
        x = x[:, :Wp - shift0]
        pad_right = 0
    x = jnp.pad(
        x, [(0, 0), (shift0, pad_right)] + [(0, 0)] * len(tail)
    )
    flat = x.reshape((R * Wp,) + tail)
    y = flat[: R * out_cols].reshape((R, out_cols) + tail)
    return y.sum(axis=0, dtype=jnp.uint32)


def _conv_lm(a: jnp.ndarray, b: jnp.ndarray, out_cols: int) -> jnp.ndarray:
    """Column sums of the limb product, limb-major: (La, ...) x (Lb, ...) ->
    (out_cols, ...). Partial products split hi/lo so every accumulated term
    is < 2^16; column sums stay < 2L * 2^17 << 2^32. NOT carry-propagated.

    One (La, Lb, ...) outer product + two shear-sums. In limb-major layout
    the (La, Lb) axes are LEADING, so the TPU tile (last two dims) is pure
    batch — no tile-padding blowup — and the whole convolution is ~15 HLO
    ops regardless of limb count (compile time on XLA is superlinear in op
    count; the earlier per-row concat/pad build made one point-add graph
    cost minutes of XLA:CPU compile)."""
    La, Lb = a.shape[0], b.shape[0]
    tail = np.broadcast_shapes(a.shape[1:], b.shape[1:])
    p = a[:, None] * jnp.broadcast_to(b[None], (La, Lb) + tail)  # < 2^32
    cols = _shear_sum(p & MASK, 0, out_cols)
    cols = cols + _shear_sum(p >> SHIFT, 1, out_cols)
    return cols


# Carry/borrow resolution. The recurrence c_{i+1} = g_i | (p_i & c_i) is
# EXACTLY the internal carry chain of the integer addition A + B with
# A = g|p, B = g (per-bit: maj(g|p, g, c) = g | (p & c), and g & p = 0
# for both carries and borrows here). So: pack the per-limb g/p flags into
# one uint32 word per batch element, do ONE integer add, and read the
# resolved carries back out of A ^ B ^ S. This replaces a log(L)-round
# Kogge-Stone boolean network built from slice/concat ops — the op class
# that dominated compile time (XLA compile is superlinear in graph size).
_CHUNK = 24  # bits packed per word; must stay < 32 incl. carry-out


def _resolve_carries(g: jnp.ndarray, p: jnp.ndarray):
    """g, p: (L, ...) uint32 in {0,1}. Returns (carry-in per limb (L, ...)
    uint32 in {0,1} with c_0 = 0, final carry-out (...,) uint32)."""
    L = g.shape[0]
    tail = g.shape[1:]
    cout = jnp.zeros(tail, jnp.uint32)
    outs = []
    for s in range(0, L, _CHUNK):
        n = min(s + _CHUNK, L) - s
        iota = jnp.asarray(np.arange(n), jnp.uint32).reshape(
            (n,) + (1,) * len(tail)
        )
        gw = (g[s : s + n] << iota).sum(axis=0, dtype=jnp.uint32)
        pw = (p[s : s + n] << iota).sum(axis=0, dtype=jnp.uint32)
        a_w = gw | pw
        s_w = a_w + gw + cout
        c_w = a_w ^ gw ^ s_w  # bit i = carry INTO limb s+i; bit n = out
        outs.append((c_w[None] >> iota) & jnp.uint32(1))
        cout = (c_w >> np.uint32(n)) & jnp.uint32(1)
    cin = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return cin, cout


def _carry_sweep_lm(cols: jnp.ndarray, out_limbs: int) -> jnp.ndarray:
    """Limb-major carry propagation: uncarried columns (< 2^23 each) ->
    canonical 16-bit limbs, truncated/padded to out_limbs."""
    k_in = cols.shape[0]
    if k_in < out_limbs:
        cols = jnp.concatenate(
            [cols, jnp.zeros((out_limbs - k_in,) + cols.shape[1:], cols.dtype)],
            axis=0,
        )
    elif k_in > out_limbs:
        cols = cols[:out_limbs]
    # one ripple round: y < 2^16 + 2^7, so per-limb generate is 0/1
    y = (cols & MASK) + _shift_up_lm(cols >> SHIFT, 1)
    g = (y >> SHIFT).astype(jnp.uint32)
    p = ((y & MASK) == MASK).astype(jnp.uint32)
    cin, _ = _resolve_carries(g, p)
    return (y + cin) & MASK


def _sub_limbs_lm(a: jnp.ndarray, b: jnp.ndarray):
    """a - b limb-major; returns (diff, borrow (...,) uint32 0/1)."""
    a, b = jnp.broadcast_arrays(a, b)
    g = (a < b).astype(jnp.uint32)
    p = (a == b).astype(jnp.uint32)
    bin_, bout = _resolve_carries(g, p)
    diff = (a - b - bin_) & MASK
    return diff, bout


def _const_lm(limbs: np.ndarray, ndim_tail: int) -> jnp.ndarray:
    return jnp.asarray(limbs).reshape((len(limbs),) + (1,) * ndim_tail)


def _cond_sub_mod_lm(x: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    mod = jnp.broadcast_to(_const_lm(spec.mod_limbs, x.ndim - 1), x.shape)
    diff, borrow = _sub_limbs_lm(x, mod)
    return jnp.where((borrow == 0)[None], diff, x)


def _redc_lm(t: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """Montgomery reduction, limb-major: T (2L, ...) -> T*R^-1 mod N (L, ...)."""
    L = spec.nlimbs
    npr = _const_lm(spec.nprime_limbs, t.ndim - 1)
    m = _carry_sweep_lm(_conv_lm(t[:L], npr, L), L)
    mod = _const_lm(spec.mod_limbs, t.ndim - 1)
    t2 = _carry_sweep_lm(_conv_lm(m, mod, 2 * L) + t, 2 * L + 1)
    return _cond_sub_mod_lm(t2[L : 2 * L], spec)


def _mul_lm(a: jnp.ndarray, b: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    L = spec.nlimbs
    t = _carry_sweep_lm(_conv_lm(a, b, 2 * L), 2 * L)
    return _redc_lm(t, spec)


# ---------------------------------------------------------------------------
# Comparison / conditional subtract
# ---------------------------------------------------------------------------






# ---------------------------------------------------------------------------
# Public field ops (all keep canonical Montgomery form)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames="spec")
def add(a, b, spec: FieldSpec):
    # For both Fr and Fq, 2N < R = 2^(16 L), so the sum of two canonical
    # values fits in L limbs and one conditional subtract restores < N.
    a, b = jnp.broadcast_arrays(a, b)
    s = _carry_sweep_lm(_to_lm(a) + _to_lm(b), spec.nlimbs)
    return _from_lm(_cond_sub_mod_lm(s, spec))


@partial(jax.jit, static_argnames="spec")
def sub(a, b, spec: FieldSpec):
    a, b = jnp.broadcast_arrays(a, b)
    diff, borrow = _sub_limbs_lm(_to_lm(a), _to_lm(b))
    # if borrowed, add modulus back
    mod = _const_lm(spec.mod_limbs, diff.ndim - 1)
    added = _carry_sweep_lm(diff + mod, spec.nlimbs)
    return _from_lm(jnp.where((borrow != 0)[None], added, diff))


def neg(a, spec: FieldSpec):
    return sub(spec.zeros(a.shape[:-1]), a, spec)


@partial(jax.jit, static_argnames="spec")
def mul(a, b, spec: FieldSpec):
    """Montgomery product: (a*b*R^-1) mod N, canonical.

    Large batches on TPU dispatch to the fused Pallas kernel
    (fields/pallas_mul.py — 90x the jnp path, which round-trips every
    partial-product tensor through HBM); both paths are bit-exact."""
    a, b = jnp.broadcast_arrays(a, b)
    from . import pallas_mul

    flat = 1
    for d in a.shape[:-1]:
        flat *= d
    if pallas_mul.wants_pallas(flat):
        # Off-TPU the kernel only runs under the Pallas interpreter (the
        # SONIC_TPU_PALLAS=1 debugging path); on TPU it compiles natively.
        interpret = jax.default_backend() != "tpu"
        return pallas_mul.mont_mul(a, b, spec, interpret=interpret)
    return _from_lm(_mul_lm(_to_lm(a), _to_lm(b), spec))


def sqr(a, spec: FieldSpec):
    return mul(a, a, spec)


def _stack_pairs(pairs):
    """Broadcast each (a, b) pair to a common shape and stack along a new
    leading axis -> (stacked_a, stacked_b, k)."""
    common = ()
    for a, b in pairs:
        common = np.broadcast_shapes(common, a.shape, b.shape)
    sa = jnp.stack([jnp.broadcast_to(a, common) for a, _ in pairs])
    sb = jnp.stack([jnp.broadcast_to(b, common) for _, b in pairs])
    return sa, sb, len(pairs)


def mul_many(pairs, spec: FieldSpec):
    """k independent products as ONE stacked mul. XLA compile time is
    superlinear in graph size, so the curve formulas issue their
    independent multiplies through this (12 mul graphs -> 2)."""
    sa, sb, k = _stack_pairs(pairs)
    out = mul(sa, sb, spec)
    return [out[i] for i in range(k)]


def add_many(pairs, spec: FieldSpec):
    sa, sb, k = _stack_pairs(pairs)
    out = add(sa, sb, spec)
    return [out[i] for i in range(k)]


def sub_many(pairs, spec: FieldSpec):
    sa, sb, k = _stack_pairs(pairs)
    out = sub(sa, sb, spec)
    return [out[i] for i in range(k)]


def mul_small(a, k: int, spec: FieldSpec):
    """a * k for a small static python int k, via an addition chain.

    Used by curve formulas (k in {2, 3, 4, 8}); each doubling/add is two
    carry sweeps, far cheaper than a full Montgomery multiply.
    """
    if k == 0:
        return jnp.zeros_like(a)
    acc = None
    bit_count = k.bit_length()
    for i in range(bit_count - 1, -1, -1):
        if acc is not None:
            acc = add(acc, acc, spec)
        if (k >> i) & 1:
            acc = a if acc is None else add(acc, a, spec)
    return acc


def to_mont(a, spec: FieldSpec):
    return mul(a, jnp.asarray(spec.r2_limbs), spec)


@partial(jax.jit, static_argnames="spec")
def _from_mont_jnp(a, spec: FieldSpec):
    # One jitted program per (shape, spec): the REDC expands to hundreds
    # of limb-panel ops, and running them eagerly cost ~10 s of trace +
    # per-op dispatch PER CALL on the CPU dryrun/test path.
    L = spec.nlimbs
    t = jnp.concatenate(
        [_to_lm(a), jnp.zeros((L,) + a.shape[:-1], jnp.uint32)], axis=0
    )
    return _from_lm(_redc_lm(t, spec))


def from_mont(a, spec: FieldSpec):
    """Montgomery -> standard form (one REDC), canonical.

    from_mont(a) == mul(a, raw-1) (a*1*R^-1), so large batches ride the
    fused Pallas kernel on TPU; the jnp REDC fallback chunks the batch so
    its (L, L, batch) partial-product intermediate never exceeds ~256 MB
    (a (512, 3073)-coefficient commit batch used to materialize 16 GB)."""
    from . import pallas_mul

    flat = 1
    for d in a.shape[:-1]:
        flat *= d
    if pallas_mul.wants_pallas(flat) and jax.default_backend() == "tpu":
        L = spec.nlimbs
        one_raw = jnp.zeros((L,), jnp.uint32).at[0].set(1)
        return pallas_mul.mont_mul(a, one_raw, spec)
    chunk = 1 << 16
    if flat > chunk and not isinstance(a, jax.core.Tracer):
        L = spec.nlimbs
        a2 = a.reshape(flat, L)
        out_parts = [
            _from_mont_jnp(a2[s : s + chunk], spec)
            for s in range(0, flat, chunk)
        ]
        return jnp.concatenate(out_parts, 0).reshape(a.shape)
    return _from_mont_jnp(a, spec)


@partial(jax.jit, static_argnames="spec")
def inv(a, spec: FieldSpec):
    """Fermat inversion a^(N-2); stays in Montgomery form. 0 -> 0."""
    bits = spec.inv_exp_bits  # msb-first
    one = jnp.broadcast_to(spec.from_int(1), a.shape)
    acc = one

    def body(acc, bit):
        acc = sqr(acc, spec)
        acc = jnp.where(bit != 0, mul(acc, a, spec), acc)
        return acc, None

    acc, _ = jax.lax.scan(body, acc, jnp.asarray(bits))
    return acc


@partial(jax.jit, static_argnames="spec")
def batch_inv(a, spec: FieldSpec):
    """Montgomery-trick batch inversion along the LEADING axis.

    Zero inputs map to zero outputs (needed for curve-op edge cases).

    The n elements fold into C = min(n, 1024) independent prefix chains
    (scan over rows of an (R, C) reshape, every step a C-wide batched
    mul), the C chain totals invert with ONE batched Fermat ladder, and a
    reverse scan unwinds the prefixes — 2*ceil(n/C) + ~570 sequential
    steps instead of the 2n a flat scan costs (to_affine over a 2^18-row
    SRS table: 16 s -> <1 s). Each output is the exact field inverse, so
    the chunking is bit-invisible."""
    n = a.shape[0]
    tail = a.shape[1:]
    is_zero = jnp.all(a == 0, axis=-1, keepdims=True)
    one = jnp.broadcast_to(spec.from_int(1), tail)
    safe = jnp.where(is_zero, jnp.broadcast_to(one, a.shape), a)

    C = min(n, 1024) if n else 1
    R = (n + C - 1) // C
    pad = R * C - n
    if pad:
        safe = jnp.concatenate(
            [safe, jnp.broadcast_to(one, (pad,) + tail)], axis=0
        )
    grid = safe.reshape((R, C) + tail)
    ones_row = jnp.broadcast_to(spec.from_int(1), (C,) + tail)

    def fwd(carry, x):
        nxt = mul(carry, x, spec)
        return nxt, carry  # emit the prefix EXCLUDING x

    totals, prefix_excl = jax.lax.scan(fwd, ones_row, grid)
    totals_inv = inv(totals, spec)

    def bwd(carry, xs):
        x, pfx = xs
        out = mul(carry, pfx, spec)  # inv of x
        nxt = mul(carry, x, spec)
        return nxt, out

    _, outs_rev = jax.lax.scan(
        bwd, totals_inv, (grid, prefix_excl), reverse=True
    )
    outs = outs_rev.reshape((R * C,) + tail)[:n]
    return jnp.where(is_zero, jnp.zeros_like(outs), outs)


def is_zero(a) -> jnp.ndarray:
    """Elementwise zero test over the limb axis -> bool (...,)."""
    return jnp.all(a == 0, axis=-1)


def eq(a, b) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def select(cond, a, b):
    """Branchless select: cond (...,) bool; a, b limb arrays."""
    return jnp.where(cond[..., None], a, b)


def pow_fixed(a, exponent: int, spec: FieldSpec):
    """a^exponent for a static python-int exponent (square & multiply)."""
    if exponent == 0:
        return jnp.broadcast_to(spec.from_int(1), a.shape)
    bits = [(exponent >> i) & 1 for i in range(exponent.bit_length())][::-1]
    acc = a
    for bit in bits[1:]:
        acc = sqr(acc, spec)
        if bit:
            acc = mul(acc, a, spec)
    return acc


@partial(jax.jit, static_argnames=("spec", "axis"))
def sum_mod(a, spec: FieldSpec, axis: int = 0):
    """Modular sum of canonical elements along `axis` (not the limb axis).

    Tree reduction with field adds: log2(n) rounds, each a full-width add.
    """
    a = jnp.moveaxis(a, axis, 0)
    n = a.shape[0]
    if n == 0:
        return spec.zeros(a.shape[1:-1])
    while n > 1:
        half = n // 2
        merged = add(a[:half], a[half : 2 * half], spec)
        if n % 2:
            merged = jnp.concatenate([merged, a[2 * half :]], 0)
        a = merged
        n = a.shape[0]
    return a[0]


@partial(jax.jit, static_argnames=("spec", "count"))
def powers(z, spec: FieldSpec, count: int):
    """[z^0, z^1, ..., z^(count-1)] (Montgomery), via log-depth scan.

    z: unbatched element (L,). Returns (count, L).
    """
    if count == 0:
        return spec.zeros((0,))
    one = spec.from_int(1)
    if count == 1:
        return one[None]
    zb = jnp.broadcast_to(z, (count - 1,) + z.shape)
    ladder = jax.lax.associative_scan(lambda x, y: mul(x, y, spec), zb, axis=0)
    return jnp.concatenate([one[None], ladder], 0)


@partial(jax.jit, static_argnames=("spec", "exp"))
def pow_int(z, spec: FieldSpec, exp: int):
    """z^exp for a static python int exp (may be negative -> via inverse)."""
    if exp < 0:
        return pow_fixed(inv(z, spec), -exp, spec)
    return pow_fixed(z, exp, spec)


# Convenience partials for the two concrete fields ---------------------------

fr_add = partial(add, spec=FR)
fr_sub = partial(sub, spec=FR)
fr_mul = partial(mul, spec=FR)
fr_inv = partial(inv, spec=FR)
fq_add = partial(add, spec=FQ)
fq_sub = partial(sub, spec=FQ)
fq_mul = partial(mul, spec=FQ)
fq_inv = partial(inv, spec=FQ)
