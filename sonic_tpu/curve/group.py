"""Complete projective elliptic-curve group ops over limb fields.

TPU-native equivalent of the reference's `elliptic-curve` package
(SURVEY.md §2.3): `gen`, `mul`, point add — vectorized over batches of
points using the COMPLETE addition formulas of Renes-Costello-Batina 2016
(eprint 2015/1060, a=0 algorithms 7-9). Complete formulas are exactly what
a TPU wants: one straight-line multiply sequence valid for ALL inputs
(doubling, infinity, inverse pairs) — no per-edge-case selects, no parallel
doubling computed just to patch P=Q, ~40% fewer field muls per addition
than a select-patched Jacobian law.

Both BLS12-381 groups share the short-Weierstrass a=0 shape:
  G1: y^2 = x^3 + 4       over Fq   (coords shape (..., L)),   3b = 12
  G2: y^2 = x^3 + 4(u+1)  over Fq2  (coords shape (..., 2, L)), 3b = 12+12u

Homogeneous projective coordinates (X : Y : Z), affine = (X/Z, Y/Z),
infinity = (0 : 1 : 0) (any Z=0 representative decodes as infinity).

Valid on the prime-order subgroups (completeness needs odd group order —
BLS12-381 G1/G2 subgroup points only, which is all this library produces).
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import limb, ext
from ..fields.limb import FQ
from ..fields import constants as C


class Jacobian(NamedTuple):
    """Projective point (X : Y : Z). (Name kept from the earlier Jacobian
    representation — all call sites treat it as an opaque device point.)"""

    x: Any
    y: Any
    z: Any


Point = Jacobian


class Affine(NamedTuple):
    x: Any
    y: Any
    inf: Any  # bool (...,): True = point at infinity


class _FqOps:
    """Uniform field-op namespace for Fq (G1 coordinates)."""

    name = "fq"
    coord_ndim = 1

    @staticmethod
    def add(a, b):
        return limb.add(a, b, FQ)

    @staticmethod
    def sub(a, b):
        return limb.sub(a, b, FQ)

    @staticmethod
    def mul(a, b):
        return limb.mul(a, b, FQ)

    @staticmethod
    def sqr(a):
        return limb.mul(a, a, FQ)

    @staticmethod
    def neg(a):
        return limb.neg(a, FQ)

    @staticmethod
    def mul_small(a, k):
        return limb.mul_small(a, k, FQ)

    @staticmethod
    def mul_b3(a):
        return limb.mul_small(a, 12, FQ)  # 3b for b = 4

    @staticmethod
    def is_zero(a):
        return jnp.all(a == 0, axis=-1)

    @staticmethod
    def eq(a, b):
        return jnp.all(a == b, axis=-1)

    @staticmethod
    def select(cond, a, b):
        return jnp.where(cond[..., None], a, b)

    @staticmethod
    def zeros(shape=()):
        return FQ.zeros(shape)

    @staticmethod
    def ones(shape=()):
        return FQ.ones(shape)

    @staticmethod
    def batch_inv(a):
        return limb.batch_inv(a, FQ)

    @staticmethod
    def mul_many(pairs):
        return limb.mul_many(pairs, FQ)

    @staticmethod
    def add_many(pairs):
        return limb.add_many(pairs, FQ)

    @staticmethod
    def sub_many(pairs):
        return limb.sub_many(pairs, FQ)


class _Fq2Ops:
    """Uniform field-op namespace for Fq2 (G2 coordinates)."""

    name = "fq2"
    coord_ndim = 2

    add = staticmethod(ext.add)
    sub = staticmethod(ext.sub)
    mul = staticmethod(ext.mul)
    sqr = staticmethod(ext.sqr)
    neg = staticmethod(ext.neg)
    mul_small = staticmethod(ext.mul_small)
    mul_b3 = staticmethod(ext.mul_b3)
    is_zero = staticmethod(ext.is_zero)
    eq = staticmethod(ext.eq)
    select = staticmethod(ext.select)
    zeros = staticmethod(ext.zeros)
    ones = staticmethod(ext.ones)
    batch_inv = staticmethod(ext.batch_inv)
    mul_many = staticmethod(ext.mul_many)
    add_many = staticmethod(ext.add_many)
    sub_many = staticmethod(ext.sub_many)


# Host-level calls pad their batch axis to a power of two (min 8) so the
# expensive jit compilations (10s each on a small host) are shared across
# every call site / test and hit the persistent compilation cache. Inside
# an enclosing jit trace the wrappers pass straight through (shapes there
# are already static and padding would only bloat the traced graph).
_MIN_BATCH = 8


def _is_traced(*arrays) -> bool:
    return any(isinstance(a, jax.core.Tracer) for a in arrays)


def _pow2_batch(n: int) -> int:
    return max(_MIN_BATCH, 1 << max(0, n - 1).bit_length())


def _canonize(arrays_tails):
    """arrays_tails: [(array, tail_ndim)] sharing a broadcastable batch
    prefix. Returns (flat padded arrays, batch shape, true length)."""
    batch = ()
    for a, t in arrays_tails:
        b = a.shape[: a.ndim - t]
        batch = np.broadcast_shapes(batch, b)
    n = int(np.prod(batch)) if batch else 1
    n_pad = _pow2_batch(n)
    outs = []
    for a, t in arrays_tails:
        tail = a.shape[a.ndim - t :] if t else ()
        a = jnp.broadcast_to(a, batch + tail)
        a = a.reshape((n,) + tail)
        if n_pad != n:
            a = jnp.pad(a, [(0, n_pad - n)] + [(0, 0)] * t)
        outs.append(a)
    return outs, batch, n


def _restore(a, batch, n: int, tail_ndim: int):
    tail = a.shape[a.ndim - tail_ndim :] if tail_ndim else ()
    return a[:n].reshape(batch + tail)


class GroupOps:
    """Curve group operations bound to one coordinate field.

    The group-law methods are total and branchless (edge cases via selects),
    so padded garbage rows are harmless and sliced away on return.
    """

    def __init__(self, F, name: str):
        self.F = F
        self.name = name

    # -- batch canonicalization ----------------------------------------------

    def _cn(self) -> int:
        return self.F.coord_ndim

    def _canon_jac(self, ps: list[Jacobian], extras=()):
        """Flatten+pad Jacobian batches (and extra (array, tail) pairs)."""
        cn = self._cn()
        pairs = []
        for p in ps:
            pairs += [(p.x, cn), (p.y, cn), (p.z, cn)]
        pairs += list(extras)
        outs, batch, n = _canonize(pairs)
        jacs = [
            Jacobian(outs[3 * i], outs[3 * i + 1], outs[3 * i + 2])
            for i in range(len(ps))
        ]
        return jacs, outs[3 * len(ps) :], batch, n

    def _restore_jac(self, p: Jacobian, batch, n) -> Jacobian:
        cn = self._cn()
        return Jacobian(
            _restore(p.x, batch, n, cn),
            _restore(p.y, batch, n, cn),
            _restore(p.z, batch, n, cn),
        )

    # -- constructors -------------------------------------------------------

    def infinity(self, shape=()) -> Jacobian:
        F = self.F
        return Jacobian(F.zeros(shape), F.ones(shape), F.zeros(shape))

    def affine_infinity(self, shape=()) -> Affine:
        F = self.F
        return Affine(
            F.zeros(shape), F.zeros(shape), jnp.ones(shape, bool)
        )

    def from_affine(self, p: Affine) -> Jacobian:
        """Affine -> projective: (x, y, 1); infinity flag -> (0, 1, 0)."""
        F = self.F
        batch = p.x.shape[: p.x.ndim - F.coord_ndim]
        one = jnp.broadcast_to(F.ones(), p.x.shape)
        x = F.select(p.inf, jnp.zeros_like(p.x), p.x)
        y = F.select(p.inf, one, p.y)
        z = F.select(p.inf, F.zeros(batch), one)
        return Jacobian(x, y, z)

    def to_affine(self, p: Jacobian) -> Affine:
        """Jacobian -> affine with ONE batch inversion over the leading axis."""
        if _is_traced(p.x, p.z):
            return self._to_affine_impl(p)
        (p_,), _, batch, n = self._canon_jac([p])
        out = self._to_affine_impl(p_)
        cn = self._cn()
        return Affine(
            _restore(out.x, batch, n, cn),
            _restore(out.y, batch, n, cn),
            _restore(out.inf, batch, n, 0),
        )

    @partial(jax.jit, static_argnums=0)
    def _to_affine_impl(self, p: Jacobian) -> Affine:
        """(X:Y:Z) -> (X/Z, Y/Z); one batch inversion over the leading axis.
        For unbatched points, adds a leading axis internally."""
        F = self.F
        squeeze = p.z.ndim == F.coord_ndim
        z = p.z[None] if squeeze else p.z
        x = p.x[None] if squeeze else p.x
        y = p.y[None] if squeeze else p.y
        inf = F.is_zero(z)
        zinv = F.batch_inv(z)
        ax = F.mul(x, zinv)
        ay = F.mul(y, zinv)
        ax = F.select(inf, jnp.zeros_like(ax), ax)
        ay = F.select(inf, jnp.zeros_like(ay), ay)
        out = Affine(ax, ay, inf)
        if squeeze:
            out = Affine(out.x[0], out.y[0], out.inf[0])
        return out

    # -- group law ----------------------------------------------------------

    def double(self, p: Jacobian) -> Jacobian:
        if _is_traced(p.x, p.z):
            return self._double_impl(p)
        (p_,), _, batch, n = self._canon_jac([p])
        return self._restore_jac(self._double_impl(p_), batch, n)

    @partial(jax.jit, static_argnums=0)
    def _double_impl(self, p: Jacobian) -> Jacobian:
        """Complete doubling (RCB16 algorithm 9, a=0): 6M + 2S + 1 mul-by-3b.
        Maps infinity -> infinity (Z3 = 8 Y^2 (YZ) = 0 when Z = 0)."""
        # 8 multiplies as two stacked mul_many calls (see _add_impl).
        F = self.F
        t0, t1, zz, xy = F.mul_many(
            [(p.y, p.y), (p.y, p.z), (p.z, p.z), (p.x, p.y)]
        )
        z3 = F.mul_small(t0, 8)
        t2 = F.mul_b3(zz)
        y3 = F.add(t0, t2)
        t0 = F.sub(t0, F.mul_small(t2, 3))
        x3, z3, ym, xm = F.mul_many(
            [(t2, z3), (t1, z3), (t0, y3), (t0, xy)]
        )
        y3 = F.add(x3, ym)
        x3 = F.mul_small(xm, 2)
        return Jacobian(x3, y3, z3)

    def add(self, p: Jacobian, q: Jacobian) -> Jacobian:
        if _is_traced(p.x, q.x):
            return self._add_impl(p, q)
        (p_, q_), _, batch, n = self._canon_jac([p, q])
        return self._restore_jac(self._add_impl(p_, q_), batch, n)

    @partial(jax.jit, static_argnums=0)
    def _add_impl(self, p: Jacobian, q: Jacobian) -> Jacobian:
        """COMPLETE projective addition (RCB16 algorithm 7, a=0):
        12M + 2 mul-by-3b, valid for every input pair — doubling, infinity
        and inverse pairs included, zero selects."""
        # The 12 multiplies run as TWO stacked mul calls (mul_many):
        # XLA compile time is superlinear in graph size, and one fully
        # unrolled add graph cost minutes of XLA:CPU compile.
        F = self.F
        sxy_p, syz_p, sxz_p, sxy_q, syz_q, sxz_q = F.add_many(
            [
                (p.x, p.y), (p.y, p.z), (p.x, p.z),
                (q.x, q.y), (q.y, q.z), (q.x, q.z),
            ]
        )
        t0, t1, t2, t3, t4, xz = F.mul_many(
            [
                (p.x, q.x), (p.y, q.y), (p.z, q.z),
                (sxy_p, sxy_q), (syz_p, syz_q), (sxz_p, sxz_q),
            ]
        )
        u01, u12, u02 = F.add_many([(t0, t1), (t1, t2), (t0, t2)])
        t3, t4, y3 = F.sub_many([(t3, u01), (t4, u12), (xz, u02)])
        # t3 = X1Y2 + X2Y1; t4 = Y1Z2 + Y2Z1; y3 = X1Z2 + X2Z1
        t0 = F.mul_small(t0, 3)  # 3 X1X2
        t2 = F.mul_b3(t2)  # 3b Z1Z2
        z3 = F.add(t1, t2)
        t1 = F.sub(t1, t2)
        y3 = F.mul_b3(y3)  # 3b (X1Z2 + X2Z1)
        m0, m1, m2, m3, m4, m5 = F.mul_many(
            [(t3, t1), (t4, y3), (t1, z3), (y3, t0), (z3, t4), (t0, t3)]
        )
        x3 = F.sub(m0, m1)
        y3, z3 = F.add_many([(m2, m3), (m4, m5)])
        return Jacobian(x3, y3, z3)

    def add_mixed(self, p: Jacobian, q: Affine) -> Jacobian:
        if _is_traced(p.x, q.x):
            return self._add_mixed_impl(p, q)
        cn = self._cn()
        (p_,), extras, batch, n = self._canon_jac(
            [p], extras=[(q.x, cn), (q.y, cn), (jnp.asarray(q.inf), 0)]
        )
        q_ = Affine(*extras)
        return self._restore_jac(self._add_mixed_impl(p_, q_), batch, n)

    @partial(jax.jit, static_argnums=0)
    def _add_mixed_impl(self, p: Jacobian, q: Affine) -> Jacobian:
        """Complete mixed addition (RCB16 algorithm 8, a=0, Z2=1):
        11M + 2 mul-by-3b. The only remaining edge is the affine side's
        infinity FLAG (no projective encoding at Z2=1) — one select."""
        # 11 multiplies as two stacked mul_many calls (see _add_impl).
        F = self.F
        sxy_p, sxy_q = F.add_many([(p.x, p.y), (q.x, q.y)])
        t0, t1, t3, yz, xz = F.mul_many(
            [(p.x, q.x), (p.y, q.y), (sxy_q, sxy_p), (q.y, p.z), (q.x, p.z)]
        )
        u01, t4, y3 = F.add_many([(t0, t1), (yz, p.y), (xz, p.x)])
        t3 = F.sub(t3, u01)  # X1Y2 + X2Y1
        t0 = F.mul_small(t0, 3)
        t2 = F.mul_b3(p.z)  # 3b Z1
        z3 = F.add(t1, t2)
        t1 = F.sub(t1, t2)
        y3 = F.mul_b3(y3)
        m0, m1, m2, m3, m4, m5 = F.mul_many(
            [(t3, t1), (t4, y3), (t1, z3), (y3, t0), (z3, t4), (t0, t3)]
        )
        x3 = F.sub(m0, m1)
        y3, z3 = F.add_many([(m2, m3), (m4, m5)])
        return self._sel(q.inf, p, Jacobian(x3, y3, z3))

    def neg(self, p: Jacobian) -> Jacobian:
        return Jacobian(p.x, self.F.neg(p.y), p.z)

    def _sel(self, cond, a: Jacobian, b: Jacobian) -> Jacobian:
        F = self.F
        return Jacobian(
            F.select(cond, a.x, b.x),
            F.select(cond, a.y, b.y),
            F.select(cond, a.z, b.z),
        )

    def _inf_like(self, p: Jacobian) -> Jacobian:
        F = self.F
        return Jacobian(
            jnp.zeros_like(p.x),
            jnp.broadcast_to(F.ones(), p.y.shape),
            jnp.zeros_like(p.z),
        )

    # -- scalar multiplication ----------------------------------------------

    def scalar_mul(self, p: Jacobian, scalar_std) -> Jacobian:
        if _is_traced(p.x, scalar_std):
            return self._scalar_mul_impl(p, scalar_std)
        (p_,), extras, batch, n = self._canon_jac(
            [p], extras=[(scalar_std, 1)]
        )
        return self._restore_jac(
            self._scalar_mul_impl(p_, extras[0]), batch, n
        )

    @partial(jax.jit, static_argnums=0)
    def _scalar_mul_impl(self, p: Jacobian, scalar_std) -> Jacobian:
        """Double-and-add, MSB-first, over the full 16*FR_LIMBS bit ladder.

        `scalar_std` is an Fr element in STANDARD (non-Montgomery) limb form,
        shape (..., FR_LIMBS) broadcast-compatible with the point batch.
        Constant 255-step lax.scan — fully batched.
        """
        F = self.F
        nbits = C.FR_BITS
        bits = _scalar_bits_msb(scalar_std, nbits)  # (nbits, ...)

        acc = self._inf_like(p)

        def body(acc, bit):
            acc = self.double(acc)
            with_p = self.add(acc, p)
            return self._sel(bit != 0, with_p, acc), None

        acc, _ = jax.lax.scan(body, acc, bits)
        return acc

    def generator(self) -> Affine:
        raise NotImplementedError


def _scalar_bits_msb(scalar_std, nbits: int):
    """(..., L) uint32 standard-form limbs -> (nbits, ...) bits, MSB first."""
    limbs_needed = (nbits + C.LIMB_BITS - 1) // C.LIMB_BITS
    bit_idx = np.arange(nbits - 1, -1, -1)  # MSB first
    limb_of = bit_idx // C.LIMB_BITS
    sh = bit_idx % C.LIMB_BITS
    sel = scalar_std[..., limb_of]  # (..., nbits)
    bits = (sel >> jnp.asarray(sh, jnp.uint32)) & 1
    return jnp.moveaxis(bits, -1, 0)


class G1(GroupOps):
    def __init__(self):
        super().__init__(_FqOps, "G1")

    def generator(self) -> Affine:
        x = FQ.from_int(C.G1_GEN_X)
        y = FQ.from_int(C.G1_GEN_Y)
        return Affine(x, y, jnp.zeros((), bool))


class G2(GroupOps):
    def __init__(self):
        super().__init__(_Fq2Ops, "G2")

    def generator(self) -> Affine:
        x = ext.from_int(C.G2_GEN_X)
        y = ext.from_int(C.G2_GEN_Y)
        return Affine(x, y, jnp.zeros((), bool))


g1 = G1()
g2 = G2()
