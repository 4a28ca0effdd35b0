"""Branchless Jacobian elliptic-curve group ops over limb fields.

TPU-native equivalent of the reference's `elliptic-curve` package
(SURVEY.md §2.3): `gen`, `mul`, point add — but vectorized over batches of
points with all edge cases (infinity, doubling, inverse pairs) handled by
`jnp.where` selects so everything jits to straight-line code.

Both BLS12-381 groups share the short-Weierstrass a=0 formulas:
  G1: y^2 = x^3 + 4       over Fq   (coords shape (..., L))
  G2: y^2 = x^3 + 4(u+1)  over Fq2  (coords shape (..., 2, L))

Jacobian coordinates (X, Y, Z), affine = (X/Z^2, Y/Z^3), infinity iff Z=0.
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
    x: Any
    y: Any
    z: Any


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
    is_zero = staticmethod(ext.is_zero)
    eq = staticmethod(ext.eq)
    select = staticmethod(ext.select)
    zeros = staticmethod(ext.zeros)
    ones = staticmethod(ext.ones)
    batch_inv = staticmethod(ext.batch_inv)


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
        return Jacobian(F.ones(shape), F.ones(shape), F.zeros(shape))

    def affine_infinity(self, shape=()) -> Affine:
        F = self.F
        return Affine(
            F.zeros(shape), F.zeros(shape), jnp.ones(shape, bool)
        )

    def from_affine(self, p: Affine) -> Jacobian:
        """Affine -> Jacobian (infinity flag -> Z=0)."""
        F = self.F
        one = jnp.broadcast_to(F.ones(), p.x.shape)
        z = F.select(p.inf, F.zeros(p.x.shape[: -F.coord_ndim]), one)
        return Jacobian(p.x, p.y, z)

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
        """For unbatched points, adds a leading axis internally."""
        F = self.F
        squeeze = p.z.ndim == F.coord_ndim
        z = p.z[None] if squeeze else p.z
        x = p.x[None] if squeeze else p.x
        y = p.y[None] if squeeze else p.y
        inf = F.is_zero(z)
        zinv = F.batch_inv(z)
        zinv2 = F.sqr(zinv)
        ax = F.mul(x, zinv2)
        ay = F.mul(y, F.mul(zinv, zinv2))
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
        """dbl-2009-l (a=0). Maps infinity -> infinity for free (Z3=2YZ=0)."""
        F = self.F
        A = F.sqr(p.x)
        B = F.sqr(p.y)
        Cc = F.sqr(B)
        D = F.mul_small(F.sub(F.sub(F.sqr(F.add(p.x, B)), A), Cc), 2)
        E = F.mul_small(A, 3)
        Ff = F.sqr(E)
        x3 = F.sub(Ff, F.mul_small(D, 2))
        y3 = F.sub(F.mul(E, F.sub(D, x3)), F.mul_small(Cc, 8))
        z3 = F.mul_small(F.mul(p.y, p.z), 2)
        return Jacobian(x3, y3, z3)

    def add(self, p: Jacobian, q: Jacobian) -> Jacobian:
        if _is_traced(p.x, q.x):
            return self._add_impl(p, q)
        (p_, q_), _, batch, n = self._canon_jac([p, q])
        return self._restore_jac(self._add_impl(p_, q_), batch, n)

    @partial(jax.jit, static_argnums=0)
    def _add_impl(self, p: Jacobian, q: Jacobian) -> Jacobian:
        """Complete Jacobian addition (add-2007-bl) with branchless edge
        handling: p=inf, q=inf, p=q (doubling), p=-q (infinity)."""
        F = self.F
        z1z1 = F.sqr(p.z)
        z2z2 = F.sqr(q.z)
        u1 = F.mul(p.x, z2z2)
        u2 = F.mul(q.x, z1z1)
        s1 = F.mul(p.y, F.mul(q.z, z2z2))
        s2 = F.mul(q.y, F.mul(p.z, z1z1))
        h = F.sub(u2, u1)
        rr = F.mul_small(F.sub(s2, s1), 2)

        i = F.sqr(F.mul_small(h, 2))
        j = F.mul(h, i)
        v = F.mul(u1, i)
        x3 = F.sub(F.sub(F.sqr(rr), j), F.mul_small(v, 2))
        y3 = F.sub(F.mul(rr, F.sub(v, x3)), F.mul_small(F.mul(s1, j), 2))
        z3 = F.mul(F.mul(h, p.z), F.mul_small(q.z, 2))
        generic = Jacobian(x3, y3, z3)

        p_inf = F.is_zero(p.z)
        q_inf = F.is_zero(q.z)
        h_zero = F.is_zero(h)
        r_zero = F.is_zero(rr)
        is_double = h_zero & r_zero & ~p_inf & ~q_inf
        is_cancel = h_zero & ~r_zero & ~p_inf & ~q_inf

        dbl = self.double(p)
        out = self._sel(is_double, dbl, generic)
        out = self._sel(is_cancel, self._inf_like(out), out)
        out = self._sel(p_inf, q, out)
        out = self._sel(q_inf, p, out)
        return out

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
        """Jacobian + affine (madd-2007-bl): saves ~4 muls; same edge cases."""
        F = self.F
        z1z1 = F.sqr(p.z)
        u2 = F.mul(q.x, z1z1)
        s2 = F.mul(q.y, F.mul(p.z, z1z1))
        h = F.sub(u2, p.x)
        rr = F.mul_small(F.sub(s2, p.y), 2)

        hh = F.sqr(h)
        i = F.mul_small(hh, 4)
        j = F.mul(h, i)
        v = F.mul(p.x, i)
        x3 = F.sub(F.sub(F.sqr(rr), j), F.mul_small(v, 2))
        y3 = F.sub(F.mul(rr, F.sub(v, x3)), F.mul_small(F.mul(p.y, j), 2))
        z3 = F.sub(F.sub(F.sqr(F.add(p.z, h)), z1z1), hh)
        generic = Jacobian(x3, y3, z3)

        p_inf = F.is_zero(p.z)
        h_zero = F.is_zero(h)
        r_zero = F.is_zero(rr)
        is_double = h_zero & r_zero & ~p_inf & ~q.inf
        is_cancel = h_zero & ~r_zero & ~p_inf & ~q.inf

        dbl = self.double(p)
        out = self._sel(is_double, dbl, generic)
        out = self._sel(is_cancel, self._inf_like(out), out)
        out = self._sel(p_inf, self.from_affine(q), out)
        out = self._sel(q.inf, p, out)
        return out

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
            jnp.broadcast_to(F.ones(), p.x.shape),
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
