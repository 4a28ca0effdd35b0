"""Fq2 = Fq[u]/(u^2 + 1) over limb arrays — the G2 coordinate field.

Elements have shape (..., 2, L): component axis (c0, c1) then limbs.
Mirrors the extension-field layer of the reference's `pairing` package
(reference uses G2 over Fq2 for the SRS h-tables, src/Sonic/SRS.hs:14-21).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import limb
from .limb import FQ


def make(c0, c1):
    return jnp.stack([c0, c1], axis=-2)


def c0(a):
    return a[..., 0, :]


def c1(a):
    return a[..., 1, :]


def zeros(shape=()):
    return jnp.zeros(tuple(shape) + (2, FQ.nlimbs), jnp.uint32)


def ones(shape=()):
    return make(FQ.ones(shape), FQ.zeros(shape))


def from_int(pair, mont: bool = True):
    """(c0, c1) python ints -> limb element."""
    a, b = pair
    return make(FQ.from_int(a, mont), FQ.from_int(b, mont))


def to_int(a, mont: bool = True):
    return (FQ.to_int(c0(a), mont), FQ.to_int(c1(a), mont))


def add(a, b):
    return limb.add(a, b, FQ)  # componentwise; broadcasting over (..., 2, L)


def sub(a, b):
    return limb.sub(a, b, FQ)


def neg(a):
    return limb.neg(a, FQ)


@jax.jit
def mul(a, b):
    # Karatsuba with u^2 = -1:
    # (a0 + a1 u)(b0 + b1 u) = (a0 b0 - a1 b1) + ((a0+a1)(b0+b1) - a0 b0 - a1 b1) u
    a0, a1, b0, b1 = c0(a), c1(a), c0(b), c1(b)
    t0 = limb.mul(a0, b0, FQ)
    t1 = limb.mul(a1, b1, FQ)
    t2 = limb.mul(limb.add(a0, a1, FQ), limb.add(b0, b1, FQ), FQ)
    r0 = limb.sub(t0, t1, FQ)
    r1 = limb.sub(t2, limb.add(t0, t1, FQ), FQ)
    return make(r0, r1)


@jax.jit
def sqr(a):
    # (a0 + a1 u)^2 = (a0+a1)(a0-a1) + 2 a0 a1 u
    a0, a1 = c0(a), c1(a)
    r0 = limb.mul(limb.add(a0, a1, FQ), limb.sub(a0, a1, FQ), FQ)
    r1 = limb.mul_small(limb.mul(a0, a1, FQ), 2, FQ)
    return make(r0, r1)


def mul_small(a, k: int):
    return limb.mul_small(a, k, FQ)


def mul_b3(a):
    """a * 3b for the G2 curve constant b = 4(u+1): 3b = 12 + 12u.
    (a0 + a1 u)(12 + 12u) = 12(a0 - a1) + 12(a0 + a1) u   (u^2 = -1)."""
    a0, a1 = c0(a), c1(a)
    m = make(limb.sub(a0, a1, FQ), limb.add(a0, a1, FQ))
    return limb.mul_small(m, 12, FQ)


_stack_pairs = limb._stack_pairs


def mul_many(pairs):
    """k independent Fq2 products as one stacked karatsuba (3 limb muls
    total, regardless of k) — keeps curve-formula graphs small."""
    sa, sb, k = _stack_pairs(pairs)
    out = mul(sa, sb)
    return [out[i] for i in range(k)]


def add_many(pairs):
    sa, sb, k = _stack_pairs(pairs)
    out = add(sa, sb)
    return [out[i] for i in range(k)]


def sub_many(pairs):
    sa, sb, k = _stack_pairs(pairs)
    out = sub(sa, sb)
    return [out[i] for i in range(k)]


@jax.jit
def inv(a):
    # 1/(a0 + a1 u) = (a0 - a1 u) / (a0^2 + a1^2);  0 -> 0 (limb.inv(0)=0)
    a0, a1 = c0(a), c1(a)
    norm = limb.add(limb.mul(a0, a0, FQ), limb.mul(a1, a1, FQ), FQ)
    ninv = limb.inv(norm, FQ)
    return make(limb.mul(a0, ninv, FQ), limb.neg(limb.mul(a1, ninv, FQ), FQ))


def batch_inv(a):
    """Batch inversion along leading axis via norm trick on components."""
    a0, a1 = c0(a), c1(a)
    norm = limb.add(limb.mul(a0, a0, FQ), limb.mul(a1, a1, FQ), FQ)
    ninv = limb.batch_inv(norm, FQ)
    return make(limb.mul(a0, ninv, FQ), limb.neg(limb.mul(a1, ninv, FQ), FQ))


def is_zero(a):
    return jnp.all(a == 0, axis=(-1, -2))


def eq(a, b):
    return jnp.all(a == b, axis=(-1, -2))


def select(cond, a, b):
    return jnp.where(cond[..., None, None], a, b)
