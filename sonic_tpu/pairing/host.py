"""BLS12-381 optimal ate pairing on host (Python ints).

The verifier's only heavy primitive: `pcV` does 3 pairings per check
(reference src/Sonic/CommitmentScheme.hs:58-68, via the Haskell `pairing`
package). Pairing count is O(m) per verify, never O(n), so a host
implementation is the right cost tier (SURVEY.md §7 stage 3); the
sonic_tpu.native C++ extension accelerates this path when built.

Tower:  Fq2 = Fq[u]/(u^2+1)
        Fq6 = Fq2[v]/(v^3 - xi),  xi = u + 1
        Fq12 = Fq6[w]/(w^2 - v)

Elements: Fq2 = (c0, c1) ints; Fq6 = 3-tuple of Fq2; Fq12 = 2-tuple of Fq6.

G2 points live on the M-type sextic twist y^2 = x^3 + 4(u+1); they are
untwisted into E(Fq12) via psi(x, y) = (x w^-2, y w^-3) and the Miller
loop runs with generic affine line functions over Fq12.
"""
from __future__ import annotations

from ..fields.constants import Q_MOD, R_MOD, BLS_X, BLS_X_IS_NEG
from ..golden import (
    fq2_add,
    fq2_sub,
    fq2_mul,
    fq2_neg,
    fq2_inv,
    fq2_conj,
    FQ2_ONE,
    FQ2_ZERO,
)

XI = (1, 1)  # xi = u + 1

# ---------------------------------------------------------------------------
# Fq6
# ---------------------------------------------------------------------------

FQ6_ZERO = (FQ2_ZERO, FQ2_ZERO, FQ2_ZERO)
FQ6_ONE = (FQ2_ONE, FQ2_ZERO, FQ2_ZERO)


def fq6_add(a, b):
    return tuple(fq2_add(x, y) for x, y in zip(a, b))


def fq6_sub(a, b):
    return tuple(fq2_sub(x, y) for x, y in zip(a, b))


def fq6_neg(a):
    return tuple(fq2_neg(x) for x in a)


def _mul_xi(a):
    return fq2_mul(a, XI)


def fq6_mul(a, b):
    a0, a1, a2 = a
    b0, b1, b2 = b
    t0 = fq2_mul(a0, b0)
    t1 = fq2_mul(a1, b1)
    t2 = fq2_mul(a2, b2)
    c0 = fq2_add(
        t0,
        _mul_xi(
            fq2_sub(
                fq2_mul(fq2_add(a1, a2), fq2_add(b1, b2)), fq2_add(t1, t2)
            )
        ),
    )
    c1 = fq2_add(
        fq2_sub(fq2_mul(fq2_add(a0, a1), fq2_add(b0, b1)), fq2_add(t0, t1)),
        _mul_xi(t2),
    )
    c2 = fq2_add(
        fq2_sub(fq2_mul(fq2_add(a0, a2), fq2_add(b0, b2)), fq2_add(t0, t2)), t1
    )
    return (c0, c1, c2)


def fq6_inv(a):
    a0, a1, a2 = a
    c0 = fq2_sub(fq2_mul(a0, a0), _mul_xi(fq2_mul(a1, a2)))
    c1 = fq2_sub(_mul_xi(fq2_mul(a2, a2)), fq2_mul(a0, a1))
    c2 = fq2_sub(fq2_mul(a1, a1), fq2_mul(a0, a2))
    t = fq2_add(
        fq2_mul(a0, c0),
        _mul_xi(fq2_add(fq2_mul(a2, c1), fq2_mul(a1, c2))),
    )
    tinv = fq2_inv(t)
    return (fq2_mul(c0, tinv), fq2_mul(c1, tinv), fq2_mul(c2, tinv))


# ---------------------------------------------------------------------------
# Fq12
# ---------------------------------------------------------------------------

FQ12_ONE = (FQ6_ONE, FQ6_ZERO)
FQ12_ZERO = (FQ6_ZERO, FQ6_ZERO)


def fq12_add(a, b):
    return (fq6_add(a[0], b[0]), fq6_add(a[1], b[1]))


def fq12_sub(a, b):
    return (fq6_sub(a[0], b[0]), fq6_sub(a[1], b[1]))


def fq12_neg(a):
    return (fq6_neg(a[0]), fq6_neg(a[1]))


def _fq6_mul_v(a):
    # multiply by v: (a0, a1, a2) -> (xi*a2, a0, a1)
    return (_mul_xi(a[2]), a[0], a[1])


def fq12_mul(a, b):
    a0, a1 = a
    b0, b1 = b
    t0 = fq6_mul(a0, b0)
    t1 = fq6_mul(a1, b1)
    c0 = fq6_add(t0, _fq6_mul_v(t1))
    c1 = fq6_sub(fq6_mul(fq6_add(a0, a1), fq6_add(b0, b1)), fq6_add(t0, t1))
    return (c0, c1)


def fq12_sqr(a):
    return fq12_mul(a, a)


def fq12_inv(a):
    a0, a1 = a
    t = fq6_sub(fq6_mul(a0, a0), _fq6_mul_v(fq6_mul(a1, a1)))
    tinv = fq6_inv(t)
    return (fq6_mul(a0, tinv), fq6_neg(fq6_mul(a1, tinv)))


def fq12_conj(a):
    """Conjugation = Frobenius^6: a0 - a1 w."""
    return (a[0], fq6_neg(a[1]))


def fq12_pow(a, e: int):
    if e < 0:
        return fq12_pow(fq12_inv(a), -e)
    result = FQ12_ONE
    base = a
    while e:
        if e & 1:
            result = fq12_mul(result, base)
        base = fq12_sqr(base)
        e >>= 1
    return result


def fq12_eq(a, b) -> bool:
    return a == b


# scalar embeddings ---------------------------------------------------------


def fq12_from_fq(x: int):
    return (((x % Q_MOD, 0), FQ2_ZERO, FQ2_ZERO), FQ6_ZERO)


def fq12_scalar_fq(a, x: int):
    return tuple(
        tuple(
            (c[0] * x % Q_MOD, c[1] * x % Q_MOD) for c in a_i
        )
        for a_i in a
    )


# w powers: w^2 = v, w^6 = xi. Elements x*w^k for x in Fq6 handled via the
# (c0 + c1 w) representation directly.


def _w2_inv():
    """w^-2 = v^-1 as an Fq6 element: v^-1 = v^2 / xi."""
    xi_inv = fq2_inv(XI)
    return (FQ2_ZERO, FQ2_ZERO, xi_inv)  # xi^-1 * v^2


def _w3_inv():
    """w^-3 = w^-2 * w^-1; w^-1 = w / v => x*w^-3 = x * v^-2 * w^.
    Return as ('fq6 factor', uses_w) = v^-2 * w."""
    xi_inv = fq2_inv(XI)
    return (FQ2_ZERO, xi_inv, FQ2_ZERO)  # xi^-1 * v  == v^-2


def untwist(q):
    """G2 affine (x, y) over Fq2 -> point on E(Fq12).

    psi(x, y) = (x * w^-2, y * w^-3):
      x w^-2 = (x * xi^-1 * v^2, 0)           [pure c0 part]
      y w^-3 = (0, y * xi^-1 * v)             [c1 part: (y xi^-1) * v * w]
    """
    x, y = q
    xi_inv = fq2_inv(XI)
    X = ((FQ2_ZERO, FQ2_ZERO, fq2_mul(x, xi_inv)), FQ6_ZERO)
    Y = (FQ6_ZERO, (FQ2_ZERO, fq2_mul(y, xi_inv), FQ2_ZERO))
    return (X, Y)


# ---------------------------------------------------------------------------
# Miller loop with generic affine line functions over Fq12
# ---------------------------------------------------------------------------


def _ec12_double_eval(t, p):
    """Double T on E(Fq12); return (2T, line_{T,T}(P)) for P=(xp, yp) Fq ints."""
    (xt, yt) = t
    xp, yp = p
    three = fq12_from_fq(3)
    two = fq12_from_fq(2)
    lam = fq12_mul(
        fq12_mul(three, fq12_mul(xt, xt)), fq12_inv(fq12_mul(two, yt))
    )
    x3 = fq12_sub(fq12_mul(lam, lam), fq12_mul(two, xt))
    y3 = fq12_sub(fq12_mul(lam, fq12_sub(xt, x3)), yt)
    # line: (xp - xt) * lam - (yp - yt)
    lval = fq12_sub(
        fq12_mul(lam, fq12_sub(fq12_from_fq(xp), xt)),
        fq12_sub(fq12_from_fq(yp), yt),
    )
    return (x3, y3), lval


def _ec12_add_eval(t, q, p):
    """T + Q on E(Fq12); return (T+Q, line_{T,Q}(P))."""
    (xt, yt) = t
    (xq, yq) = q
    xp, yp = p
    lam = fq12_mul(fq12_sub(yq, yt), fq12_inv(fq12_sub(xq, xt)))
    x3 = fq12_sub(fq12_sub(fq12_mul(lam, lam), xt), xq)
    y3 = fq12_sub(fq12_mul(lam, fq12_sub(xt, x3)), yt)
    lval = fq12_sub(
        fq12_mul(lam, fq12_sub(fq12_from_fq(xp), xt)),
        fq12_sub(fq12_from_fq(yp), yt),
    )
    return (x3, y3), lval


def miller_loop(p, q) -> tuple:
    """f_{|t|, Q}(P) with the ate loop count |t| = BLS_X. p: G1 affine ints,
    q: G2 affine Fq2 pairs. Returns Fq12 (pre final-exponentiation),
    conjugated at the end because t < 0 for BLS12-381."""
    if p is None or q is None:
        return FQ12_ONE
    Q12 = untwist(q)
    T = Q12
    f = FQ12_ONE
    bits = bin(BLS_X)[3:]  # skip MSB
    for bit in bits:
        T, l = _ec12_double_eval(T, p)
        f = fq12_mul(fq12_sqr(f), l)
        if bit == "1":
            T, l = _ec12_add_eval(T, Q12, p)
            f = fq12_mul(f, l)
    if BLS_X_IS_NEG:
        f = fq12_conj(f)
    return f


_FINAL_EXP = (Q_MOD**12 - 1) // R_MOD


def final_exponentiation(f) -> tuple:
    """f^((q^12-1)/r). Easy part via conj/inv + Frobenius-free pow for the
    hard part (generic square-and-multiply; optimized later)."""
    # easy part: f^(q^6-1) = conj(f) * f^-1 ; then ^(q^2+1)
    f1 = fq12_mul(fq12_conj(f), fq12_inv(f))
    f2 = fq12_mul(fq12_pow(f1, Q_MOD**2), f1)
    # hard part: ^((q^4 - q^2 + 1) / r)
    hard = (Q_MOD**4 - Q_MOD**2 + 1) // R_MOD
    return fq12_pow(f2, hard)


def pairing(p, q) -> tuple:
    """Full optimal ate pairing e(P, Q) -> Fq12 (GT). None inputs -> 1."""
    return final_exponentiation(miller_loop(p, q))


def pairing_product(pairs) -> tuple:
    """prod e(P_i, Q_i): shared final exponentiation over the Miller products.

    This is how pcV's 3-pairing check should be evaluated (one final exp
    instead of three)."""
    f = FQ12_ONE
    for p, q in pairs:
        f = fq12_mul(f, miller_loop(p, q))
    return final_exponentiation(f)


def pairing_product_is_one(pairs) -> bool:
    """prod e(P_i, Q_i) == 1 — the shape of every pcV check. Dispatches to
    the native C++ library when built (sonic_tpu/native.py), else Python."""
    from ..native import pairing_product_is_one_native

    native = pairing_product_is_one_native(pairs)
    if native is not None:
        return native
    return pairing_product(pairs) == FQ12_ONE
