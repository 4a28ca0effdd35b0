"""Polynomial commitment scheme — device commit/open, host pairing check.

Reference: src/Sonic/CommitmentScheme.hs. The bounded-max-degree trick
(shift by X^{d-max}, :31-33) becomes a pure index offset into the merged
SRS tables, so every commit/open is: static table slice -> Pippenger MSM.

Exact reference conventions preserved:
  - commit uses the alpha tables; the shifted polynomial must not have a
    nonzero X^0 coefficient (g^alpha is omitted). The e=0 table slot is the
    point at infinity, so a zero coefficient there is harmless; a NONZERO
    one is a protocol violation which `commit` can optionally detect.
  - exponent-range overflows raise IndexError with the same meaning as the
    reference's `index` panic (CommitmentScheme.hs:70-73).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .curve.group import g1, Jacobian, Affine
from .fields import limb
from .fields.limb import FR
from .msm.pippenger import msm
from .poly.laurent import Laurent, div_by_linear, evaluate
from .srs import SRS
from . import golden_protocol as gp
from .pairing import host as pr
from . import golden as gc


def _slice_table(tab: Affine, start: int, length: int) -> Affine:
    return Affine(
        tab.x[start : start + length],
        tab.y[start : start + length],
        tab.inf[start : start + length],
    )


def commit_poly(
    srs: SRS,
    maxm: int,
    f: Laurent,
    check_hole: bool = False,
    lanes: int | None = None,
) -> Jacobian:
    """Commit(info, max, f(X)) -> F  (CommitmentScheme.hs:20-33).

    MSM of f's coefficients against g^{alpha x^{d-max+e}} table rows.
    `lanes` overrides the Pippenger lane count (compile-size knob).
    """
    diff = srs.d - maxm
    lo = f.offset + diff  # lowest shifted exponent
    hi = lo + f.length - 1
    if lo + srs.d < 0 or hi > 2 * srs.d:
        raise IndexError(
            f"commitPoly: exponent range [{lo}, {hi}] outside SRS (d={srs.d})"
        )
    if check_hole and 0 >= lo and 0 <= hi:
        c0 = f.coeffs[-lo]
        if not bool(np.all(np.asarray(c0) == 0)):
            raise IndexError(
                "commitPoly: nonzero coefficient at alpha*x^0 (g^alpha is "
                "not in the SRS)"
            )
    pts = _slice_table(srs.g_ax, lo + srs.d, f.length)
    scalars = limb.from_mont(f.coeffs, FR)
    kw = {} if lanes is None else {"lanes": lanes}
    return msm(g1, pts, scalars, **kw)


def open_poly(srs: SRS, z, f: Laurent, lanes: int | None = None):
    """Open(info, F, z, f(X)) -> (f(z), W)  (CommitmentScheme.hs:36-48).

    z: Fr element (Montgomery limbs). Returns (f(z) Montgomery limbs,
    W Jacobian).
    """
    fz, w = div_by_linear(f, z)
    lo = w.offset
    hi = lo + w.length - 1
    if lo + srs.d < 0 or hi > 2 * srs.d:
        raise IndexError(
            f"openPoly: exponent range [{lo}, {hi}] outside SRS (d={srs.d})"
        )
    pts = _slice_table(srs.g_x, lo + srs.d, w.length)
    scalars = limb.from_mont(w.coeffs, FR)
    kw = {} if lanes is None else {"lanes": lanes}
    return fz, msm(g1, pts, scalars, **kw)


def pcv(srs: SRS, maxm: int, commitment, z: int, v: int, w) -> bool:
    """pcV(info, max, F, z, (v, W)) — host pairing check
    (CommitmentScheme.hs:51-68). commitment/w: host G1 affine tuples;
    z, v: python ints."""
    diff = -srs.d + maxm
    hxi = srs.h_x_at(diff)
    h_a = srs.h_ax_at(0)
    h_ax = srs.h_ax_at(1)
    gv_wz = gc.g1_add(
        gc.g1_mul(gc.G1_GEN, v), gc.g1_mul(w, (-z) % gp.P)
    )
    return pr.pairing_product_is_one(
        [(w, h_ax), (gv_wz, h_a), (gc.g1_neg(commitment), hxi)]
    )


def jacobian_to_host(p: Jacobian):
    """Unbatched device Jacobian -> host affine tuple (or None)."""
    aff = g1.to_affine(p)
    if bool(np.asarray(aff.inf)):
        return None
    from .fields.limb import FQ

    return (int(FQ.to_int(aff.x)), int(FQ.to_int(aff.y)))
