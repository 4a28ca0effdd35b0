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

import jax
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
    check_hole: bool = True,
    lanes: int | None = None,
    mesh=None,
) -> Jacobian:
    """Commit(info, max, f(X)) -> F  (CommitmentScheme.hs:20-33).

    MSM of f's coefficients against g^{alpha x^{d-max+e}} table rows.
    `lanes` overrides the Pippenger lane count (compile-size knob).

    The merged tables hold exponents in [-d, d]; anything outside raises
    IndexError with the reference's panic semantics
    (CommitmentScheme.hs:70-73). A NONZERO coefficient at the shifted X^0
    slot is the reference's `index (-1)` panic on gNegativeAlphaX
    (g^alpha is deliberately absent, SRS.hs:38-39) — checked host-side by
    default; skipped when the coefficients are tracers (inside jit the
    value is unknowable at trace time; the e=0 table row is the point at
    infinity, so a zero coefficient stays harmless).
    """
    diff = srs.d - maxm
    lo = f.offset + diff  # lowest shifted exponent
    hi = lo + f.length - 1
    if lo < -srs.d or hi > srs.d:
        raise IndexError(
            f"commitPoly: exponent range [{lo}, {hi}] outside SRS (d={srs.d})"
        )
    if check_hole and lo <= 0 <= hi:
        c0 = f.coeffs[-lo]
        if not isinstance(c0, jax.core.Tracer) and not bool(
            np.all(np.asarray(c0) == 0)
        ):
            raise IndexError(
                "commitPoly: nonzero coefficient at alpha*x^0 (g^alpha is "
                "not in the SRS)"
            )
    pts = _slice_table(srs.g_ax, lo + srs.d, f.length)
    scalars = limb.from_mont(f.coeffs, FR)
    if mesh is not None:
        from .parallel.mesh import msm_sharded

        kw = {} if lanes is None else {"lanes_per_device": lanes}
        return msm_sharded(g1, pts, scalars, mesh, **kw)
    kw = {} if lanes is None else {"lanes": lanes}
    return msm(g1, pts, scalars, **kw)


def open_poly(srs: SRS, z, f: Laurent, lanes: int | None = None, mesh=None):
    """Open(info, F, z, f(X)) -> (f(z), W)  (CommitmentScheme.hs:36-48).

    z: Fr element (Montgomery limbs). Returns (f(z) Montgomery limbs,
    W Jacobian).
    """
    fz, w = div_by_linear(f, z)
    lo = w.offset
    hi = lo + w.length - 1
    if lo < -srs.d or hi > srs.d:
        raise IndexError(
            f"openPoly: exponent range [{lo}, {hi}] outside SRS (d={srs.d})"
        )
    pts = _slice_table(srs.g_x, lo + srs.d, w.length)
    scalars = limb.from_mont(w.coeffs, FR)
    if mesh is not None:
        from .parallel.mesh import msm_sharded

        kw = {} if lanes is None else {"lanes_per_device": lanes}
        return fz, msm_sharded(g1, pts, scalars, mesh, **kw)
    kw = {} if lanes is None else {"lanes": lanes}
    return fz, msm(g1, pts, scalars, **kw)


def commit_poly_batched(
    srs: SRS,
    maxm: int,
    offset: int,
    coeffs: jnp.ndarray,
    check_hole: bool = True,
    lanes: int | None = None,
    mesh=None,
) -> Jacobian:
    """M commitments sharing one exponent span: coeffs (M, D, L) Montgomery
    at a common Laurent `offset` -> Jacobian batch (M,).

    The hsc helper commits m shape-identical s(X, y_j) polynomials
    (Signature.hs:40-45); they all hit the SAME SRS table slice, so the
    whole batch is ONE vmapped Pippenger pipeline (msm_batched)."""
    from .msm.pippenger import msm_batched

    diff = srs.d - maxm
    lo = offset + diff
    hi = lo + coeffs.shape[1] - 1
    if lo < -srs.d or hi > srs.d:
        raise IndexError(
            f"commitPoly: exponent range [{lo}, {hi}] outside SRS (d={srs.d})"
        )
    if check_hole and lo <= 0 <= hi:
        c0 = coeffs[:, -lo]
        if not isinstance(c0, jax.core.Tracer) and not bool(
            np.all(np.asarray(c0) == 0)
        ):
            raise IndexError(
                "commitPoly: nonzero coefficient at alpha*x^0 (g^alpha is "
                "not in the SRS)"
            )
    pts = _slice_table(srs.g_ax, lo + srs.d, coeffs.shape[1])
    scalars = limb.from_mont(coeffs, FR)
    kw = {} if lanes is None else {"lanes": lanes}
    return msm_batched(g1, pts, scalars, mesh=mesh, **kw)


def open_poly_batched(
    srs: SRS,
    zs: jnp.ndarray,
    offset: int,
    coeffs: jnp.ndarray,
    lanes: int | None = None,
    mesh=None,
):
    """M openings sharing one exponent span: coeffs (M, D, L) at `offset`,
    zs (M, L) Montgomery -> (fz (M, L), W Jacobian batch (M,)).

    Covers all three hsc opening families (each is shape-uniform across j:
    s(X,y_j) at z_j, s(X,y_j) at u, s(u,Y) at y_j — Signature.hs:46-57)."""
    from .msm.pippenger import msm_batched
    from .poly.laurent import div_by_linear_batched

    fz, w = div_by_linear_batched(offset, coeffs, zs)
    lo = offset
    hi = lo + w.shape[1] - 1
    if lo < -srs.d or hi > srs.d:
        raise IndexError(
            f"openPoly: exponent range [{lo}, {hi}] outside SRS (d={srs.d})"
        )
    pts = _slice_table(srs.g_x, lo + srs.d, w.shape[1])
    scalars = limb.from_mont(w, FR)
    kw = {} if lanes is None else {"lanes": lanes}
    return fz, msm_batched(g1, pts, scalars, mesh=mesh, **kw)


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


def _host_msm(points, scalars):
    """Host-side G1 MSM (native Pippenger when built, golden otherwise)."""
    from .native import g1_msm_native

    res = g1_msm_native(points, scalars)
    if res is not NotImplemented:
        return res
    return gc.g1_msm(points, scalars)


def pcv_batch(srs: SRS, checks) -> bool:
    """Verify a list of pcV checks (maxm, F, z, v, W) as ONE pairing product
    via random linear combination.

    Each check i is the reference's 3-pairing equation
    (CommitmentScheme.hs:58-68):
        e(W_i, h^{ax}) * e(g^{v_i} W_i^{-z_i}, h^a) * e(F_i^{-1}, h^{x^{-d+max_i}}) = 1.
    Raising check i to a fresh 128-bit rho_i and multiplying them out gives
        e(sum rho_i W_i, h^{ax})
      * e(g^{sum rho_i v_i} + sum -rho_i z_i W_i, h^a)
      * prod_{distinct max} e(-sum_{i in grp} rho_i F_i, h^{x^{-d+max}}) = 1,
    i.e. three host MSMs + ONE pairing product of 2 + #distinct-max pairs —
    instead of 3 pairings per check. Soundness error <= k * 2^-128 (a bad
    check survives only if the rho-combination cancels, Schwartz-Zippel on
    the verifier's own randomness). Set SONIC_TPU_NO_BATCH_PCV=1 to force
    the reference's check-by-check evaluation."""
    import os
    import secrets

    if not checks:
        return True
    if os.environ.get("SONIC_TPU_NO_BATCH_PCV"):
        return all(pcv(srs, *c) for c in checks)
    P = gp.P
    rhos = [secrets.randbits(128) | 1 for _ in checks]
    a_pts, a_sc = [], []
    b_pts, b_sc = [], []
    groups: dict = {}
    vsum = 0
    for rho, (maxm, F, z, v, w) in zip(rhos, checks):
        a_pts.append(w)
        a_sc.append(rho)
        b_pts.append(w)
        b_sc.append((-rho * z) % P)
        vsum = (vsum + rho * v) % P
        groups.setdefault(maxm, []).append((F, rho))
    b_pts.append(gc.G1_GEN)
    b_sc.append(vsum)
    A = _host_msm(a_pts, a_sc)
    B = _host_msm(b_pts, b_sc)
    pairs = [(A, srs.h_ax_at(1)), (B, srs.h_ax_at(0))]
    for maxm, items in groups.items():
        cm = _host_msm([f for f, _ in items], [r_ for _, r_ in items])
        pairs.append(
            (None if cm is None else gc.g1_neg(cm), srs.h_x_at(-srs.d + maxm))
        )
    return pr.pairing_product_is_one(pairs)


def jacobian_to_host(p: Jacobian):
    """Unbatched device Jacobian -> host affine tuple (or None)."""
    aff = g1.to_affine(p)
    if bool(np.asarray(aff.inf)):
        return None
    from .fields.limb import FQ

    return (int(FQ.to_int(aff.x)), int(FQ.to_int(aff.y)))


def jacobians_to_host(p: Jacobian) -> list:
    """Batched device Jacobian (leading axis M) -> list of host affine
    tuples (None for infinity). One batched to_affine (one batch_inv)
    instead of M separate conversions."""
    aff = g1.to_affine(p)
    from .fields.limb import FQ

    xs = np.atleast_1d(FQ.to_int(aff.x))
    ys = np.atleast_1d(FQ.to_int(aff.y))
    infs = np.asarray(aff.inf)
    return [
        None if infs[i] else (int(xs[i]), int(ys[i]))
        for i in range(infs.shape[0])
    ]
