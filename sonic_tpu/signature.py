"""Helper protocol — "signatures of correct computation" (device prover).

Reference: src/Sonic/Signature.hs. The m (y_j, z_j) openings are
independent and shape-identical (Signature.hs:40-57 is a pure `<$>` over
yzs), so the whole helper runs as a handful of BATCHED device pipelines:
one vmapped s(X, y_j) build, one batched commit MSM, and three batched
opening MSMs — sublinear dispatch count in m, versus 4m+2 sequential
MSMs for a loop-per-j prover (SURVEY.md §2.3, batch-parallel proving).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .constraints import DeviceCircuit, s_at_y, s_at_y_batched, s_at_u_of_y
from .commitment import (
    commit_poly,
    commit_poly_batched,
    open_poly,
    open_poly_batched,
    jacobian_to_host,
    jacobians_to_host,
    pcv,
)
from .poly.laurent import evaluate
from .fields.limb import FR
from .srs import SRS
from . import golden_protocol as gp


def hsc_prove_device(
    srs: SRS, circuit: DeviceCircuit, ys, zs, u_m, v_m, mesh=None
):
    """Device compute of hscProve (Signature.hs:32-72): the vmapped
    s(X, y_j) builds, the batched commit, and the three batched opening
    families — NO host round-trips (fully traceable, so it runs under the
    fused prover jit and inside Fiat–Shamir device proving too).

    ys, zs: (m, L) Montgomery challenge stacks, m >= 1. Returns
    (cms, ws, w2, qs, c, qv [device Jacobians], fzs, s2 [(m, L) Montgomery
    evaluations]).

    check_hole=False on the commits: s's X^0 coefficient is an explicit
    zero row by construction (constraints._s_at_y_coeffs — sPoly has no
    X^0 term, Constraints.hs:34-53), and s(u, Y)'s Y^0 coefficient is
    structurally absent too, so the reference's g^alpha panic cannot
    trigger here; skipping the check avoids m blocking device fetches
    mid-pipeline."""
    s_coeffs, cms, fzs, ws = hsc_sj_device(srs, circuit, ys, zs, mesh=mesh)
    c, w2, s2, qs, qv = hsc_cu_device(
        srs, circuit, s_coeffs, u_m, ys, v_m, mesh=mesh
    )
    return cms, ws, w2, qs, c, qv, fzs, s2


def hsc_sj_device(srs: SRS, circuit: DeviceCircuit, ys, zs, mesh=None):
    """The S_j block of hscProve (Signature.hs:40-47): batched s(X, y_j)
    builds, batched commit, batched opening at z_j. Shared by the
    interactive prover and the Fiat-Shamir device prover (which must
    squeeze the u challenge between this block and hsc_cu_device)."""
    n = circuit.n
    s_coeffs = s_at_y_batched(circuit, ys)  # (m, 3n+1, L)
    cms = commit_poly_batched(
        srs, srs.d, -n, s_coeffs, check_hole=False, mesh=mesh
    )
    fzs, ws = open_poly_batched(srs, zs, -n, s_coeffs, mesh=mesh)
    return s_coeffs, cms, fzs, ws


def hsc_cu_device(
    srs: SRS,
    circuit: DeviceCircuit,
    s_coeffs,
    u_m,
    ys,
    v_m,
    mesh=None,
    su_y=None,
    c=None,
):
    """The C/u/v block of hscProve (Signature.hs:48-63): commit s(u, Y),
    open the s(X, y_j) batch at u, open s(u, Y) at each y_j and at v.
    su_y/c may be passed in when already computed (the Fiat-Shamir prover
    must commit C and squeeze v before this block can run)."""
    n = circuit.n
    m = ys.shape[0]
    if su_y is None:
        su_y = s_at_u_of_y(circuit, u_m)
    if c is None:
        c = commit_poly(srs, srs.d, su_y, check_hole=False)
    us = jnp.broadcast_to(u_m, ys.shape)
    _, w2 = open_poly_batched(srs, us, -n, s_coeffs, mesh=mesh)
    su_b = jnp.broadcast_to(su_y.coeffs[None], (m,) + su_y.coeffs.shape)
    s2, qs = open_poly_batched(srs, ys, su_y.offset, su_b, mesh=mesh)
    _, qv = open_poly(srs, v_m, su_y)
    return c, w2, s2, qs, qv


def hsc_prove(
    srs: SRS, circuit: DeviceCircuit, yzs_m, u_m, v_m, mesh=None
) -> gp.HscProof:
    """hscProve (Signature.hs:32-72). yzs_m: list of (y, z) Montgomery limb
    pairs; u_m, v_m: Montgomery limbs. Returns a host-form HscProof.

    All device work runs first (hsc_prove_device — async dispatch, no
    blocking reads), then the 4m+2 points convert in ONE batched
    to_affine/fetch and the 2m evaluations in one more.

    With `mesh`, the batched commit/opening MSMs data-parallelize over the
    m helper instances (msm_batched's M axis shards across devices)."""
    m = len(yzs_m)
    if m == 0:
        su_y = s_at_u_of_y(circuit, u_m)
        c = commit_poly(srs, srs.d, su_y)
        _, qv = open_poly(srs, v_m, su_y)
        return gp.HscProof(
            hsc_s=[], hsc_w=[], hsc_qv=jacobian_to_host(qv),
            hsc_c=jacobian_to_host(c),
            hsc_u=int(FR.to_int(u_m)), hsc_v=int(FR.to_int(v_m)),
        )
    ys = jnp.stack([y for y, _ in yzs_m])  # (m, L)
    zs = jnp.stack([z for _, z in yzs_m])
    cms, ws, w2, qs, c, qv, fzs, s2 = hsc_prove_device(
        srs, circuit, ys, zs, u_m, v_m, mesh=mesh
    )

    from .curve.group import Jacobian

    allj = Jacobian(
        jnp.concatenate(
            [cms.x, ws.x, w2.x, qs.x, jnp.stack([c.x, qv.x])], 0
        ),
        jnp.concatenate(
            [cms.y, ws.y, w2.y, qs.y, jnp.stack([c.y, qv.y])], 0
        ),
        jnp.concatenate(
            [cms.z, ws.z, w2.z, qs.z, jnp.stack([c.z, qv.z])], 0
        ),
    )
    pts = jacobians_to_host(allj)
    evs = [int(v) for v in FR.to_int(jnp.concatenate([fzs, s2], 0))]
    cms_h, ws_h = pts[:m], pts[m : 2 * m]
    w2_h, qs_h = pts[2 * m : 3 * m], pts[3 * m : 4 * m]
    c_h, qv_h = pts[4 * m], pts[4 * m + 1]
    fzs_i, s2_i = evs[:m], evs[m:]
    return gp.HscProof(
        hsc_s=[(cms_h[j], (fzs_i[j], ws_h[j])) for j in range(m)],
        hsc_w=[(s2_i[j], w2_h[j], qs_h[j]) for j in range(m)],
        hsc_qv=qv_h,
        hsc_c=c_h,
        hsc_u=int(FR.to_int(u_m)),
        hsc_v=int(FR.to_int(v_m)),
    )


def hsc_assemble(
    B: int,
    m: int,
    c_list,
    qv_list,
    cms,
    fzs,
    ws,
    s2,
    w2,
    qs,
    us,
    vs,
) -> list:
    """Reassemble per-proof HscProofs from the flat (B*m) batched pipeline
    outputs of prove_batch (same field layout as hsc_prove)."""
    out = []
    for b in range(B):
        sl = slice(b * m, (b + 1) * m)
        ss = [
            (cms[i], (fzs[i], ws[i])) for i in range(sl.start, sl.stop)
        ]
        sw = [(s2[i], w2[i], qs[i]) for i in range(sl.start, sl.stop)]
        out.append(
            gp.HscProof(
                hsc_s=ss,
                hsc_w=sw,
                hsc_qv=qv_list[b],
                hsc_c=c_list[b],
                hsc_u=us[b],
                hsc_v=vs[b],
            )
        )
    return out


def hsc_checks(
    srs: SRS, circuit: DeviceCircuit, yzs, proof: gp.HscProof
) -> list:
    """The 3m+1 pcV checks of hscVerify (Signature.hs:74-90) as
    (maxm, F, z, v, W) tuples; s(u,v) recomputed on device with the fused
    builder. Callers feed these to pcv_batch (possibly merged with the
    outer protocol's checks) or evaluate them one by one."""
    v_m = FR.from_int(proof.hsc_v)
    u_m = FR.from_int(proof.hsc_u)
    sv = int(FR.to_int(evaluate(s_at_y(circuit, v_m), u_m)))
    checks = [(srs.d, proof.hsc_c, proof.hsc_v, sv, proof.hsc_qv)]
    for (yi, zi), (ci, (si, wi)), (si2, wi2, qi) in zip(
        yzs, proof.hsc_s, proof.hsc_w
    ):
        checks.append((srs.d, ci, zi, si, wi))
        checks.append((srs.d, ci, proof.hsc_u, si2, wi2))
        checks.append((srs.d, proof.hsc_c, yi, si2, qi))
    return checks


def hsc_verify(srs: SRS, circuit: DeviceCircuit, yzs, proof: gp.HscProof) -> bool:
    """hscVerify (Signature.hs:74-90): one batched random-linear-combination
    pairing product over the 3m+1 pcV checks (commitment.pcv_batch).

    With SONIC_TPU_NO_BATCH_PCV=1 the checks run individually on a thread
    pool instead (the native pairing call releases the GIL, so the pool
    uses every host core) — the reference's exact check-by-check shape."""
    import os

    from .commitment import pcv_batch

    checks = hsc_checks(srs, circuit, yzs, proof)
    if not os.environ.get("SONIC_TPU_NO_BATCH_PCV"):
        return pcv_batch(srs, checks)
    from concurrent.futures import ThreadPoolExecutor

    # warm the memoized h-row fetches before fanning out (they touch jax;
    # the lazily-memoized SRS._h_cache is not thread-safe)
    for maxm in {c[0] for c in checks}:
        srs.h_x_at(-srs.d + maxm)
    srs.h_ax_at(0)
    srs.h_ax_at(1)
    if not pcv(srs, *checks[0]):
        return False
    if len(checks) == 1:
        return True
    with ThreadPoolExecutor() as pool:
        results = list(pool.map(lambda a: pcv(srs, *a), checks[1:]))
    return all(results)
