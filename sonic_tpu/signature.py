"""Helper protocol — "signatures of correct computation" (device prover).

Reference: src/Sonic/Signature.hs. The m (y_j, z_j) openings are
independent (Signature.hs:40-57) — here each s(X, y_j) is constructed with
the fused builder and committed/opened via MSM; batching across j is at the
Python level per commit (the MSMs themselves are the parallel units).
"""
from __future__ import annotations

import dataclasses

from .constraints import DeviceCircuit, s_at_y, s_at_u_of_y
from .commitment import commit_poly, open_poly, jacobian_to_host, pcv
from .poly.laurent import evaluate
from .fields.limb import FR
from .srs import SRS
from . import golden_protocol as gp


def hsc_prove(srs: SRS, circuit: DeviceCircuit, yzs_m, u_m, v_m) -> gp.HscProof:
    """hscProve (Signature.hs:32-72). yzs_m: list of (y, z) Montgomery limb
    pairs; u_m, v_m: Montgomery limbs. Returns a host-form HscProof."""
    ss = []
    s_polys = []
    for y_m, z_m in yzs_m:
        s_y = s_at_y(circuit, y_m)
        s_polys.append(s_y)
        cm = commit_poly(srs, srs.d, s_y)
        fz, w = open_poly(srs, z_m, s_y)
        ss.append(
            (
                jacobian_to_host(cm),
                (int(FR.to_int(fz)), jacobian_to_host(w)),
            )
        )
    su_y = s_at_u_of_y(circuit, u_m)
    c = commit_poly(srs, srs.d, su_y)
    sw = []
    for (y_m, _z_m), s_y in zip(yzs_m, s_polys):
        _, wj2 = open_poly(srs, u_m, s_y)
        sj2, qj = open_poly(srs, y_m, su_y)
        sw.append(
            (
                int(FR.to_int(sj2)),
                jacobian_to_host(wj2),
                jacobian_to_host(qj),
            )
        )
    _, qv = open_poly(srs, v_m, su_y)
    return gp.HscProof(
        hsc_s=ss,
        hsc_w=sw,
        hsc_qv=jacobian_to_host(qv),
        hsc_c=jacobian_to_host(c),
        hsc_u=int(FR.to_int(u_m)),
        hsc_v=int(FR.to_int(v_m)),
    )


def hsc_verify(srs: SRS, circuit: DeviceCircuit, yzs, proof: gp.HscProof) -> bool:
    """hscVerify (Signature.hs:74-90): s(u,v) recomputed on device with the
    fused builder, then 3m+1 host pcV pairing checks."""
    v_m = FR.from_int(proof.hsc_v)
    u_m = FR.from_int(proof.hsc_u)
    sv = int(FR.to_int(evaluate(s_at_y(circuit, v_m), u_m)))
    ok = pcv(srs, srs.d, proof.hsc_c, proof.hsc_v, sv, proof.hsc_qv)
    for (yi, zi), (ci, (si, wi)), (si2, wi2, qi) in zip(
        yzs, proof.hsc_s, proof.hsc_w
    ):
        ok = ok and pcv(srs, srs.d, ci, zi, si, wi)
        ok = ok and pcv(srs, srs.d, ci, proof.hsc_u, si2, wi2)
        ok = ok and pcv(srs, srs.d, proof.hsc_c, yi, si2, qi)
    return ok
