"""The Sonic protocol — TPU prover and (hybrid) verifier.

Reference: src/Sonic/Protocol.hs. Same interactive structure and RndOracle
shape (prover-supplied challenges; no Fiat-Shamir in the reference —
SURVEY.md §3.4); the heavy prover steps run on device:

  zkP_1  r'(X,1) build + commit           -> fused build + MSM
  zkP_2  t(X,y) = r(X,1)(r(X,y)+s(X,y))-k(y) -> dense Laurent product
  zkP_3  three openings                   -> synthetic division + MSM
  helper hscProve                         -> m fused builds + MSMs

The verifier recomputes s/k on device but checks pairings on host
(pairing count is O(m), never O(n) — SURVEY.md §3.2).

Proofs are returned in host (golden_protocol) form, so the golden and TPU
paths are directly comparable bit-for-bit.
"""
from __future__ import annotations

from .circuit import ArithCircuit, Assignment
from .constraints import (
    DeviceAssignment,
    DeviceCircuit,
    k_at_y,
    r_at_y,
    r_x1_poly,
    s_at_y,
)
from .commitment import commit_poly, open_poly, jacobian_to_host, pcv
from .poly import laurent
from .poly.laurent import Laurent, evaluate
from .fields import limb
from .fields.limb import FR
from .signature import hsc_prove, hsc_verify
from .srs import SRS
from . import golden_protocol as gp


def prove(
    srs: SRS,
    assignment: DeviceAssignment,
    circuit: DeviceCircuit,
    rnd: gp.Randomness,
    mesh=None,
) -> tuple[gp.Proof, gp.RndOracle]:
    """Protocol.hs:47-109 with explicit randomness; device compute.

    With `mesh`, the heavy stages distribute over the device mesh
    (SURVEY.md §2.3 parallelism rows): commit/open MSMs shard their
    Pippenger lane axis (cross-device bucket-grid reduction over ICI),
    the t(X,y) product runs the four-step all-to-all NTT, and the hsc
    helper's batched MSMs shard over the m helper instances. Proof bits
    are identical to the single-device path.
    """
    n = assignment.n
    if srs.d < 7 * n:
        raise ValueError(
            f"Parameter d is not large enough: {srs.d} should be > {7 * n}"
        )
    # -- zkP_1: blind & commit r
    cns_m = FR.from_int(rnd.cns)
    r1 = r_x1_poly(assignment, cns_m)  # r'(X, 1)
    commit_r = commit_poly(srs, n, r1, mesh=mesh)

    # -- zkP_2: commit t
    y_m = FR.from_int(rnd.y)
    z_m = FR.from_int(rnd.z)
    r_y = r_at_y(r1, y_m)  # r'(X, y)
    s_y = s_at_y(circuit, y_m)  # s(X, y)
    k_y = k_at_y(circuit, n, y_m)  # k(y) scalar
    t_y = laurent.mul(r1, laurent.add(r_y, s_y), mesh=mesh)
    const_idx = -t_y.offset
    t_y = Laurent(
        t_y.offset,
        t_y.coeffs.at[const_idx].set(
            limb.sub(t_y.coeffs[const_idx], k_y, FR)
        ),
    )
    commit_t = commit_poly(srs, srs.d, t_y, mesh=mesh)

    # -- zkP_3: openings
    a_m, wa = open_poly(srs, z_m, r1, mesh=mesh)
    yz_m = limb.mul(y_m, z_m, FR)
    b_m, wb = open_poly(srs, yz_m, r1, mesh=mesh)
    _, wt = open_poly(srs, z_m, t_y, mesh=mesh)
    szy_m = evaluate(s_y, z_m)

    # -- helper protocol
    yzs_m = [
        (FR.from_int(yi), FR.from_int(zi)) for yi, zi in zip(rnd.ys, rnd.zs)
    ]
    hsc = hsc_prove(
        srs, circuit, yzs_m, FR.from_int(rnd.u), FR.from_int(rnd.v), mesh=mesh
    )

    proof = gp.Proof(
        pr_r=jacobian_to_host(commit_r),
        pr_t=jacobian_to_host(commit_t),
        pr_a=int(FR.to_int(a_m)),
        pr_wa=jacobian_to_host(wa),
        pr_b=int(FR.to_int(b_m)),
        pr_wb=jacobian_to_host(wb),
        pr_wt=jacobian_to_host(wt),
        pr_s=int(FR.to_int(szy_m)),
        pr_hsc=hsc,
    )
    oracle = gp.RndOracle(rnd.y, rnd.z, list(zip(rnd.ys, rnd.zs)))
    return proof, oracle


def verify(
    srs: SRS,
    circuit: DeviceCircuit,
    proof: gp.Proof,
    y: int,
    z: int,
    yzs: list,
) -> bool:
    """Protocol.hs:111-130: device recompute of k(y)/s values, host pairings."""
    n = circuit.n
    y_m = FR.from_int(y)
    k_y = int(FR.to_int(k_at_y(circuit, n, y_m)))
    t = (proof.pr_a * ((proof.pr_b + proof.pr_s) % gp.P) - k_y) % gp.P
    return (
        hsc_verify(srs, circuit, yzs, proof.pr_hsc)
        and pcv(srs, n, proof.pr_r, z, proof.pr_a, proof.pr_wa)
        and pcv(srs, n, proof.pr_r, y * z % gp.P, proof.pr_b, proof.pr_wb)
        and pcv(srs, srs.d, proof.pr_t, z, t, proof.pr_wt)
    )
