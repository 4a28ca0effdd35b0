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

import jax.numpy as jnp

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


def _prove_compute(
    srs, assignment, circuit, cns_m, y_m, z_m, ys_st, zs_st, u_m, v_m,
    mesh=None,
):
    """The prover's ENTIRE device compute (zkP_1..3 + helper), fully
    traceable: no host reads, no data-dependent control flow. Returns
    (allj, scal): a (4m+7,) Jacobian stack [R, T, Wa, Wb, Wt, S_j*m,
    W_j*m, W'_j*m, Q_j*m, C, Qv] and a (2m+4, L) Montgomery scalar stack
    [a, b, s(z,y), t_const, s_j*m, s'_j*m].

    t_const is the t-commitment's g^alpha hole value (nonzero exactly
    when the assignment violates the constraints — the reference's panic,
    CommitmentScheme.hs:70-73 via SRS.hs:38-39); `prove` checks it after
    the batched fetch and raises with unchanged semantics."""
    from .curve.group import Jacobian
    from .signature import hsc_prove_device
    from .commitment import open_poly as _open
    from .constraints import s_at_u_of_y

    n = assignment.n
    m = ys_st.shape[0]
    # zkP_1
    r1 = r_x1_poly(assignment, cns_m)
    commit_r = commit_poly(srs, n, r1, mesh=mesh)
    # zkP_2
    r_y = r_at_y(r1, y_m)
    s_y = s_at_y(circuit, y_m)
    k_y = k_at_y(circuit, n, y_m)
    t_y = laurent.mul(r1, laurent.add(r_y, s_y), mesh=mesh)
    const_idx = -t_y.offset
    t_y = Laurent(
        t_y.offset,
        t_y.coeffs.at[const_idx].set(
            limb.sub(t_y.coeffs[const_idx], k_y, FR)
        ),
    )
    t_const_m = t_y.coeffs[const_idx]
    commit_t = commit_poly(srs, srs.d, t_y, check_hole=False, mesh=mesh)
    # zkP_3
    a_m, wa = open_poly(srs, z_m, r1, mesh=mesh)
    yz_m = limb.mul(y_m, z_m, FR)
    b_m, wb = open_poly(srs, yz_m, r1, mesh=mesh)
    _, wt = open_poly(srs, z_m, t_y, mesh=mesh)
    szy_m = evaluate(s_y, z_m)
    # helper
    if m == 0:
        su_y = s_at_u_of_y(circuit, u_m)
        c_j = commit_poly(srs, srs.d, su_y, check_hole=False)
        _, qv = _open(srs, v_m, su_y)
        empty_pt = jnp.zeros((0,) + commit_r.x.shape, jnp.uint32)
        cms = ws = w2 = qs = Jacobian(empty_pt, empty_pt, empty_pt)
        fzs = s2 = jnp.zeros((0, cns_m.shape[-1]), jnp.uint32)
    else:
        cms, ws, w2, qs, c_j, qv, fzs, s2 = hsc_prove_device(
            srs, circuit, ys_st, zs_st, u_m, v_m, mesh=mesh
        )
    allj = Jacobian(
        jnp.concatenate(
            [
                jnp.stack([commit_r.x, commit_t.x, wa.x, wb.x, wt.x]),
                cms.x, ws.x, w2.x, qs.x,
                jnp.stack([c_j.x, qv.x]),
            ], 0,
        ),
        jnp.concatenate(
            [
                jnp.stack([commit_r.y, commit_t.y, wa.y, wb.y, wt.y]),
                cms.y, ws.y, w2.y, qs.y,
                jnp.stack([c_j.y, qv.y]),
            ], 0,
        ),
        jnp.concatenate(
            [
                jnp.stack([commit_r.z, commit_t.z, wa.z, wb.z, wt.z]),
                cms.z, ws.z, w2.z, qs.z,
                jnp.stack([c_j.z, qv.z]),
            ], 0,
        ),
    )
    scal = jnp.concatenate(
        [jnp.stack([a_m, b_m, szy_m, t_const_m]), fzs, s2], 0
    )
    return allj, scal


import jax as _jax

_prove_compute_jit = _jax.jit(
    lambda srs, asg, cir, cns, y, z, ys, zs, u, v: _prove_compute(
        srs, asg, cir, cns, y, z, ys, zs, u, v
    )
)


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
    from .commitment import jacobians_to_host

    import os as _os

    m = len(rnd.ys)
    cns_m = FR.from_int(rnd.cns)
    y_m = FR.from_int(rnd.y)
    z_m = FR.from_int(rnd.z)
    u_m = FR.from_int(rnd.u)
    v_m = FR.from_int(rnd.v)
    ys_st = FR.from_int(list(rnd.ys))  # (m, L)
    zs_st = FR.from_int(list(rnd.zs))
    oracle = gp.RndOracle(rnd.y, rnd.z, list(zip(rnd.ys, rnd.zs)))

    # Small proofs are dispatch-latency-bound (each jitted phase costs a
    # tunnel round trip): fuse the ENTIRE device compute into one jitted
    # program at toy sizes on TPU. Large proofs keep the phase-split
    # pipeline (compiled phases are shared across shapes; one giant
    # program would recompile per (n, q, d) class), and CPU keeps it too
    # (no tunnel to hide — the monolithic compile per shape would dominate
    # the test suite). SONIC_TPU_FUSE=0/1 overrides.
    import jax as __jax

    fuse_env = _os.environ.get("SONIC_TPU_FUSE", "auto")
    fuse = (
        mesh is None
        and fuse_env != "0"
        and (
            fuse_env == "1"
            or (n <= 128 and __jax.default_backend() == "tpu")
        )
    )
    if fuse:
        allj, scal = _prove_compute_jit(
            srs, assignment, circuit, cns_m, y_m, z_m, ys_st, zs_st, u_m, v_m
        )
    else:
        allj, scal = _prove_compute(
            srs, assignment, circuit, cns_m, y_m, z_m, ys_st, zs_st,
            u_m, v_m, mesh,
        )

    # ONE batched affine conversion + ONE batched Fr fetch for ALL 4m+7
    # points and 2m+4 scalars of the proof (each host round trip through
    # the device tunnel costs ~35 ms; the r3 prover blocked on ~8 of them)
    pts = jacobians_to_host(allj)
    evs = [int(v) for v in FR.to_int(scal)]
    a_i, b_i, s_i, tc_i = evs[:4]
    if tc_i != 0:
        raise IndexError(
            "commitPoly: nonzero coefficient at alpha*x^0 (g^alpha is "
            "not in the SRS)"
        )
    fzs_i, s2_i = evs[4 : 4 + m], evs[4 + m :]
    r_h, t_h, wa_h, wb_h, wt_h = pts[:5]
    cms_h, ws_h = pts[5 : 5 + m], pts[5 + m : 5 + 2 * m]
    w2_h, qs_h = pts[5 + 2 * m : 5 + 3 * m], pts[5 + 3 * m : 5 + 4 * m]
    c_h, qv_h = pts[5 + 4 * m], pts[5 + 4 * m + 1]
    hsc = gp.HscProof(
        hsc_s=[(cms_h[j], (fzs_i[j], ws_h[j])) for j in range(m)],
        hsc_w=[(s2_i[j], w2_h[j], qs_h[j]) for j in range(m)],
        hsc_qv=qv_h,
        hsc_c=c_h,
        hsc_u=rnd.u % gp.P,
        hsc_v=rnd.v % gp.P,
    )
    proof = gp.Proof(
        pr_r=r_h,
        pr_t=t_h,
        pr_a=a_i,
        pr_wa=wa_h,
        pr_b=b_i,
        pr_wb=wb_h,
        pr_wt=wt_h,
        pr_s=s_i,
        pr_hsc=hsc,
    )
    return proof, oracle


def prove_batch(
    srs: SRS,
    assignments: list,
    circuits: list,
    rnds: list,
    mesh=None,
) -> list:
    """Batch-parallel proving: B independent, shape-identical circuits in
    one device pipeline (SURVEY.md §2.3 parallelism row 3; BASELINE
    config 5). Every stage batches over the proof axis:

      - r'(X,1) builds + commits: one vmapped build + one batched MSM
      - t(X,y) products: one vmapped NTT/schoolbook product
      - the three openings: batched synthetic division + batched MSMs
      - helper protocol: ALL B*m instances flattened into single batched
        commit/open pipelines

    Bit-identical to B independent `prove` calls (tested). Returns
    [(Proof, RndOracle)] in input order.
    """
    from .constraints import (
        k_at_y_batch,
        r_at_y_batch,
        r_x1_batch,
        s_at_u_batch,
        s_at_y_batch,
        s_at_y_batched,
        stack_assignments,
        stack_circuits,
    )
    from .commitment import (
        commit_poly_batched,
        jacobians_to_host,
        open_poly_batched,
    )
    from .signature import hsc_assemble

    B = len(assignments)
    n = assignments[0].n
    q = circuits[0].q
    if srs.d < 7 * n:
        raise ValueError(
            f"Parameter d is not large enough: {srs.d} should be > {7 * n}"
        )
    asg = stack_assignments(assignments)
    cir = stack_circuits(circuits)
    cns = FR.from_int([r.cns for r in rnds])  # (B, 4, L)
    ys = FR.from_int([r.y for r in rnds])  # (B, L)
    zs = FR.from_int([r.z for r in rnds])

    # zkP_1: blinded r'(X, 1) + commitments
    off_r = -(2 * n + 4)
    r1 = r_x1_batch(asg, cns)  # (B, 3n+5, L)
    commit_r = jacobians_to_host(
        commit_poly_batched(srs, n, off_r, r1, mesh=mesh)
    )

    # zkP_2: t(X, y_b) = r'(X,1)(r'(X,y_b)+s(X,y_b)) - k(y_b)
    r_y = r_at_y_batch(r1, ys, off_r)
    s_y = s_at_y_batch(cir, ys)  # (B, 3n+1, L) at -n
    k_y = k_at_y_batch(cir, n, ys)
    off_sum, rs = laurent.add_batched(off_r, r_y, -n, s_y)
    t_c = laurent.mul_batched(r1, rs)
    off_t = off_r + off_sum
    ci = -off_t
    t_c = t_c.at[:, ci].set(limb.sub(t_c[:, ci], k_y, FR))
    commit_t = jacobians_to_host(
        commit_poly_batched(srs, srs.d, off_t, t_c, mesh=mesh)
    )

    # zkP_3: openings of r' at z_b and y_b*z_b, t at z_b; s(z_b, y_b)
    a_m, wa = open_poly_batched(srs, zs, off_r, r1, mesh=mesh)
    yz = limb.mul(ys, zs, FR)
    b_m, wb = open_poly_batched(srs, yz, off_r, r1, mesh=mesh)
    _, wt = open_poly_batched(srs, zs, off_t, t_c, mesh=mesh)
    szy = laurent.evaluate_batched(-n, s_y, zs)
    wa_h = jacobians_to_host(wa)
    wb_h = jacobians_to_host(wb)
    wt_h = jacobians_to_host(wt)
    a_i = [int(v) for v in FR.to_int(a_m)]
    b_i = [int(v) for v in FR.to_int(b_m)]
    s_i = [int(v) for v in FR.to_int(szy)]

    # helper: ALL B*m instances in flat batched pipelines
    m = len(rnds[0].ys)
    ys_h = FR.from_int([yi for r in rnds for yi in r.ys])  # (B*m, L)
    zs_h = FR.from_int([zi for r in rnds for zi in r.zs])
    us = FR.from_int([r.u for r in rnds])  # (B, L)
    vs = FR.from_int([r.v for r in rnds])
    s_flat = jnp.concatenate(
        [
            s_at_y_batched(c, ys_h[b * m : (b + 1) * m])
            for b, c in enumerate(circuits)
        ]
    )  # (B*m, 3n+1, L)
    cms = jacobians_to_host(
        commit_poly_batched(srs, srs.d, -n, s_flat, mesh=mesh)
    )
    fzs, ws = open_poly_batched(srs, zs_h, -n, s_flat, mesh=mesh)
    us_flat = jnp.repeat(us, m, axis=0)
    _, w2 = open_poly_batched(srs, us_flat, -n, s_flat, mesh=mesh)
    su = s_at_u_batch(cir, us)  # (B, 2n+q+1, L) at -n
    c_jac = commit_poly_batched(srs, srs.d, -n, su, mesh=mesh)
    su_flat = jnp.repeat(su, m, axis=0)
    s2, qs = open_poly_batched(srs, ys_h, -n, su_flat, mesh=mesh)
    _, qv = open_poly_batched(srs, vs, -n, su, mesh=mesh)

    hscs = hsc_assemble(
        B,
        m,
        jacobians_to_host(c_jac),
        jacobians_to_host(qv),
        cms,
        [int(v) for v in FR.to_int(fzs)],
        jacobians_to_host(ws),
        [int(v) for v in FR.to_int(s2)],
        jacobians_to_host(w2),
        jacobians_to_host(qs),
        [r.u for r in rnds],
        [r.v for r in rnds],
    )

    out = []
    for b, r in enumerate(rnds):
        proof = gp.Proof(
            pr_r=commit_r[b],
            pr_t=commit_t[b],
            pr_a=a_i[b],
            pr_wa=wa_h[b],
            pr_b=b_i[b],
            pr_wb=wb_h[b],
            pr_wt=wt_h[b],
            pr_s=s_i[b],
            pr_hsc=hscs[b],
        )
        out.append((proof, gp.RndOracle(r.y, r.z, list(zip(r.ys, r.zs)))))
    return out


def verify(
    srs: SRS,
    circuit: DeviceCircuit,
    proof: gp.Proof,
    y: int,
    z: int,
    yzs: list,
) -> bool:
    """Protocol.hs:111-130: device recompute of k(y)/s values, host pairings.

    All 3m+4 pcV checks (the helper's 3m+1 plus the three protocol-level
    ones) merge into ONE batched pairing product (commitment.pcv_batch);
    SONIC_TPU_NO_BATCH_PCV=1 restores the reference's check-by-check shape.
    """
    import os

    from .commitment import pcv_batch
    from .signature import hsc_checks

    n = circuit.n
    y_m = FR.from_int(y)
    k_y = int(FR.to_int(k_at_y(circuit, n, y_m)))
    t = (proof.pr_a * ((proof.pr_b + proof.pr_s) % gp.P) - k_y) % gp.P
    if not os.environ.get("SONIC_TPU_NO_BATCH_PCV"):
        checks = hsc_checks(srs, circuit, yzs, proof.pr_hsc)
        checks.append((n, proof.pr_r, z, proof.pr_a, proof.pr_wa))
        checks.append((n, proof.pr_r, y * z % gp.P, proof.pr_b, proof.pr_wb))
        checks.append((srs.d, proof.pr_t, z, t, proof.pr_wt))
        return pcv_batch(srs, checks)
    return (
        hsc_verify(srs, circuit, yzs, proof.pr_hsc)
        and pcv(srs, n, proof.pr_r, z, proof.pr_a, proof.pr_wa)
        and pcv(srs, n, proof.pr_r, y * z % gp.P, proof.pr_b, proof.pr_wb)
        and pcv(srs, srs.d, proof.pr_t, z, t, proof.pr_wt)
    )
