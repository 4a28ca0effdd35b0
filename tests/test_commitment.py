"""Commitment-scheme round-trips on the actual protocol polynomials.

Parity with the reference's test/Test/CommitmentScheme.hs:
  - test_tXy_commit_scheme  (:25-53): commit/open/pcV of t(X, y) at bound d
  - test_rX1_commit_scheme  (:58-71): r(X, 1) at bound n, opened at z
  - test_rX1YZ_commit_scheme (:76-96): blinded r opened at y*z
All on the device commit/open path with host pcv pairing checks, against
random circuits (mirroring the QuickCheck generators).
"""
import random

from sonic_tpu import golden_protocol as gp
from sonic_tpu.circuit import random_circuit
from sonic_tpu.commitment import commit_poly, jacobian_to_host, open_poly, pcv
from sonic_tpu.constraints import (
    DeviceAssignment,
    DeviceCircuit,
    k_at_y,
    r_at_y,
    r_x1_poly,
    s_at_y,
)
from sonic_tpu.fields import limb
from sonic_tpu.fields.limb import FR
from sonic_tpu.poly import laurent
from sonic_tpu.poly.laurent import Laurent
from sonic_tpu.srs import SRS


def _fixture(rng, n=2, q=3):
    circuit, assignment = random_circuit(rng, n=n, q=q)
    d = 7 * n + rng.randrange(3, 9)
    host_srs = gp.SRS.new(
        d, x=rng.randrange(2, gp.P), alpha=rng.randrange(2, gp.P)
    )
    srs = SRS.from_host(host_srs)
    dc = DeviceCircuit.from_host(circuit)
    da = DeviceAssignment.from_host(assignment)
    cns = FR.from_int([rng.randrange(gp.P) for _ in range(4)])
    return circuit, srs, dc, da, cns, d, n


def test_rX1_commit_scheme():
    rng = random.Random(601)
    _, srs, _dc, da, cns, d, n = _fixture(rng)
    r1 = r_x1_poly(da, cns)
    commit = commit_poly(srs, n, r1)
    z = rng.randrange(2, gp.P)
    fz, w = open_poly(srs, FR.from_int(z), r1)
    assert pcv(
        srs, n, jacobian_to_host(commit), z, int(FR.to_int(fz)),
        jacobian_to_host(w),
    )


def test_rX1YZ_commit_scheme():
    """Blinded r(X,1) committed at bound n, opened at y*z (reference
    test_rX1YZ_commit_scheme)."""
    rng = random.Random(602)
    _, srs, _dc, da, cns, d, n = _fixture(rng)
    r1 = r_x1_poly(da, cns)
    commit = commit_poly(srs, n, r1)
    y = rng.randrange(2, gp.P)
    z = rng.randrange(2, gp.P)
    yz = y * z % gp.P
    fyz, w = open_poly(srs, FR.from_int(yz), r1)
    assert pcv(
        srs, n, jacobian_to_host(commit), yz, int(FR.to_int(fyz)),
        jacobian_to_host(w),
    )


def test_tXy_commit_scheme():
    rng = random.Random(603)
    _, srs, dc, da, cns, d, n = _fixture(rng)
    y = rng.randrange(2, gp.P)
    y_m = FR.from_int(y)
    r1 = r_x1_poly(da, cns)
    t_y = laurent.mul(r1, laurent.add(r_at_y(r1, y_m), s_at_y(dc, y_m)))
    k_y = k_at_y(dc, n, y_m)
    ci = -t_y.offset
    t_y = Laurent(
        t_y.offset, t_y.coeffs.at[ci].set(limb.sub(t_y.coeffs[ci], k_y, FR))
    )
    commit = commit_poly(srs, d, t_y)
    z = rng.randrange(2, gp.P)
    fz, w = open_poly(srs, FR.from_int(z), t_y)
    assert pcv(
        srs, d, jacobian_to_host(commit), z, int(FR.to_int(fz)),
        jacobian_to_host(w),
    )


def test_pcv_batch_matches_individual():
    """Random-linear-combination pcV batching accepts exactly the check
    lists whose members all pass individually (mixed maxm groups)."""
    from sonic_tpu.commitment import pcv_batch

    rng = random.Random(604)
    _, srs, dc, da, cns, d, n = _fixture(rng)
    r1 = r_x1_poly(da, cns)
    commit_r = jacobian_to_host(commit_poly(srs, n, r1))
    z1 = rng.randrange(2, gp.P)
    fz1, w1 = open_poly(srs, FR.from_int(z1), r1)
    z2 = rng.randrange(2, gp.P)
    fz2, w2 = open_poly(srs, FR.from_int(z2), r1)
    y_m = FR.from_int(rng.randrange(2, gp.P))
    t_y = laurent.mul(r1, laurent.add(r_at_y(r1, y_m), s_at_y(dc, y_m)))
    k_y = k_at_y(dc, n, y_m)
    ci = -t_y.offset
    t_y = Laurent(
        t_y.offset, t_y.coeffs.at[ci].set(limb.sub(t_y.coeffs[ci], k_y, FR))
    )
    commit_t = jacobian_to_host(commit_poly(srs, d, t_y))
    z3 = rng.randrange(2, gp.P)
    fz3, w3 = open_poly(srs, FR.from_int(z3), t_y)
    checks = [
        (n, commit_r, z1, int(FR.to_int(fz1)), jacobian_to_host(w1)),
        (n, commit_r, z2, int(FR.to_int(fz2)), jacobian_to_host(w2)),
        (d, commit_t, z3, int(FR.to_int(fz3)), jacobian_to_host(w3)),
    ]
    assert pcv_batch(srs, checks)
    assert pcv_batch(srs, [])
    # any single tampered member must fail the whole batch
    bad_v = list(checks)
    m_, F_, z_, v_, w_ = bad_v[1]
    bad_v[1] = (m_, F_, z_, (v_ + 1) % gp.P, w_)
    assert not pcv_batch(srs, bad_v)
    bad_max = list(checks)
    bad_max[2] = (n, *bad_max[2][1:])
    assert not pcv_batch(srs, bad_max)


def test_commit_matches_golden():
    """Device commit/open == host golden commit/open bit-for-bit."""
    rng = random.Random(604)
    circuit, srs, _dc, da, cns, d, n = _fixture(rng)
    host_srs = srs.to_host()
    r1 = r_x1_poly(da, cns)
    dev_commit = jacobian_to_host(commit_poly(srs, n, r1))
    host_commit = gp.commit_poly(host_srs, n, r1.to_terms())
    assert dev_commit == host_commit
    z = rng.randrange(2, gp.P)
    fz, w = open_poly(srs, FR.from_int(z), r1)
    hfz, hw = gp.open_poly(host_srs, z, r1.to_terms())
    assert int(FR.to_int(fz)) == hfz
    assert jacobian_to_host(w) == hw


def test_out_of_range_poly_raises():
    """Exponent-range overflow raises IndexError (the reference's `index`
    panic, CommitmentScheme.hs:70-73). The merged tables hold exponents in
    [-d, d]; the guard must reject hi > d (regression: it used 2d)."""
    import pytest

    rng = random.Random(605)
    _, srs, _dc, _da, _cns, d, n = _fixture(rng)
    too_wide = Laurent(0, FR.from_int([1] * (d + 2)))  # max exp d+1 at max=d
    with pytest.raises(IndexError, match="outside SRS"):
        commit_poly(srs, d, too_wide)
    too_low = Laurent(-(d + 1) - (d - n), FR.from_int([1, 2]))  # lo < -d
    with pytest.raises(IndexError, match="outside SRS"):
        commit_poly(srs, n, too_low)
    with pytest.raises(IndexError, match="outside SRS"):
        open_poly(srs, FR.from_int(3), Laurent(0, FR.from_int([1] * (d + 3))))


def test_device_alpha_hole_fails_fast():
    """A nonzero coefficient at the shifted X^0 slot must raise by DEFAULT
    on the device path (parity with golden test_bad_assignment_is_
    uncommittable; reference panics via index -1 into gNegativeAlphaX)."""
    import pytest

    rng = random.Random(606)
    _, srs, _dc, _da, _cns, d, n = _fixture(rng)
    # constant term 5 at max=d -> shifted exponent 0 hits the g^alpha hole
    bad = Laurent(-1, FR.from_int([7, 5, 3]))
    with pytest.raises(IndexError, match="alpha"):
        commit_poly(srs, d, bad)


def test_device_prove_rejects_unsatisfied_assignment():
    """protocol.prove on a violated circuit must fail fast, not emit a
    garbage proof (t(X,y) keeps a nonzero constant term)."""
    import pytest

    from sonic_tpu import protocol
    from sonic_tpu.circuit import example_circuit_2

    rng = random.Random(607)
    circuit, assignment = example_circuit_2(x=1, z=2)
    bad_assignment = type(assignment)(
        aL=[(a + 1) % gp.P for a in assignment.aL],
        aR=list(assignment.aR),
        aO=list(assignment.aO),
    )
    n = len(assignment.aL)
    host_srs = gp.SRS.new(7 * n + 4, x=11, alpha=13)
    srs = SRS.from_host(host_srs)
    dc = DeviceCircuit.from_host(circuit)
    da = DeviceAssignment.from_host(bad_assignment)
    rnd = gp.Randomness.generate(random.Random(9), m=len(circuit.cs))
    with pytest.raises(IndexError, match="alpha"):
        protocol.prove(srs, da, dc, rnd)
