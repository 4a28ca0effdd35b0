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
