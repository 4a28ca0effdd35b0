"""SRS h_mode='verifier': sparse verifier h-rows instead of full G2 tables.

The pcV equation touches only h^{x^{-d+max}} (max in {n, d}), h^alpha and
h^{alpha x} (reference CommitmentScheme.hs:58-68); verifier mode computes
exactly those rows at setup and skips the two (2d+1)-row G2 tables — over
half the setup cost at large d. Proof bits and verify outcomes must be
identical to full mode.
"""
import random

import pytest

from sonic_tpu import golden_protocol as gp
from sonic_tpu import protocol
from sonic_tpu.circuit import random_circuit
from sonic_tpu.constraints import DeviceAssignment, DeviceCircuit
from sonic_tpu.srs import SRS


def _fixture(rng, n=4, q=3):
    circuit, assignment = random_circuit(rng, n=n, q=q)
    dc = DeviceCircuit.from_host(circuit)
    da = DeviceAssignment.from_host(assignment)
    return circuit, dc, da


def test_verifier_mode_matches_full():
    rng = random.Random(4242)
    _, dc, da = _fixture(rng)
    n = da.n
    d = 7 * n + 5
    x = rng.randrange(2, gp.P)
    alpha = rng.randrange(2, gp.P)
    rnd = gp.Randomness.generate(rng, m=dc.q)
    srs_v = SRS.new(d, x, alpha, h_mode="verifier", n_hints=[n])
    srs_f = SRS.new(d, x, alpha)
    proof_v, oracle = protocol.prove(srs_v, da, dc, rnd)
    proof_f, _ = protocol.prove(srs_f, da, dc, rnd)
    assert proof_v == proof_f
    assert protocol.verify(srs_v, dc, proof_v, oracle.y, oracle.z, oracle.yzs)
    # the sparse h rows must equal the full-table rows
    for e in (0, -d + n, 0):
        assert srs_v.h_x_at(e) == srs_f.h_x_at(e)
    for e in (0, 1):
        assert srs_v.h_ax_at(e) == srs_f.h_ax_at(e)


def test_verifier_mode_missing_row_raises():
    srs_v = SRS.new(40, 777, 888, h_mode="verifier", n_hints=[4])
    with pytest.raises(ValueError, match="verifier"):
        srs_v.h_x_at(-40 + 3)  # n=3 was not hinted
    with pytest.raises(ValueError, match="full"):
        srs_v.to_host()


def test_unknown_h_mode_rejected():
    with pytest.raises(ValueError, match="h_mode"):
        SRS.new(20, 3, 5, h_mode="bogus")
