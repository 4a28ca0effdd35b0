"""Device (TPU-path) protocol vs golden: bit-exact proofs for identical
randomness, then full device verify."""
import random

import pytest

from sonic_tpu import golden_protocol as gp
from sonic_tpu import protocol as dp
from sonic_tpu.circuit import example_circuit_1, example_circuit_2
from sonic_tpu.constraints import DeviceAssignment, DeviceCircuit
from sonic_tpu.srs import SRS
from sonic_tpu.fields.constants import R_MOD


@pytest.fixture(scope="module")
def setup2():
    rng = random.Random(42)
    x = rng.randrange(1, R_MOD)
    z = rng.randrange(1, R_MOD)
    alpha = rng.randrange(1, R_MOD)
    circuit, assignment = example_circuit_2(x, z)
    d = 25 * assignment.n  # bench/Main.hs:18-19 convention
    host_srs = gp.SRS.new(d, x, alpha)
    dev_srs = SRS.from_host(host_srs)
    rnd = gp.Randomness.generate(rng, circuit.weights.q)
    return circuit, assignment, host_srs, dev_srs, rnd


def test_device_proof_matches_golden(setup2):
    circuit, assignment, host_srs, dev_srs, rnd = setup2
    proof_g, oracle_g = gp.prove(host_srs, assignment, circuit, rnd)
    proof_d, oracle_d = dp.prove(
        dev_srs,
        DeviceAssignment.from_host(assignment),
        DeviceCircuit.from_host(circuit),
        rnd,
    )
    assert oracle_d.y == oracle_g.y and oracle_d.z == oracle_g.z
    assert proof_d.pr_r == proof_g.pr_r
    assert proof_d.pr_t == proof_g.pr_t
    assert proof_d.pr_a == proof_g.pr_a
    assert proof_d.pr_b == proof_g.pr_b
    assert proof_d.pr_s == proof_g.pr_s
    assert proof_d.pr_wa == proof_g.pr_wa
    assert proof_d.pr_wb == proof_g.pr_wb
    assert proof_d.pr_wt == proof_g.pr_wt
    assert proof_d.pr_hsc == proof_g.pr_hsc
    assert proof_d == proof_g


def test_device_verify(setup2):
    circuit, assignment, host_srs, dev_srs, rnd = setup2
    proof_d, oracle = dp.prove(
        dev_srs,
        DeviceAssignment.from_host(assignment),
        DeviceCircuit.from_host(circuit),
        rnd,
    )
    ok = dp.verify(
        dev_srs,
        DeviceCircuit.from_host(circuit),
        proof_d,
        oracle.y,
        oracle.z,
        oracle.yzs,
    )
    assert ok
    # tampered proof must fail
    proof_d.pr_a = (proof_d.pr_a + 1) % R_MOD
    assert not dp.verify(
        dev_srs,
        DeviceCircuit.from_host(circuit),
        proof_d,
        oracle.y,
        oracle.z,
        oracle.yzs,
    )


def test_device_srs_generation_matches_host():
    """Device SRS.new == host SRS.new for a tiny d."""
    d, x, alpha = 6, 12345, 6789
    host = gp.SRS.new(d, x, alpha)
    dev = SRS.new(d, x, alpha)
    got = dev.to_host()
    assert got.g_pos_x == host.g_pos_x
    assert got.g_neg_x == host.g_neg_x
    assert got.g_pos_ax == host.g_pos_ax
    assert got.g_neg_ax == host.g_neg_ax
    assert got.h_pos_x == host.h_pos_x
    assert got.h_neg_x == host.h_neg_x
    assert got.h_pos_ax == host.h_pos_ax
    assert got.h_neg_ax == host.h_neg_ax
