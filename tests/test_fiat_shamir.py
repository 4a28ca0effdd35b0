"""Fiat-Shamir NIZK extension: round-trip + tamper rejection (host golden
backend; the device prover is bit-identical so the transform carries over)."""
import random

import pytest

from sonic_tpu import fiat_shamir as fs
from sonic_tpu import golden_protocol as gp
from sonic_tpu.circuit import example_circuit_1, example_circuit_2, random_circuit
from sonic_tpu.fields.constants import R_MOD


def _setup(rng, circuit, assignment):
    n = assignment.n
    d = max(16, 7 * n)
    x = rng.randrange(1, R_MOD)
    alpha = rng.randrange(1, R_MOD)
    return gp.SRS.new(d, x, alpha)


def test_nizk_roundtrip_example2(rng):
    circuit, assignment = example_circuit_2(x=3, z=8)
    srs = _setup(rng, circuit, assignment)
    blinding = [rng.randrange(1, R_MOD) for _ in range(4)]
    nizk = fs.prove(srs, assignment, circuit, blinding)
    assert fs.verify(srs, circuit, nizk)


def test_nizk_deterministic_challenges(rng):
    """Same inputs + blinding -> identical proof bytes (no hidden entropy)."""
    circuit, assignment = example_circuit_1(x=1, z=1)
    srs = _setup(rng, circuit, assignment)
    blinding = [5, 6, 7, 8]
    n1 = fs.prove(srs, assignment, circuit, blinding)
    n2 = fs.prove(srs, assignment, circuit, blinding)
    assert n1.proof == n2.proof and (n1.y, n1.z, n1.yzs) == (n2.y, n2.z, n2.yzs)


def test_nizk_tamper_rejected(rng):
    circuit, assignment = example_circuit_2(x=2, z=5)
    srs = _setup(rng, circuit, assignment)
    nizk = fs.prove(srs, assignment, circuit, [9, 10, 11, 12])

    bad = fs.NizkProof(
        gp.Proof(
            nizk.proof.pr_r,
            nizk.proof.pr_t,
            (nizk.proof.pr_a + 1) % R_MOD,  # tamper with the r-opening
            nizk.proof.pr_wa,
            nizk.proof.pr_b,
            nizk.proof.pr_wb,
            nizk.proof.pr_wt,
            nizk.proof.pr_s,
            nizk.proof.pr_hsc,
        ),
        nizk.y,
        nizk.z,
        nizk.yzs,
    )
    assert not fs.verify(srs, circuit, bad)


def test_nizk_random_circuits(rng):
    for _ in range(3):
        circuit, assignment = random_circuit(rng, n=rng.randrange(1, 5))
        srs = _setup(rng, circuit, assignment)
        blinding = [rng.randrange(1, R_MOD) for _ in range(4)]
        nizk = fs.prove(srs, assignment, circuit, blinding)
        assert fs.verify(srs, circuit, nizk)


def test_nizk_device_matches_golden(rng):
    """Device-path NIZK == golden NIZK byte-for-byte for equal blinding."""
    from sonic_tpu import fiat_shamir, serial
    from sonic_tpu.circuit import example_circuit_2
    from sonic_tpu.constraints import DeviceAssignment, DeviceCircuit
    from sonic_tpu.srs import SRS
    from sonic_tpu import golden_protocol as gp

    circuit, assignment = example_circuit_2(x=1, z=2)
    n = assignment.n
    host_srs = gp.SRS.new(7 * n + 3, x=17, alpha=19)
    blinding = [rng.randrange(1, gp.P) for _ in range(4)]
    golden = fiat_shamir.prove(host_srs, assignment, circuit, blinding)
    dev = fiat_shamir.prove_device(
        SRS.from_host(host_srs),
        DeviceAssignment.from_host(assignment),
        DeviceCircuit.from_host(circuit),
        blinding,
    )
    assert serial.proof_to_bytes(dev.proof) == serial.proof_to_bytes(
        golden.proof
    )
    assert (dev.y, dev.z, dev.yzs) == (golden.y, golden.z, golden.yzs)
    assert fiat_shamir.verify(host_srs, circuit, dev)
