"""Serialization round-trips: Fr/G1/G2 encodings, proof bytes, SRS files."""
import os
import random

from sonic_tpu import golden, serial
from sonic_tpu import golden_protocol as gp
from sonic_tpu.circuit import example_circuit_1
from sonic_tpu.fields.constants import R_MOD


def test_fr_roundtrip(rng):
    for _ in range(5):
        v = rng.randrange(R_MOD)
        assert serial.fr_from_bytes(serial.fr_to_bytes(v)) == v


def test_g1_roundtrip(rng):
    for _ in range(5):
        p = golden.g1_mul(golden.G1_GEN, rng.randrange(1, R_MOD))
        assert serial.g1_from_bytes(serial.g1_to_bytes(p)) == p
    assert serial.g1_from_bytes(serial.g1_to_bytes(None)) is None


def test_g2_roundtrip(rng):
    for _ in range(3):
        p = golden.g2_mul(golden.G2_GEN, rng.randrange(1, R_MOD))
        assert serial.g2_from_bytes(serial.g2_to_bytes(p)) == p
    assert serial.g2_from_bytes(serial.g2_to_bytes(None)) is None


def test_proof_roundtrip(rng):
    x = rng.randrange(1, R_MOD)
    z = rng.randrange(1, R_MOD)
    alpha = rng.randrange(1, R_MOD)
    circuit, assignment = example_circuit_1(x, z)
    srs = gp.SRS.new(14, x, alpha)
    rnd = gp.Randomness.generate(rng, circuit.weights.q)
    proof, _ = gp.prove(srs, assignment, circuit, rnd)
    data = serial.proof_to_bytes(proof)
    back = serial.proof_from_bytes(data)
    assert back == proof


def test_srs_checkpoint(tmp_path, rng):
    from sonic_tpu.srs import SRS

    host = gp.SRS.new(4, 999, 777)
    dev = SRS.from_host(host)
    path = str(tmp_path / "srs.npz")
    serial.save_srs(path, dev)
    loaded = serial.load_srs(path)
    assert loaded.d == dev.d
    restored = loaded.to_host()
    assert restored.g_pos_x == host.g_pos_x
    assert restored.h_pos_ax == host.h_pos_ax


def test_srs_verifier_mode_checkpoint(tmp_path):
    """Verifier-mode SRS (no full h tables) must checkpoint and resume:
    g tables byte-identical, and the restored sparse h-row cache drives a
    full prove/verify round-trip (VERDICT r4 weak #7)."""
    import random

    import numpy as np

    from sonic_tpu import protocol
    from sonic_tpu.circuit import random_circuit
    from sonic_tpu.constraints import DeviceAssignment, DeviceCircuit
    from sonic_tpu.srs import SRS

    rng = random.Random(909)
    n, q = 4, 3
    circuit, assignment = random_circuit(rng, n=n, q=q)
    d = 7 * n + 5
    srs = SRS.new(d, 31337, 4242, h_mode="verifier", n_hints=[n])
    path = str(tmp_path / "srs_v.npz")
    serial.save_srs(path, srs)
    loaded = serial.load_srs(path)

    assert loaded.d == d and loaded.h_x is None and loaded.h_ax is None
    assert np.array_equal(np.asarray(loaded.g_x.x), np.asarray(srs.g_x.x))
    assert np.array_equal(np.asarray(loaded.g_ax.y), np.asarray(srs.g_ax.y))
    assert loaded._h_cache() == srs._h_cache()

    rnd = gp.Randomness.generate(rng, m=q)
    dc = DeviceCircuit.from_host(circuit)
    da = DeviceAssignment.from_host(assignment)
    proof, oracle = protocol.prove(loaded, da, dc, rnd)
    proof0, _ = protocol.prove(srs, da, dc, rnd)
    assert proof == proof0
    assert protocol.verify(loaded, dc, proof, oracle.y, oracle.z, oracle.yzs)
