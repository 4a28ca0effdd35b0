"""Helper-protocol ("signatures of correct computation") round-trips.

Parity with the reference's test/Test/Signature.hs:20-36
(test_signatures_of_computation): hscProve / hscVerify must round-trip on
random circuits, and the device prover must match the host golden prover
bit-for-bit for identical randomness.
"""
import random

from sonic_tpu import golden_protocol as gp
from sonic_tpu.circuit import random_circuit
from sonic_tpu.constraints import DeviceCircuit
from sonic_tpu.fields.limb import FR
from sonic_tpu.signature import hsc_prove, hsc_verify
from sonic_tpu.srs import SRS


def _fixture(rng, n=2, q=2):
    circuit, _ = random_circuit(rng, n=n, q=q)
    d = 7 * n + rng.randrange(3, 10)
    host_srs = gp.SRS.new(d, x=rng.randrange(2, gp.P), alpha=rng.randrange(2, gp.P))
    dev_srs = SRS.from_host(host_srs)
    dev_circuit = DeviceCircuit.from_host(circuit)
    m = len(circuit.weights.wL)
    yzs = [
        (rng.randrange(2, gp.P), rng.randrange(2, gp.P)) for _ in range(m)
    ]
    u = rng.randrange(2, gp.P)
    v = rng.randrange(2, gp.P)
    return circuit, host_srs, dev_srs, dev_circuit, yzs, u, v


def test_hsc_roundtrip_device():
    rng = random.Random(501)
    circuit, host_srs, dev_srs, dev_circuit, yzs, u, v = _fixture(rng)
    yzs_m = [(FR.from_int(y), FR.from_int(z)) for y, z in yzs]
    proof = hsc_prove(dev_srs, dev_circuit, yzs_m, FR.from_int(u), FR.from_int(v))
    assert hsc_verify(dev_srs, dev_circuit, yzs, proof)


def test_hsc_device_matches_golden():
    rng = random.Random(502)
    circuit, host_srs, dev_srs, dev_circuit, yzs, u, v = _fixture(rng)
    yzs_m = [(FR.from_int(y), FR.from_int(z)) for y, z in yzs]
    dev = hsc_prove(dev_srs, dev_circuit, yzs_m, FR.from_int(u), FR.from_int(v))
    s_xy = gp.s_poly(circuit.weights)
    host = gp.hsc_prove(host_srs, s_xy, yzs, u, v)
    assert dev == host
    assert gp.hsc_verify(host_srs, s_xy, yzs, dev)


def test_hsc_rejects_tampered():
    rng = random.Random(503)
    circuit, host_srs, dev_srs, dev_circuit, yzs, u, v = _fixture(rng)
    yzs_m = [(FR.from_int(y), FR.from_int(z)) for y, z in yzs]
    proof = hsc_prove(dev_srs, dev_circuit, yzs_m, FR.from_int(u), FR.from_int(v))
    import dataclasses

    bad = dataclasses.replace(proof, hsc_u=(proof.hsc_u + 1) % gp.P)
    assert not hsc_verify(dev_srs, dev_circuit, yzs, bad)
