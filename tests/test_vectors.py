"""Frozen pinned-randomness vectors (VERDICT r2 item 5).

The reference's benchmark fixes x=1, y=2, z=3, alpha=4 and d=25n
(/root/reference/bench/Main.hs:18-27) on the two example circuits
(test/Test/Reference.hs:38-50, :65-90). tests/vectors/pinned_v1.json
freezes the full proof bytes and an SRS digest for that randomness (plus
explicit blinding/helper scalars, which the reference samples from
MonadRandom); both the golden and the device paths must reproduce them
bit-for-bit forever.
"""
import hashlib
import json
import os

import pytest

from sonic_tpu import golden_protocol as gp
from sonic_tpu import serial
from sonic_tpu.circuit import example_circuit_1, example_circuit_2

VEC_PATH = os.path.join(os.path.dirname(__file__), "vectors", "pinned_v1.json")

with open(VEC_PATH) as f:
    VECTORS = json.load(f)

_MAKERS = {"example1": example_circuit_1, "example2": example_circuit_2}


def _randomness(vec):
    r = vec["rnd"]
    return gp.Randomness(
        cns=r["cns"], y=r["y"], z=r["z"], ys=r["ys"], zs=r["zs"],
        u=r["u"], v=r["v"],
    )


def _srs_digest(srs: gp.SRS) -> str:
    h = hashlib.sha256()
    for tab in (srs.g_neg_x, srs.g_pos_x, srs.g_neg_ax, srs.g_pos_ax):
        for p in tab:
            h.update(serial.g1_to_bytes(p))
    for tab in (srs.h_neg_x, srs.h_pos_x, srs.h_neg_ax, srs.h_pos_ax):
        for p in tab:
            h.update(serial.g2_to_bytes(p))
    return h.hexdigest()


@pytest.mark.parametrize("name", sorted(VECTORS))
def test_golden_path_reproduces_vector(name):
    vec = VECTORS[name]
    circuit, assignment = _MAKERS[name](x=1, z=2)
    srs = gp.SRS.new(vec["d"], x=vec["x"], alpha=vec["alpha"])
    assert _srs_digest(srs) == vec["srs_sha256"]
    proof, oracle = gp.prove(srs, assignment, circuit, _randomness(vec))
    assert serial.proof_to_bytes(proof).hex() == vec["proof_hex"]
    assert gp.verify(srs, circuit, proof, oracle.y, oracle.z, oracle.yzs)
    # byte round-trip is lossless
    assert serial.proof_from_bytes(bytes.fromhex(vec["proof_hex"])) == proof


@pytest.mark.parametrize("name", sorted(VECTORS))
def test_device_path_reproduces_vector(name):
    from sonic_tpu import protocol
    from sonic_tpu.constraints import DeviceAssignment, DeviceCircuit
    from sonic_tpu.srs import SRS

    vec = VECTORS[name]
    circuit, assignment = _MAKERS[name](x=1, z=2)
    dev_srs = SRS.new(vec["d"], x=vec["x"], alpha=vec["alpha"])
    assert _srs_digest(dev_srs.to_host()) == vec["srs_sha256"]
    proof, _oracle = protocol.prove(
        dev_srs,
        DeviceAssignment.from_host(assignment),
        DeviceCircuit.from_host(circuit),
        _randomness(vec),
    )
    assert serial.proof_to_bytes(proof).hex() == vec["proof_hex"]
