"""Full SHARDED prove over the 8-virtual-device mesh == golden proof.

SURVEY.md §2.3 parallelism rows 1-2: the protocol itself must run its
commit/open MSMs and the t(X, y) product mesh-parallel, not just expose
sharded kernels. The proof bits must be identical to the host golden
prover's (and hence to the single-device device path, which is separately
golden-matched in test_protocol_device.py).
"""
import random

import pytest

from sonic_tpu import golden_protocol as gp
from sonic_tpu import protocol
from sonic_tpu.circuit import random_circuit
from sonic_tpu.constraints import DeviceAssignment, DeviceCircuit
from sonic_tpu.parallel.mesh import make_mesh
from sonic_tpu.srs import SRS


def _roundtrip(n, q, seed, d=None):
    rng = random.Random(seed)
    circuit, assignment = random_circuit(rng, n=n, q=q)
    d = d or (7 * n + 6)
    host_srs = gp.SRS.new(d, x=rng.randrange(2, gp.P), alpha=rng.randrange(2, gp.P))
    srs = SRS.from_host(host_srs)
    rnd = gp.Randomness.generate(rng, m=q)
    mesh = make_mesh(8)
    proof, oracle = protocol.prove(
        srs,
        DeviceAssignment.from_host(assignment),
        DeviceCircuit.from_host(circuit),
        rnd,
        mesh=mesh,
    )
    golden_proof, golden_oracle = gp.prove(host_srs, assignment, circuit, rnd)
    assert proof == golden_proof
    assert oracle.y == golden_oracle.y and oracle.z == golden_oracle.z
    assert protocol.verify(
        srs,
        DeviceCircuit.from_host(circuit),
        proof,
        oracle.y,
        oracle.z,
        oracle.yzs,
    )


def test_sharded_prove_small():
    """Small circuit: sharded MSMs (schoolbook t product — below the NTT
    threshold), batched sharded hsc."""
    _roundtrip(n=4, q=3, seed=31)


@pytest.mark.slow
def test_sharded_prove_ntt_path():
    """n=64: the t(X, y) product crosses the NTT threshold and runs the
    four-step all-to-all sharded NTT inside prove (VERDICT r2 item 4)."""
    _roundtrip(n=64, q=4, seed=32)
