"""Batch-parallel proving == B independent proves, bit-for-bit.

SURVEY.md §2.3 parallelism row 3 / BASELINE config 5: B shape-identical
independent circuits prove in one batched device pipeline.
"""
import random

from sonic_tpu import golden_protocol as gp
from sonic_tpu import protocol
from sonic_tpu.circuit import random_circuit
from sonic_tpu.constraints import DeviceAssignment, DeviceCircuit
from sonic_tpu.srs import SRS


def test_prove_batch_matches_individual():
    rng = random.Random(77)
    n, q, B = 3, 2, 3
    host_srs = gp.SRS.new(
        7 * n + 5, x=rng.randrange(2, gp.P), alpha=rng.randrange(2, gp.P)
    )
    srs = SRS.from_host(host_srs)
    circuits, assignments, rnds = [], [], []
    for _ in range(B):
        c, a = random_circuit(rng, n=n, q=q)
        circuits.append(c)
        assignments.append(a)
        rnds.append(gp.Randomness.generate(rng, m=q))
    dcs = [DeviceCircuit.from_host(c) for c in circuits]
    das = [DeviceAssignment.from_host(a) for a in assignments]

    batch = protocol.prove_batch(srs, das, dcs, rnds)
    for b in range(B):
        proof_b, oracle_b = batch[b]
        single, oracle_s = protocol.prove(srs, das[b], dcs[b], rnds[b])
        assert proof_b == single
        assert oracle_b.y == oracle_s.y and oracle_b.yzs == oracle_s.yzs
        assert protocol.verify(
            srs, dcs[b], proof_b, oracle_b.y, oracle_b.z, oracle_b.yzs
        )
