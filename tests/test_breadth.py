"""Reference-breadth randomized protocol tests (VERDICT r2 item 6).

The reference runs 50 QuickCheck round-trips over random circuits with
n in [1, 20] (test/Test/Protocol.hs:14-23) using the generators of
test/Test/Reference.hs:125-169, including the small-n SRS-degree quirks
(d >= 12 for n=1, d >= 16 for n=2 — Reference.hs:92-104). Here:

  - 25 golden round-trips over the same circuit distribution (the golden
    path IS the oracle the device path is bit-matched against elsewhere;
    d is capped at 7n+24 instead of 100n purely for suite wall-clock)
  - a device-path sweep over n in {1, 2, 4, 8} with golden bit-compare
"""
import random

import pytest

from sonic_tpu import golden_protocol as gp
from sonic_tpu.circuit import random_circuit


def _random_d(rng, n: int) -> int:
    # Reference.hs:101-104: commit/open index ranges demand d >= 12 (n=1)
    # and d >= 16 (n=2); otherwise d in [7n, ...].
    if n == 1:
        lo = 12
    elif n == 2:
        lo = 16
    else:
        lo = 7 * n
    return rng.randrange(lo, lo + 25)


@pytest.mark.slow
@pytest.mark.parametrize("case", range(25))
def test_golden_roundtrip_random_circuits(case):
    rng = random.Random(9000 + case)
    n = rng.randrange(1, 21)
    q = rng.randrange(1, n + 1)
    circuit, assignment = random_circuit(rng, n=n, q=q)
    d = _random_d(rng, n)
    srs = gp.SRS.new(d, x=rng.randrange(2, gp.P), alpha=rng.randrange(2, gp.P))
    rnd = gp.Randomness.generate(rng, m=q)
    proof, oracle = gp.prove(srs, assignment, circuit, rnd)
    assert gp.verify(srs, circuit, proof, oracle.y, oracle.z, oracle.yzs)


@pytest.mark.slow
@pytest.mark.parametrize("case", range(4))
def test_golden_roundtrip_full_d_range(case):
    """The reference's REAL d distribution — d in [7n, 100n]
    (test/Test/Reference.hs:101-104), no suite-wall-clock cap (VERDICT r3
    missing #1). Kept to a few cases because SRS.new at d up to 100n
    dominates runtime."""
    rng = random.Random(9500 + case)
    n = rng.randrange(1, 11)
    q = rng.randrange(1, n + 1)
    circuit, assignment = random_circuit(rng, n=n, q=q)
    if n == 1:
        lo = 12
    elif n == 2:
        lo = 16
    else:
        lo = 7 * n
    d = rng.randrange(lo, 100 * n + 1)
    srs = gp.SRS.new(d, x=rng.randrange(2, gp.P), alpha=rng.randrange(2, gp.P))
    rnd = gp.Randomness.generate(rng, m=q)
    proof, oracle = gp.prove(srs, assignment, circuit, rnd)
    assert gp.verify(srs, circuit, proof, oracle.y, oracle.z, oracle.yzs)


@pytest.mark.slow
@pytest.mark.parametrize("n", [1, 2, 4, 8])
def test_device_prove_matches_golden_sweep(n):
    from sonic_tpu import protocol
    from sonic_tpu.constraints import DeviceAssignment, DeviceCircuit
    from sonic_tpu.srs import SRS

    rng = random.Random(7700 + n)
    q = rng.randrange(1, n + 1)
    circuit, assignment = random_circuit(rng, n=n, q=q)
    d = _random_d(rng, n)
    host_srs = gp.SRS.new(
        d, x=rng.randrange(2, gp.P), alpha=rng.randrange(2, gp.P)
    )
    rnd = gp.Randomness.generate(rng, m=q)
    golden_proof, oracle = gp.prove(host_srs, assignment, circuit, rnd)

    srs = SRS.from_host(host_srs)
    dc = DeviceCircuit.from_host(circuit)
    da = DeviceAssignment.from_host(assignment)
    proof, _ = protocol.prove(srs, da, dc, rnd)
    assert proof == golden_proof
    assert protocol.verify(srs, dc, proof, oracle.y, oracle.z, oracle.yzs)
