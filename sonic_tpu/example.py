"""End-to-end example driver — parity with the reference executable.

Reference: examples/Main.hs:13-74 (`sonicProtocol` + `arithCircuitExample`):
sample d uniformly in [7n, 100n], random trapdoor (x, alpha), SRS setup,
prove, verify with the prover-returned RndOracle values, print the result.

Two paths:
  run_golden() -- host (Python-int) implementation end to end.
  run_device() -- TPU prover/verifier (host SRS uploaded; same semantics).

Usage: python -m sonic_tpu.example [--device] [--seed N]
"""
from __future__ import annotations

import argparse
import random
import time

from . import golden_protocol as gp
from .circuit import example_circuit_2
from .fields.constants import R_MOD
from .utils.log import get_logger, phase_timer

log = get_logger("example")


def sonic_protocol(circuit, assignment, x: int, rng, device: bool = False) -> bool:
    """examples/Main.hs:13-24: setup -> prove -> verify."""
    n = assignment.n
    d = rng.randrange(7 * n, 100 * n + 1)  # d >= 7n (Protocol.hs:54)
    d = max(d, 16)  # small-n quirk (test/Test/Reference.hs:92-104)
    alpha = rng.randrange(1, R_MOD)
    rnd = gp.Randomness.generate(rng, circuit.weights.q)

    with phase_timer(log, "setup", d=d):
        srs = gp.SRS.new(d, x, alpha)

    if not device:
        with phase_timer(log, "prove"):
            proof, oracle = gp.prove(srs, assignment, circuit, rnd)
        with phase_timer(log, "verify"):
            return gp.verify(
                srs, circuit, proof, oracle.y, oracle.z, oracle.yzs
            )

    from . import protocol as dp
    from .constraints import DeviceAssignment, DeviceCircuit
    from .srs import SRS as DeviceSRS

    with phase_timer(log, "upload"):
        dev_srs = DeviceSRS.from_host(srs)
        dev_circuit = DeviceCircuit.from_host(circuit)
        dev_assignment = DeviceAssignment.from_host(assignment)
    with phase_timer(log, "prove"):
        proof, oracle = dp.prove(dev_srs, dev_assignment, dev_circuit, rnd)
    with phase_timer(log, "verify"):
        return dp.verify(
            dev_srs, dev_circuit, proof, oracle.y, oracle.z, oracle.yzs
        )


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--device", action="store_true", help="TPU path")
    parser.add_argument("--seed", type=int, default=None)
    args = parser.parse_args(argv)

    rng = random.Random(args.seed)
    # examples/Main.hs:66-70: random x, z feed the example circuit.
    x = rng.randrange(1, R_MOD)
    z = rng.randrange(1, R_MOD)
    circuit, assignment = example_circuit_2(x, z)
    t0 = time.perf_counter()
    ok = sonic_protocol(circuit, assignment, x, rng, device=args.device)
    log.info("total", seconds=round(time.perf_counter() - t0, 3))
    print(f"Success: {ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
