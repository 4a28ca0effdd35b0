"""sonic_tpu — a TPU-native Sonic zk-SNARK framework.

A from-scratch reimplementation of the capabilities of sdiehl/sonic
(Haskell, reference mounted at /root/reference) designed for TPU:
BLS12-381 field/curve arithmetic as limb-decomposed JAX array programs,
Pippenger MSM commitments, fused constraint-polynomial builders, and the
full Sonic prove/verify protocol with a host-side pairing verifier.

Public API (mirrors the reference's exports):

    SRS.new(d, x, alpha)            -- trusted setup        (Sonic.SRS)
    prove(srs, assignment, circuit, rnd) -> (Proof, RndOracle)
    verify(srs, circuit, proof, y, z, yzs) -> bool          (Sonic.Protocol)
    hsc_prove / hsc_verify                                  (Sonic.Signature)
    commit_poly / open_poly / pcv                           (Sonic.CommitmentScheme)
    r_x1_poly / s_at_y / s_at_u_of_y / k_at_y               (Sonic.Constraints)
    ArithCircuit / Assignment / GateWeights                 (bulletproofs types)

The golden_protocol module is the host (Python-int) oracle implementation;
proofs from both paths are bit-identical for identical randomness.
"""

from .circuit import ArithCircuit, Assignment, GateWeights
from .constraints import DeviceAssignment, DeviceCircuit
from .golden_protocol import Proof, RndOracle, Randomness, HscProof
from .protocol import prove, prove_batch, verify
from .signature import hsc_prove, hsc_verify
from .commitment import commit_poly, open_poly, pcv
from .srs import SRS

__version__ = "0.3.0"  # tracks the reference's package.yaml version

__all__ = [
    "ArithCircuit",
    "Assignment",
    "GateWeights",
    "DeviceAssignment",
    "DeviceCircuit",
    "Proof",
    "RndOracle",
    "Randomness",
    "HscProof",
    "prove",
    "prove_batch",
    "verify",
    "hsc_prove",
    "hsc_verify",
    "commit_poly",
    "open_poly",
    "pcv",
    "SRS",
]
