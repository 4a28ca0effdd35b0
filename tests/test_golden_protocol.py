"""Golden (host) protocol: algebraic invariants (reference
test/Test/Constraints.hs) + full round-trips (test/Test/Protocol.hs)."""
import random

import pytest

from sonic_tpu import golden_protocol as gp
from sonic_tpu.circuit import (
    example_circuit_1,
    example_circuit_2,
    random_circuit,
)
from sonic_tpu.fields.constants import R_MOD


def _rand_params(rng):
    return (
        rng.randrange(1, R_MOD),
        rng.randrange(1, R_MOD),
        rng.randrange(1, R_MOD),
        rng.randrange(1, R_MOD),
    )


def test_rpoly_homogeneity(rng):
    """r(X, Y) == r(XY, 1) — Test/Constraints.hs prop_rPoly_prop."""
    circuit, assignment = random_circuit(rng, n=4, q=3)
    r = gp.r_poly(assignment)
    x, y = rng.randrange(1, R_MOD), rng.randrange(1, R_MOD)
    lhs = gp.lp_eval(gp.bp_eval_y(y, r), x)
    rhs = gp.lp_eval(gp.bp_eval_y(1, r), x * y % R_MOD)
    assert lhs == rhs


def test_tpoly_zero_constant(rng):
    """Constant coefficient of t(X,Y) vanishes iff constraints are satisfied
    — Test/Constraints.hs prop_tPoly_zero_constant (the heart of Sonic)."""
    for _ in range(3):
        circuit, assignment = random_circuit(rng)
        n = assignment.n
        k_y = gp.k_poly(circuit.cs, n)
        s_xy = gp.s_poly(circuit.weights)
        t_xy = gp.t_poly(gp.r_poly(assignment), s_xy, k_y)
        const = t_xy.get(0, {}).get(0, 0)
        assert const == 0


def test_rpoly_spoly_zero_constant(rng):
    """r and s have no constant term (Test/Constraints.hs:37-52)."""
    circuit, assignment = random_circuit(rng, n=5, q=2)
    r = gp.r_poly(assignment)
    s = gp.s_poly(circuit.weights)
    assert r.get(0, {}).get(0, 0) == 0
    assert s.get(0, {}).get(0, 0) == 0


def test_linear_constraints(rng):
    """aL.u_q + aR.v_q + aO.w_q = k_q per linear constraint
    (Test/Constraints.hs prop_linear_constraints, reformulated on weights)."""
    circuit, assignment = random_circuit(rng)
    w = circuit.weights
    for q in range(w.q):
        lhs = (
            sum(a * b for a, b in zip(assignment.aL, w.wL[q]))
            + sum(a * b for a, b in zip(assignment.aR, w.wR[q]))
            + sum(a * b for a, b in zip(assignment.aO, w.wO[q]))
        ) % R_MOD
        assert lhs == circuit.cs[q] % R_MOD


@pytest.mark.parametrize("example", [example_circuit_1, example_circuit_2])
def test_protocol_roundtrip(rng, example):
    x, z, alpha, _ = _rand_params(rng)
    circuit, assignment = example(x, z)
    n = assignment.n
    d = rng.randrange(max(16, 7 * n), 30 * n + 20)
    srs = gp.SRS.new(d, x, alpha)
    rnd = gp.Randomness.generate(rng, circuit.weights.q)
    proof, oracle = gp.prove(srs, assignment, circuit, rnd)
    assert gp.verify(srs, circuit, proof, oracle.y, oracle.z, oracle.yzs)


def test_bad_assignment_is_uncommittable(rng):
    """An unsatisfied assignment gives t(X,Y) a nonzero constant term, which
    cannot be committed because g^alpha is omitted from the SRS
    (SRS.hs:38-39) — the reference panics in commitPoly; we raise."""
    x, z, alpha, _ = _rand_params(rng)
    circuit, assignment = example_circuit_2(x, z)
    assignment.aO = [(v + 1) % R_MOD for v in assignment.aO]  # break it
    srs = gp.SRS.new(16, x, alpha)
    rnd = gp.Randomness.generate(rng, circuit.weights.q)
    with pytest.raises(IndexError):
        gp.prove(srs, assignment, circuit, rnd)


def test_protocol_rejects_tampered_proof(rng):
    x, z, alpha, _ = _rand_params(rng)
    circuit, assignment = example_circuit_2(x, z)
    srs = gp.SRS.new(16, x, alpha)
    rnd = gp.Randomness.generate(rng, circuit.weights.q)
    proof, oracle = gp.prove(srs, assignment, circuit, rnd)
    proof.pr_s = (proof.pr_s + 1) % R_MOD
    assert not gp.verify(srs, circuit, proof, oracle.y, oracle.z, oracle.yzs)


def test_protocol_random_circuit(rng):
    x, _, alpha, _ = _rand_params(rng)
    circuit, assignment = random_circuit(rng, n=3, q=2)
    d = 7 * assignment.n + 9
    srs = gp.SRS.new(max(d, 21), x, alpha)
    rnd = gp.Randomness.generate(rng, circuit.weights.q)
    proof, oracle = gp.prove(srs, assignment, circuit, rnd)
    assert gp.verify(srs, circuit, proof, oracle.y, oracle.z, oracle.yzs)
