"""Constraint system -> polynomials, fused for TPU.

Reference: src/Sonic/Constraints.hs builds full SPARSE BIVARIATE polynomials
and partially evaluates them later (Protocol.hs:72). On TPU we commute the
evaluation into the construction: the prover only ever needs r(X,1), r(X,y),
s(X,y), s(u,Y), t(X,y), k(y) — each is a dense univariate built directly
from the assignment/weights with power ladders and matmul-shaped weighted
sums (O(nQ) work as batched array ops, never materializing the O(n*Q)
bivariate coefficient grid per X-row).

Exponent layout notes (match Constraints.hs):
  r'(X,Y) = sum_i a_i X^i Y^i + b_i X^-i Y^-i + c_i X^-(i+n) Y^-(i+n)
            + sum_{i=1..4} c_{n+i} X^-(2n+i) Y^-(2n+i)        [blinding]
  s(X,Y)  = sum_i u_i(Y) X^-i + v_i(Y) X^i + w_i(Y) X^(i+n)
  u_i(Y)  = sum_q Y^(n+q) wL[q,i];  v_i analogous (wR)
  w_i(Y)  = -Y^i - Y^-i + sum_q Y^(n+q) wO[q,i]
  k(Y)    = sum_q cs_q Y^(n+q)
  t(X,Y)  = r(X,1) (r(X,Y) + s(X,Y)) - k(Y)
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .fields import limb
from .fields.limb import FR
from .poly.laurent import Laurent
from .circuit import ArithCircuit, Assignment, GateWeights


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DeviceCircuit:
    """Montgomery limb arrays: wL/wR/wO (Q, n, L), cs (Q, L)."""

    wL: jnp.ndarray
    wR: jnp.ndarray
    wO: jnp.ndarray
    cs: jnp.ndarray

    def tree_flatten(self):
        return (self.wL, self.wR, self.wO, self.cs), None

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(*children)

    @property
    def n(self) -> int:
        return self.wL.shape[1]

    @property
    def q(self) -> int:
        return self.wL.shape[0]

    @classmethod
    def from_host(cls, circuit: ArithCircuit) -> "DeviceCircuit":
        w = circuit.weights
        return cls(
            wL=FR.from_int([list(r) for r in w.wL]),
            wR=FR.from_int([list(r) for r in w.wR]),
            wO=FR.from_int([list(r) for r in w.wO]),
            cs=FR.from_int(list(circuit.cs)),
        )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DeviceAssignment:
    aL: jnp.ndarray  # (n, L)
    aR: jnp.ndarray
    aO: jnp.ndarray

    def tree_flatten(self):
        return (self.aL, self.aR, self.aO), None

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(*children)

    @property
    def n(self) -> int:
        return self.aL.shape[0]

    @classmethod
    def from_host(cls, a: Assignment) -> "DeviceAssignment":
        return cls(
            aL=FR.from_int(list(a.aL)),
            aR=FR.from_int(list(a.aR)),
            aO=FR.from_int(list(a.aO)),
        )


# ---------------------------------------------------------------------------


@jax.jit
def _r_x1_coeffs(aL, aR, aO, cns):
    zero = jnp.zeros((1, aL.shape[-1]), jnp.uint32)
    return jnp.concatenate([cns[::-1], aO[::-1], aR[::-1], zero, aL], axis=0)


def r_x1_poly(assignment: DeviceAssignment, cns) -> Laurent:
    """Blinded r'(X, 1): dense over exponents [-(2n+4), n].

    cns: (4, L) blinding scalars c_{n+1..n+4} (Protocol.hs:58-62)."""
    n = assignment.n
    coeffs = _r_x1_coeffs(assignment.aL, assignment.aR, assignment.aO, cns)
    return Laurent(-(2 * n + 4), coeffs)


@partial(jax.jit, static_argnames="offset")
def _scale_by_exp_powers(coeffs, y, offset: int):
    """coeff at exponent e -> coeff * y^e (diagonal substitution X -> Xy)."""
    D = coeffs.shape[0]
    pows = limb.powers(y, FR, D)
    yoff = limb.pow_int(y, FR, offset)
    return limb.mul(coeffs, limb.mul(pows, yoff, FR), FR)


def r_at_y(r1: Laurent, y) -> Laurent:
    """r'(X, y) from r'(X, 1): every term of r' is (coeff) X^e Y^e, so
    substituting Y=y scales the X^e coefficient by y^e."""
    return Laurent(r1.offset, _scale_by_exp_powers(r1.coeffs, y, r1.offset))


@partial(jax.jit, static_argnames=("n", "q"))
def _s_at_y_coeffs(wL, wR, wO, y, n: int, q: int):
    ypows = limb.powers(y, FR, n + q + 1)  # y^0 .. y^(n+q)
    yq = ypows[n + 1 :]  # y^(n+1) .. y^(n+q)   (q, L)
    u = limb.sum_mod(limb.mul(yq[:, None], wL, FR), FR, axis=0)  # (n, L)
    v = limb.sum_mod(limb.mul(yq[:, None], wR, FR), FR, axis=0)
    w0 = limb.sum_mod(limb.mul(yq[:, None], wO, FR), FR, axis=0)
    ypos = ypows[1 : n + 1]  # y^1..y^n
    yneg = limb.powers(limb.inv(y, FR), FR, n + 1)[1:]  # y^-1..y^-n
    w = limb.sub(w0, limb.add(ypos, yneg, FR), FR)
    zero = jnp.zeros((1, wL.shape[-1]), jnp.uint32)
    return jnp.concatenate([u[::-1], zero, v, w], axis=0)


def s_at_y(circuit: DeviceCircuit, y) -> Laurent:
    """s(X, y): dense over exponents [-n, 2n] (Constraints.hs:34-53 with
    Y := y fused in)."""
    n, q = circuit.n, circuit.q
    coeffs = _s_at_y_coeffs(circuit.wL, circuit.wR, circuit.wO, y, n, q)
    return Laurent(-n, coeffs)


def s_at_y_batched(circuit: DeviceCircuit, ys: jnp.ndarray) -> jnp.ndarray:
    """s(X, y_j) for ys (M, L) -> coefficient batch (M, 3n+1, L) at the
    common offset -n. One vmapped build for the hsc helper's m polynomials
    (Signature.hs:40-45 — identical shape across j)."""
    n, q = circuit.n, circuit.q
    return jax.vmap(
        lambda y: _s_at_y_coeffs(circuit.wL, circuit.wR, circuit.wO, y, n, q)
    )(ys)


# -- proof-batch variants (B independent circuits of one shape) -------------
# SURVEY.md §2.3 parallelism row 3 / BASELINE config 5: batch-parallel
# proving. Circuits stack into (B, Q, n, L) weight tensors; every builder
# vmaps over the proof axis.


def stack_circuits(circuits: list[DeviceCircuit]) -> DeviceCircuit:
    """B shape-identical circuits -> one DeviceCircuit with leading proof
    axis on every tensor ((B, Q, n, L) weights, (B, Q, L) cs)."""
    return DeviceCircuit(
        wL=jnp.stack([c.wL for c in circuits]),
        wR=jnp.stack([c.wR for c in circuits]),
        wO=jnp.stack([c.wO for c in circuits]),
        cs=jnp.stack([c.cs for c in circuits]),
    )


def stack_assignments(assignments: list[DeviceAssignment]) -> DeviceAssignment:
    return DeviceAssignment(
        aL=jnp.stack([a.aL for a in assignments]),
        aR=jnp.stack([a.aR for a in assignments]),
        aO=jnp.stack([a.aO for a in assignments]),
    )


def r_x1_batch(assignments: DeviceAssignment, cns: jnp.ndarray) -> jnp.ndarray:
    """Stacked assignments (B, n, L) + blinding (B, 4, L) -> blinded
    r'(X, 1) coefficient batch (B, 3n+5, L) at offset -(2n+4)."""
    return jax.vmap(_r_x1_coeffs)(
        assignments.aL, assignments.aR, assignments.aO, cns
    )


def r_at_y_batch(coeffs: jnp.ndarray, ys: jnp.ndarray, offset: int):
    """(B, D, L) r' coefficients + (B, L) ys -> (B, D, L) r'(X, y_b)."""
    return jax.vmap(lambda cf, y: _scale_by_exp_powers(cf, y, offset))(
        coeffs, ys
    )


def s_at_y_batch(circuits: DeviceCircuit, ys: jnp.ndarray) -> jnp.ndarray:
    """Stacked circuits + (B, L) ys -> (B, 3n+1, L) s(X, y_b) at -n."""
    n, q = circuits.wL.shape[2], circuits.wL.shape[1]
    return jax.vmap(
        lambda wL, wR, wO, y: _s_at_y_coeffs(wL, wR, wO, y, n, q)
    )(circuits.wL, circuits.wR, circuits.wO, ys)


def s_at_u_batch(circuits: DeviceCircuit, us: jnp.ndarray) -> jnp.ndarray:
    """Stacked circuits + (B, L) us -> (B, 2n+q+1, L) s(u_b, Y) at -n."""
    n, q = circuits.wL.shape[2], circuits.wL.shape[1]
    return jax.vmap(
        lambda wL, wR, wO, u: _s_u_coeffs(wL, wR, wO, u, n, q)
    )(circuits.wL, circuits.wR, circuits.wO, us)


def k_at_y_batch(circuits: DeviceCircuit, n: int, ys: jnp.ndarray):
    """Stacked cs (B, Q, L) + (B, L) ys -> (B, L) k(y_b)."""
    return jax.vmap(lambda cs, y: _k_at_y(cs, y, n))(circuits.cs, ys)


@partial(jax.jit, static_argnames=("n", "q"))
def _s_u_coeffs(wL, wR, wO, u, n: int, q: int):
    upows = limb.powers(u, FR, 2 * n + 1)  # u^0..u^2n
    uneg = limb.powers(limb.inv(u, FR), FR, n + 1)[1:]  # u^-1..u^-n
    upos = upows[1 : n + 1]  # u^1..u^n
    uhi = upows[n + 1 : 2 * n + 1]  # u^(n+1)..u^(2n)
    # Y^(q+n) coefficients: sum_i wL[q,i] u^-i + wR[q,i] u^i + wO[q,i] u^(i+n)
    cq = limb.sum_mod(
        limb.add(
            limb.add(
                limb.mul(wL, uneg[None], FR), limb.mul(wR, upos[None], FR), FR
            ),
            limb.mul(wO, uhi[None], FR),
            FR,
        ),
        FR,
        axis=1,
    )  # (q, L)
    neg_uhi = limb.neg(uhi, FR)  # -u^(n+i) for i=1..n
    zero = jnp.zeros((1, wL.shape[-1]), jnp.uint32)
    # dense over Y exponents [-n, n+q]:
    #   e=-i (i=n..1): -u^(n+i)  -> ascending e: [-u^2n, ..., -u^(n+1)]
    #   e=0: 0
    #   e=i (i=1..n): -u^(n+i)
    #   e=n+1..n+q: cq
    return jnp.concatenate([neg_uhi[::-1], zero, neg_uhi, cq], axis=0)


def s_at_u_of_y(circuit: DeviceCircuit, u) -> Laurent:
    """s(u, Y) as a polynomial in Y: dense over exponents [-n, n+Q]
    (the hsc protocol's C-polynomial, Signature.hs:48-52)."""
    n, q = circuit.n, circuit.q
    coeffs = _s_u_coeffs(circuit.wL, circuit.wR, circuit.wO, u, n, q)
    return Laurent(-n, coeffs)


@partial(jax.jit, static_argnames=("n",))
def _k_at_y(cs, y, n: int):
    qn = cs.shape[0]
    ypows = limb.powers(y, FR, n + qn + 1)
    yq = ypows[n + 1 :]
    return limb.sum_mod(limb.mul(cs, yq, FR), FR, axis=0)


def k_at_y(circuit: DeviceCircuit, n: int, y):
    """k(y) = sum_q cs_q y^(n+q) (Constraints.hs:67-68)."""
    return _k_at_y(circuit.cs, y, n)
