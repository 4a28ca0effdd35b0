"""Dense Laurent polynomials over Fr for TPU.

TPU-native equivalent of the reference's `poly` dependency
(Data.Poly.Sparse.Laurent — SURVEY.md §2.3): the reference keeps SPARSE
term lists; here a polynomial is a dense, contiguous coefficient array plus
a static exponent offset, the layout that vectorizes on TPU. The four Sonic
polynomials all have known, contiguous exponent spans (SURVEY.md §5
long-context entry), so dense-with-offset loses nothing.

    poly  ==  sum_i  coeffs[i] * X^(offset + i)

coeffs: (D, FR_LIMBS) uint32, Montgomery-form Fr. offset: static int.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import limb
from ..fields.limb import FR


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Laurent:
    offset: int
    coeffs: jnp.ndarray  # (D, L)

    def tree_flatten(self):
        return (self.coeffs,), self.offset

    @classmethod
    def tree_unflatten(cls, offset, children):
        return cls(offset, children[0])

    @property
    def length(self) -> int:
        return self.coeffs.shape[0]

    @property
    def max_exp(self) -> int:
        return self.offset + self.length - 1

    # -- host-side helpers ---------------------------------------------------

    @classmethod
    def from_terms(cls, terms: dict[int, int]) -> "Laurent":
        """{exponent: int coefficient} -> dense Laurent (host-side)."""
        if not terms:
            return cls(0, FR.zeros((0,)))
        lo, hi = min(terms), max(terms)
        vals = [terms.get(e, 0) for e in range(lo, hi + 1)]
        return cls(lo, FR.from_int(vals))

    def to_terms(self) -> dict[int, int]:
        """Dense -> sparse {exponent: int}, dropping zeros (host-side)."""
        vals = np.atleast_1d(FR.to_int(self.coeffs))
        return {
            self.offset + i: int(v) for i, v in enumerate(vals) if int(v) != 0
        }


def zero() -> Laurent:
    return Laurent(0, FR.zeros((1,)))


def align(p: Laurent, q: Laurent) -> tuple[jnp.ndarray, jnp.ndarray, int]:
    """Pad both coefficient arrays onto the union exponent range."""
    lo = min(p.offset, q.offset)
    hi = max(p.max_exp, q.max_exp)
    width = hi - lo + 1

    def pad(r: Laurent):
        pre = r.offset - lo
        post = width - pre - r.length
        return jnp.pad(r.coeffs, ((pre, post), (0, 0)))

    return pad(p), pad(q), lo


def add(p: Laurent, q: Laurent) -> Laurent:
    a, b, lo = align(p, q)
    return Laurent(lo, limb.add(a, b, FR))


def sub(p: Laurent, q: Laurent) -> Laurent:
    a, b, lo = align(p, q)
    return Laurent(lo, limb.sub(a, b, FR))


def neg(p: Laurent) -> Laurent:
    return Laurent(p.offset, limb.neg(p.coeffs, FR))


def scale(p: Laurent, c) -> Laurent:
    """Multiply every coefficient by the Fr element c (L,)."""
    return Laurent(p.offset, limb.mul(p.coeffs, c, FR))


def shift(p: Laurent, k: int) -> Laurent:
    """Multiply by X^k (exponent shift; free)."""
    return Laurent(p.offset + k, p.coeffs)


@partial(jax.jit, static_argnames=())
def _conv_coeffs(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook polynomial product of coefficient arrays (Da,L)x(Db,L) ->
    (Da+Db-1, L): all pairwise Fr muls, then modular anti-diagonal sums.

    O(Da*Db) field muls, fully parallel. NTT (poly/ntt.py) replaces this
    for large degrees.
    """
    Da, Db = a.shape[0], b.shape[0]
    out_len = Da + Db - 1
    prod = limb.mul(a[:, None, :], b[None, :, :], FR)  # (Da, Db, L)
    # anti-diagonal gather: output column k collects prod[i, k-i]
    j = np.arange(out_len)[None, :] - np.arange(Da)[:, None]  # (Da, out)
    valid = jnp.asarray((j >= 0) & (j < Db))
    idx = jnp.asarray(np.clip(j, 0, Db - 1), jnp.int32)
    gathered = jnp.take_along_axis(prod, idx[..., None], axis=1)  # (Da, out, L)
    gathered = jnp.where(valid[..., None], gathered, 0)
    return limb.sum_mod(gathered, FR, axis=0)


# Above this many pairwise products, NTT multiplication wins.
_NTT_THRESHOLD = 64 * 64


def _ntt_threshold() -> int:
    """Pairwise-product count above which NTT multiplication is used.

    Env-overridable (SONIC_TPU_NTT_THRESHOLD) so small-shape harness runs
    — e.g. the driver's multichip dryrun — can exercise the NTT paths
    (including the mesh-sharded four-step) without paying full-size
    compiles."""
    import os

    v = os.environ.get("SONIC_TPU_NTT_THRESHOLD")
    return int(v) if v else _NTT_THRESHOLD


def mul(p: Laurent, q: Laurent, mesh=None) -> Laurent:
    """Polynomial product. With `mesh`, large products run the four-step
    mesh-sharded NTT (all-to-all butterfly exchange over the device mesh);
    falls back to the single-device path when the transform is too small
    to split R x C over the mesh."""
    if mesh is not None and p.length * q.length >= _ntt_threshold():
        from ..parallel.ntt_sharded import poly_mul_ntt_sharded, splittable

        out_len = p.length + q.length - 1
        if splittable(out_len, mesh.devices.size):
            return Laurent(
                p.offset + q.offset,
                poly_mul_ntt_sharded(p.coeffs, q.coeffs, mesh),
            )
    if p.length * q.length >= _ntt_threshold():
        from .ntt import poly_mul_ntt

        return Laurent(p.offset + q.offset, poly_mul_ntt(p.coeffs, q.coeffs))
    return Laurent(p.offset + q.offset, _conv_coeffs(p.coeffs, q.coeffs))


@partial(jax.jit, static_argnames="offset")
def _eval_jit(coeffs, z, offset: int):
    D = coeffs.shape[0]
    pows = limb.powers(z, FR, D)  # z^0 .. z^(D-1)
    terms = limb.mul(coeffs, pows, FR)
    s = limb.sum_mod(terms, FR, axis=0)
    zoff = limb.pow_int(z, FR, offset)
    return limb.mul(s, zoff, FR)


def _pad_pow2(coeffs: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad the coefficient axis to a power of two, so jitted helpers
    are shared across the protocol's many polynomial lengths."""
    n = coeffs.shape[0]
    n2 = 1
    while n2 < n:
        n2 *= 2
    if n2 == n:
        return coeffs
    return jnp.pad(coeffs, ((0, n2 - n), (0, 0)))


def evaluate(p: Laurent, z) -> jnp.ndarray:
    """f(z) for Fr element z (L,) -> (L,). Includes negative exponents
    (matching Data.Poly.Sparse.Laurent `eval`)."""
    return _eval_jit(_pad_pow2(p.coeffs), z, p.offset)


@jax.jit
def _div_linear_seq(chat, z):
    """Exact division of the ordinary polynomial chat (degree D-1, with
    chat(z) == 0) by (X - z): top-down synthetic division as a sequential
    scan. Kept as the oracle for the log-depth variant below (and for a
    z = 0 divisor, which the closed form cannot handle)."""
    D = chat.shape[0]

    # w_{D-2} = c_{D-1};  w_{i-1} = c_i + z * w_i   for i = D-2 .. 1
    def step(w, c):
        w_next = limb.add(c, limb.mul(z, w, FR), FR)
        return w_next, w

    init = chat[D - 1]
    cs = chat[1 : D - 1][::-1]  # c_{D-2} .. c_1
    last, ws_rev = jax.lax.scan(step, init, cs)
    # ws_rev holds [w_{D-2}, ..., w_1] in scan order; last == w_0
    ws = jnp.concatenate([last[None], ws_rev[::-1]], 0)
    return ws


def _powers_leading(z, count: int):
    """[z^0 .. z^(count-1)] along a NEW leading axis; z may itself be
    batched (..., L) — unlike limb.powers, which is unbatched-only."""
    one = jnp.broadcast_to(FR.from_int(1), z.shape)
    if count == 1:
        return one[None]
    zb = jnp.broadcast_to(z, (count - 1,) + z.shape)
    lad = jax.lax.associative_scan(
        lambda x, y: limb.mul(x, y, FR), zb, axis=0
    )
    return jnp.concatenate([one[None], lad], 0)


@jax.jit
def _div_linear_jit(chat, z):
    """Synthetic division quotient, scan-free: the recurrence
    w_{i-1} = c_i + z*w_i with constant z has the closed form
        w_{D-2-j} = z^j * sum_{k<=j} c_{D-1-k} * z^-k,
    i.e. two log-depth power ladders + one log-depth prefix sum — instead
    of a (D-2)-step sequential scan. REQUIRES z != 0 (true for every
    protocol divisor: challenges are sampled from [1, r)).

    Motivation beyond speed: vmapping the sequential scan at shape
    (64, 8192, L) miscompiles on the axon TPU backend (wrong low-half
    quotients, host-checked); the associative form both avoids the bug
    and turns the prover's ~8k-step scans into ~13 batched rounds.
    chat: (D, ..., L) coefficient-leading layout; z: (..., L)."""
    D = chat.shape[0]
    crev = chat[::-1][: D - 1]  # c_{D-1}, c_{D-2}, ..., c_1
    zinv = limb.inv(z, FR)
    zinv_lad = _powers_leading(zinv, D - 1)
    z_lad = _powers_leading(z, D - 1)
    t = limb.mul(crev, zinv_lad, FR)
    s = jax.lax.associative_scan(
        lambda x, y: limb.add(x, y, FR), t, axis=0
    )
    u = limb.mul(s, z_lad, FR)  # u_j = w_{D-2-j}
    return u[::-1]


def div_by_linear(p: Laurent, z, fz=None) -> tuple[jnp.ndarray, Laurent]:
    """w(X) = (f(X) - f(z)) / (X - z)  — exact Laurent division, mirroring
    `openPoly`'s use of Data.Euclidean.divide (CommitmentScheme.hs:44).

    Returns (f(z), w). w has offset = p.offset, length = p.length - 1.
    """
    if fz is None:
        fz = evaluate(p, z)
    # fhat(X) = X^(-offset) (f(X) - f(z)) is an ordinary poly with fhat(z)=0
    # (the X^(-offset) shift just reindexes the dense array).
    const_pos = -p.offset
    chat = p.coeffs
    if 0 <= const_pos < p.length:
        chat = chat.at[const_pos].set(limb.sub(chat[const_pos], fz, FR))
    elif not limb_is_zero_host(fz):
        raise ValueError("f(z) != 0 but X^0 not inside the dense span")
    # pad to pow2 for jit-program reuse; the extra top coefficients are zero
    # so the quotient's top coefficients are zero too — slice them off.
    ws = _div_linear_jit(_pad_pow2(chat), z)
    return fz, Laurent(p.offset, ws[: p.length - 1])


def limb_is_zero_host(x) -> bool:
    return bool(np.all(np.asarray(x) == 0))


# ---------------------------------------------------------------------------
# Batched variants — one polynomial family, m points/instances at once.
# These power the hsc helper protocol, whose m openings are independent
# (Signature.hs:40-57) and shape-identical, so they run as single vmapped
# programs instead of m sequential dispatches.
# ---------------------------------------------------------------------------


def _pad_pow2_batch(coeffs: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad axis 1 of (M, D, L) to a power of two (cf. _pad_pow2)."""
    n = coeffs.shape[1]
    n2 = 1
    while n2 < n:
        n2 *= 2
    if n2 == n:
        return coeffs
    return jnp.pad(coeffs, ((0, 0), (0, n2 - n), (0, 0)))


def add_batched(
    offset_a: int, a: jnp.ndarray, offset_b: int, b: jnp.ndarray
) -> tuple[int, jnp.ndarray]:
    """Batched aligned add: (M, Da, L) + (M, Db, L) at their offsets ->
    (union offset, (M, D, L))."""
    lo = min(offset_a, offset_b)
    hi = max(offset_a + a.shape[1], offset_b + b.shape[1])
    width = hi - lo

    def pad(off, c):
        pre = off - lo
        return jnp.pad(c, ((0, 0), (pre, width - pre - c.shape[1]), (0, 0)))

    return lo, limb.add(pad(offset_a, a), pad(offset_b, b), FR)


def mul_batched(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched full product: (M, Da, L) x (M, Db, L) -> (M, Da+Db-1, L)
    (offsets add, handled by the caller). NTT above the threshold."""
    if a.shape[1] * b.shape[1] >= _ntt_threshold():
        from .ntt import poly_mul_ntt

        return jax.vmap(poly_mul_ntt)(a, b)
    return jax.vmap(_conv_coeffs)(a, b)


def evaluate_batched(offset: int, coeffs: jnp.ndarray, zs: jnp.ndarray):
    """f_j(z_j) for coeffs (M, D, L) sharing one exponent offset and
    zs (M, L) -> (M, L)."""
    padded = _pad_pow2_batch(coeffs)
    return jax.vmap(lambda cf, z: _eval_jit(cf, z, offset))(padded, zs)


def div_by_linear_batched(
    offset: int, coeffs: jnp.ndarray, zs: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched (f_j(X) - f_j(z_j)) / (X - z_j): coeffs (M, D, L), zs (M, L)
    -> (fz (M, L), quotient coeffs (M, D-1, L) at the same offset).

    Requires X^0 inside the dense span (true for every hsc polynomial:
    s(X, y) and s(u, Y) both span exponent 0)."""
    const_pos = -offset
    D = coeffs.shape[1]
    if not (0 <= const_pos < D):
        raise ValueError("batched division requires X^0 inside the span")
    fz = evaluate_batched(offset, coeffs, zs)
    chat = coeffs.at[:, const_pos].set(
        limb.sub(coeffs[:, const_pos], fz, FR)
    )
    # batched directly through the coefficient-leading layout (the
    # scan-free _div_linear_jit broadcasts over trailing batch axes; NOT
    # vmap of a sequential scan, which miscompiles on the axon TPU
    # backend at (64, 8192, L) — see _div_linear_jit)
    ws = jnp.moveaxis(
        _div_linear_jit(jnp.moveaxis(_pad_pow2_batch(chat), 0, 1), zs), 1, 0
    )
    return fz, ws[:, : D - 1]
