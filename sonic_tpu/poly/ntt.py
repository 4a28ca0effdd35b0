"""Number-theoretic transform over Fr — large polynomial multiplication.

Replaces the reference's sparse schoolbook products (Data.Poly.Sparse `*`,
the O(n^2 Q) hot loop inside tPoly — SURVEY.md §3.5 item 2) with radix-2
NTT: Fr - 1 = 2^32 * odd (constants.R_TWO_ADICITY), so power-of-two sizes
up to 2^32 are supported.

Layout: coefficient arrays (N, L) Montgomery Fr; each butterfly stage is
one batched Fr multiply of N/2 elements + add/sub, reshaped so XLA
vectorizes across pairs. Twiddle ladders are computed once per size and
cached. The multi-chip variant (sonic_tpu/parallel/ntt_sharded.py) splits
the leading axis over the mesh and exchanges butterflies with all-to-all.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import constants as C
from ..fields import limb
from ..fields.limb import FR

_TWIDDLE_CACHE: dict = {}


def _bit_reverse_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def root_of_unity(logn: int) -> int:
    """Primitive 2^logn-th root of unity in Fr (host int)."""
    assert logn <= C.R_TWO_ADICITY
    return pow(C.ROOT_OF_UNITY_2_32, 1 << (C.R_TWO_ADICITY - logn), C.R_MOD)


def _twiddles(n: int, inverse: bool):
    """(N/2, L) Montgomery ladder of w^0..w^(N/2-1); host-cached per size.

    Only CONCRETE arrays are cached: when this runs inside a trace (e.g.
    the shard_map body of parallel/ntt_sharded.py), limb.powers returns a
    tracer, and caching it would poison later untraced calls of the same
    size (it escapes its trace). Tracing recomputes per compile; compiled
    executions hit the constant-folded ladder, so nothing is lost.
    """
    key = (n, inverse)
    cached = _TWIDDLE_CACHE.get(key)
    if cached is not None:
        return cached
    logn = n.bit_length() - 1
    w = root_of_unity(logn)
    if inverse:
        w = pow(w, -1, C.R_MOD)
    w_m = FR.from_int(w)
    tw = limb.powers(w_m, FR, max(n // 2, 1))
    if not isinstance(tw, jax.core.Tracer):
        _TWIDDLE_CACHE[key] = tw
    return tw


@partial(jax.jit, static_argnames=("n", "inverse"))
def _ntt_jit(a: jnp.ndarray, tw: jnp.ndarray, n: int, inverse: bool):
    logn = n.bit_length() - 1
    perm = jnp.asarray(_bit_reverse_perm(n))
    a = a[perm]
    m = 1
    while m < n:
        # view as (n/(2m), 2, m, L): butterflies between the two halves
        v = a.reshape(n // (2 * m), 2, m, C.FR_LIMBS)
        even = v[:, 0]
        odd = v[:, 1]
        stride = n // (2 * m)
        twid = tw[::stride][:m]  # w_{2m}^j  (m, L)
        t = limb.mul(odd, twid[None], FR)
        upper = limb.add(even, t, FR)
        lower = limb.sub(even, t, FR)
        a = jnp.stack([upper, lower], axis=1).reshape(n, C.FR_LIMBS)
        m *= 2
    return a


@partial(jax.jit, static_argnames=("n", "inverse"))
def _ntt_batched_jit(a: jnp.ndarray, tw: jnp.ndarray, n: int, inverse: bool):
    """NTT over axis 0 of (n, B, L): the per-column transform of the
    four-step sharded NTT (parallel/ntt_sharded.py)."""
    B = a.shape[1]
    perm = jnp.asarray(_bit_reverse_perm(n))
    a = a[perm]
    m = 1
    while m < n:
        v = a.reshape(n // (2 * m), 2, m, B, C.FR_LIMBS)
        even = v[:, 0]
        odd = v[:, 1]
        stride = n // (2 * m)
        twid = tw[::stride][:m]  # (m, L)
        t = limb.mul(odd, twid[None, :, None, :], FR)
        upper = limb.add(even, t, FR)
        lower = limb.sub(even, t, FR)
        a = jnp.stack([upper, lower], axis=1).reshape(n, B, C.FR_LIMBS)
        m *= 2
    return a


def ntt_batched(coeffs: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """In-order NTT over axis 0 of (N, B, L) Montgomery coefficients.
    Does NOT apply the 1/N scaling for inverse (the sharded caller fuses
    it with its final twiddle pass)."""
    n = coeffs.shape[0]
    assert n & (n - 1) == 0
    if n == 1:
        return coeffs
    return _ntt_batched_jit(coeffs, _twiddles(n, inverse), n, inverse)


# Above this size the monolithic unrolled-stage jit program is large
# enough to choke the (remote) XLA compiler — measured: 2^18 compiles in
# ~1 min, 2^20 hangs the axon compile service. The four-step variant
# below recombines small compiled pieces instead.
_FOUR_STEP_MIN = 1 << 19


@partial(jax.jit, static_argnames=("R", "Cc", "n", "inverse"))
def _four_step_mid(a, wbase, R: int, Cc: int, n: int, inverse: bool):
    """Twiddle pass of the four-step NTT: a[k1, n2] *= w_N^(k1*n2)
    (1/N folded in for the inverse). The (R, Cc) twiddle grid is built
    with a log-depth ladder per row — NOT a gather (per-row dynamic
    addressing is pathological on TPU, BENCH_NOTES.md)."""
    zb = jnp.broadcast_to(wbase[:, None, :], (R, Cc - 1, C.FR_LIMBS))
    ladder = jax.lax.associative_scan(
        lambda x, y: limb.mul(x, y, FR), zb, axis=1
    )
    one = jnp.broadcast_to(FR.from_int(1), (R, 1, C.FR_LIMBS))
    tw = jnp.concatenate([one, ladder], axis=1)  # (R, Cc, L)
    if inverse:
        n_inv = FR.from_int(pow(n, -1, C.R_MOD))
        tw = limb.mul(tw, n_inv, FR)
    return limb.mul(a, tw, FR)


def _ntt_four_step(coeffs: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    """Single-device four-step NTT (same math as the mesh-sharded variant
    in parallel/ntt_sharded.py, with the all-to-all replaced by a local
    transpose): N = R x C; length-R column NTTs, twiddle by w_N^(k1*n2),
    transpose, length-C row NTTs; out[k1, k2] = X[k1 + R*k2]. Reuses the
    small batched-NTT programs instead of one 2 log N-stage monolith."""
    n = coeffs.shape[0]
    logn = n.bit_length() - 1
    R = 1 << (logn // 2)
    Cc = n // R
    x = coeffs.reshape(R, Cc, C.FR_LIMBS)
    a = ntt_batched(x, inverse)  # length-R NTTs down the columns
    # per-row twiddle bases w_N^{k1}
    w = root_of_unity(logn)
    if inverse:
        w = pow(w, -1, C.R_MOD)
    wbase = limb.powers(FR.from_int(w), FR, R)  # (R, L)
    a = _four_step_mid(a, wbase, R, Cc, n, inverse)
    a = jnp.moveaxis(a, 1, 0)  # transpose -> (C, R, L)
    a = ntt_batched(a, inverse)  # length-C NTTs
    # a[k2, k1] = X[k1 + R*k2]  ->  flatten in (k2, k1) order is in-order X
    return a.reshape(n, C.FR_LIMBS)


def ntt(coeffs: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """In-order NTT of (N, L) Montgomery coefficients, N a power of two."""
    n = coeffs.shape[0]
    assert n & (n - 1) == 0, "NTT size must be a power of two"
    if n == 1:
        return coeffs
    if n >= _FOUR_STEP_MIN:
        out = _ntt_four_step(coeffs, inverse)
        # 1/N is folded into the twiddle pass for the inverse
        return out
    out = _ntt_jit(coeffs, _twiddles(n, inverse), n, inverse)
    if inverse:
        n_inv = FR.from_int(pow(n, -1, C.R_MOD))
        out = limb.mul(out, n_inv, FR)
    return out


def poly_mul_ntt(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full product of coefficient arrays (Da, L) x (Db, L) -> (Da+Db-1, L)."""
    out_len = a.shape[0] + b.shape[0] - 1
    n = 1
    while n < out_len:
        n *= 2
    fa = ntt(jnp.pad(a, ((0, n - a.shape[0]), (0, 0))))
    fb = ntt(jnp.pad(b, ((0, n - b.shape[0]), (0, 0))))
    fc = limb.mul(fa, fb, FR)
    return ntt(fc, inverse=True)[:out_len]
