"""Multi-device NTT — four-step (transpose) algorithm over a mesh.

Replaces the reference's serial sparse polynomial multiply (the tPoly hot
loop, Constraints.hs:61 / SURVEY.md §3.5 item 2) at scales beyond one
chip's HBM. Decompose N = R x C and view the coefficient vector as an
(R, C) matrix (row-major):

  step 1  length-R NTTs over the R axis    -- sharded on C: local compute
  step 2  twiddle scaling by w_N^(k1*n2)   -- elementwise, local
  step 3  reshard C-sharded -> R-sharded   -- ONE all-to-all over the mesh
  step 4  length-C NTTs over the C axis    -- local compute
  output  X[k1 + R*k2] = out[k1, k2]       -- digit-reversed (R, C) layout

The all-to-all is the only communication; its volume is exactly the array
once (optimal for a transpose), riding ICI within a slice. Inverse applies
the same steps with w^-1 and folds the 1/N scaling into the twiddle pass.

The sharded product keeps everything mesh-resident: forward (2x), pointwise
multiply (local), inverse (1x) — no gathers between stages.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..fields import constants as C
from ..fields import limb
from ..fields.limb import FR
from ..poly import ntt as base

_WN_CACHE: dict = {}


def _wn_table(n: int, inverse: bool) -> jnp.ndarray:
    """(N, L) Montgomery ladder of w_N^0..w_N^(N-1) (host-cached).

    Tracers are never cached (same hazard as poly/ntt._twiddles: a ladder
    traced inside shard_map must not escape into untraced callers)."""
    key = (n, inverse)
    cached = _WN_CACHE.get(key)
    if cached is not None:
        return cached
    w = base.root_of_unity(n.bit_length() - 1)
    if inverse:
        w = pow(w, -1, C.R_MOD)
    tab = limb.powers(FR.from_int(w), FR, n)
    if not isinstance(tab, jax.core.Tracer):
        _WN_CACHE[key] = tab
    return tab


def splittable(out_len: int, ndev: int) -> bool:
    """Whether the 4-step decomposition N = R x C (N = next pow2 >=
    out_len) admits ndev | R and ndev | C."""
    n = 1
    while n < out_len:
        n *= 2
    logn = n.bit_length() - 1
    r = 1 << (logn // 2)
    c = n // r
    return r % ndev == 0 and c % ndev == 0


def _split_rc(n: int, ndev: int) -> tuple[int, int]:
    """N = R*C with ndev | R and ndev | C (both power-of-two)."""
    logn = n.bit_length() - 1
    r = 1 << (logn // 2)
    c = n // r
    assert r % ndev == 0 and c % ndev == 0, (
        f"N={n} too small to 4-step shard over {ndev} devices"
    )
    return r, c


def _ntt_4step_local(x, wn, axis_name: str, R: int, Cc: int, inverse: bool):
    """shard_map body: x (R, C/D, L) sharded on axis 1 -> (R/D, C, L)
    sharded on axis 0, holding out[k1, k2] = X[k1 + R*k2]."""
    ndev = jax.lax.psum(1, axis_name)
    me = jax.lax.axis_index(axis_name)
    c_loc = Cc // ndev
    n = R * Cc

    # step 1: length-R NTT per column (local)
    a = base.ntt_batched(x, inverse)  # (R, c_loc, L)

    # step 2: twiddle w_N^(k1 * n2_global); fold in 1/N for the inverse
    k1 = np.arange(R)[:, None]
    j = jnp.arange(c_loc)[None, :] + me * c_loc  # global n2
    tidx = (k1 * j) % n  # (R, c_loc) int
    tw = wn[tidx]  # (R, c_loc, L)
    if inverse:
        n_inv = FR.from_int(pow(n, -1, C.R_MOD))
        tw = limb.mul(tw, n_inv, FR)
    a = limb.mul(a, tw, FR)

    # step 3: reshard rows: split axis 0 into D chunks, concat received
    # chunks along axis 1 — the transpose all-to-all
    a = jax.lax.all_to_all(a, axis_name, split_axis=0, concat_axis=1, tiled=True)
    # now (R/D, C, L) with rows me*R/D ..

    # step 4: length-C NTT per row (local)
    a = jnp.moveaxis(a, 1, 0)  # (C, R/D, L)
    a = base.ntt_batched(a, inverse)
    return jnp.moveaxis(a, 0, 1)  # (R/D, C, L)


def ntt_sharded(
    coeffs: jnp.ndarray,
    mesh: Mesh,
    inverse: bool = False,
    axis: str = "shard",
) -> jnp.ndarray:
    """In-order NTT of (N, L) with the heavy stages mesh-parallel.

    Returns the transformed (N, L) array (final digit-reversal transpose is
    left to XLA's sharding propagation as a second, implicit all-to-all).
    """
    n = coeffs.shape[0]
    assert n & (n - 1) == 0
    ndev = mesh.devices.size
    R, Cc = _split_rc(n, ndev)
    wn = _wn_table(n, inverse)

    x = coeffs.reshape(R, Cc, C.FR_LIMBS)
    x = jax.device_put(x, NamedSharding(mesh, P(None, axis, None)))
    wn_rep = jax.device_put(wn, NamedSharding(mesh, P(None, None)))

    fn = shard_map(
        partial(_ntt_4step_local, axis_name=axis, R=R, Cc=Cc, inverse=inverse),
        mesh=mesh,
        in_specs=(P(None, axis, None), P(None, None)),
        out_specs=P(axis, None, None),
    )
    out = fn(x, wn_rep)  # (R, C, L), out[k1, k2] = X[k1 + R*k2]
    return jnp.moveaxis(out, 0, 1).reshape(n, C.FR_LIMBS)


def poly_mul_ntt_sharded(
    a: jnp.ndarray, b: jnp.ndarray, mesh: Mesh, axis: str = "shard"
) -> jnp.ndarray:
    """Full product of (Da, L) x (Db, L) -> (Da+Db-1, L), NTT stages and the
    pointwise product all mesh-parallel."""
    out_len = a.shape[0] + b.shape[0] - 1
    n = 1
    while n < out_len:
        n *= 2
    fa = ntt_sharded(jnp.pad(a, ((0, n - a.shape[0]), (0, 0))), mesh, axis=axis)
    fb = ntt_sharded(jnp.pad(b, ((0, n - b.shape[0]), (0, 0))), mesh, axis=axis)
    spec = NamedSharding(mesh, P(axis, None))
    fc = limb.mul(
        jax.device_put(fa, spec), jax.device_put(fb, spec), FR
    )
    return ntt_sharded(fc, mesh, inverse=True, axis=axis)[:out_len]
