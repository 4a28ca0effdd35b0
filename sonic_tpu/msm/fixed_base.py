"""Fixed-base windowed scalar multiplication — SRS power-table generation.

The SRS is 4 tables of s_i * G for ONE base G and 2d+1 scalars each
(SRS.hs:33-41). A shared base makes Pippenger the wrong tool; instead,
precompute the classic fixed-base window table

    T[w][j] = (j * 2^(c*w)) * G      w < W = ceil(bits/c),  j < 2^c

once per base (a few hundred tiny group ops), then every output point is
just W gathered mixed-adds:

    s * G = sum_w T[w][digit_w(s)]

batched over all 2d+1 scalars — ~32 batched adds per point at c=8 versus
~510 ops for the generic 255-step double-and-add ladder the generator
previously ran. The digit-0 column holds the point at infinity, absorbed
by add_mixed, so zero digits need no masking.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..curve.group import GroupOps, Jacobian, Affine
from .pippenger import _digits

DEFAULT_C = 8

_TABLE_CACHE: dict = {}


@partial(jax.jit, static_argnums=(0, 2, 3))
def _build_table(group: GroupOps, gen: Affine, c: int, W: int) -> Jacobian:
    """(W, 2^c) Jacobian table: row 0 is j*G by a running-sum scan; each
    next row is the previous doubled c times (one batched double chain)."""
    B = 1 << c

    def add_step(acc, _):
        out = acc
        nxt = group.add_mixed(acc, gen)
        return nxt, out

    _, t0 = jax.lax.scan(add_step, group.infinity(()), None, length=B)

    def row_step(row, _):
        def dbl(r, _):
            return group.double(r), None

        nxt, _ = jax.lax.scan(dbl, row, None, length=c)
        return nxt, row

    _, rows = jax.lax.scan(row_step, Jacobian(*t0), None, length=W)
    return Jacobian(*rows)  # (W, B)


def _table(group: GroupOps, c: int, nbits: int) -> Affine:
    """Affine window table for the group generator (host-cached; never
    cached under a trace — cf. poly/ntt._twiddles)."""
    W = (nbits + c - 1) // c
    key = (group.name, c, W)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    gen = group.generator()
    tab = group.to_affine(_build_table(group, gen, c, W))
    if not isinstance(tab.x, jax.core.Tracer):
        _TABLE_CACHE[key] = tab
    return tab


@partial(jax.jit, static_argnums=0)
def _apply_table(group: GroupOps, table: Affine, digits: jnp.ndarray):
    """table (W, B, ...), digits (N, W) -> Jacobian (N,): scan over the W
    windows, each step one batched gathered mixed-add."""
    N = digits.shape[0]

    def step(acc, xs):
        tx, ty, tinf, dig = xs  # (B, ...), (B,), (N,)
        q = Affine(tx[dig], ty[dig], tinf[dig])
        return group.add_mixed(acc, q), None

    acc = group.infinity((N,))
    xs = (table.x, table.y, table.inf, jnp.moveaxis(digits, 1, 0))
    acc, _ = jax.lax.scan(step, acc, xs)
    return acc


def fixed_base_mul(
    group: GroupOps,
    scalars_std: jnp.ndarray,
    c: int = DEFAULT_C,
    max_chunk: int = 1 << 16,
) -> Jacobian:
    """scalars (N, L) standard-form limbs -> (N,) Jacobian batch of
    s_i * generator.

    N pads to a power of two (>= 256) so _apply_table compiles per
    size-class, not per exact size (SRS tables are 2d+1 — always odd).
    Above `max_chunk` rows the batch splits into max_chunk-row chunks
    sharing ONE compiled program: a config-3-scale SRS table (2d+1 ~ 2^20
    rows) otherwise lowers a fresh giant program whose remote compile
    dwarfs — and on the tunnel service, sometimes outright hangs — the
    actual device work."""
    from ..fields import constants as C

    n = scalars_std.shape[0]
    if n > max_chunk:
        outs = [
            fixed_base_mul(group, scalars_std[i : i + max_chunk], c, max_chunk)
            for i in range(0, n, max_chunk)
        ]
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *outs)
    n_pad = 256
    while n_pad < n:
        n_pad *= 2
    if n_pad != n:
        scalars_std = jnp.pad(scalars_std, ((0, n_pad - n), (0, 0)))
    nbits = scalars_std.shape[-1] * C.LIMB_BITS
    tab = _table(group, c, nbits)
    digs = _digits(scalars_std, c).astype(jnp.int32)
    out = _apply_table(group, tab, digs)
    if n_pad != n:
        out = jax.tree.map(lambda a: a[:n], out)
    return out
