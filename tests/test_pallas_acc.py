"""Fused Pallas bucket-accumulate kernel vs the jnp dense scan (interpret
mode — bit-exact on CPU; the same kernel compiles natively on TPU).

Digits are synthetic with only a few windows: the kernel is agnostic to W
(it just consumes (K, T, W) digit grids), and interpret-mode execution
cost scales with W x T x the unrolled field formula, so small W keeps the
test fast while covering signs, collisions, bucket 0, and infinities.
"""
import jax
import jax.numpy as jnp
import numpy as np

from sonic_tpu import golden as gc
from sonic_tpu.curve.group import g1, Affine
from sonic_tpu.fields.limb import FQ
from sonic_tpu.msm import pippenger as pp
from sonic_tpu.msm.pallas_acc import (
    accumulate_batched_pallas,
    accumulate_pallas,
)


def _points(n, rng, inf_at=()):
    pts_host = [
        gc.g1_mul(gc.G1_GEN, int(rng.integers(2, 1 << 30))) for _ in range(n)
    ]
    inf = np.zeros(n, bool)
    for i in inf_at:
        inf[i] = True
    return Affine(
        FQ.from_int([p[0] for p in pts_host]),
        FQ.from_int([p[1] for p in pts_host]),
        jnp.asarray(inf),
    )


def test_pallas_accumulate_matches_dense():
    rng = np.random.default_rng(3)
    K, T, W, nb = 128, 2, 3, 9  # c=4 signed: buckets 0..8
    N = K * T
    pa = _points(N, rng, inf_at=(5, 200))
    pd = jnp.asarray(
        rng.integers(-8, 9, size=(K, T, W), dtype=np.int64), jnp.int32
    )
    pr = Affine(
        pa.x.reshape(K, T, -1), pa.y.reshape(K, T, -1), pa.inf.reshape(K, T)
    )
    ref = pp._accumulate_buckets_dense(g1, pr, pd, nb, True)
    got = accumulate_pallas(pr, pd, nb, interpret=True, wb=1, tb=2)
    for a, b in zip(ref, got):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_pallas_accumulate_batched_matches_dense():
    rng = np.random.default_rng(4)
    M, Kp, T, W, nb = 32, 4, 2, 2, 9
    N = Kp * T
    pa = _points(N, rng, inf_at=(1,))
    pd = jnp.asarray(
        rng.integers(-8, 9, size=(M, Kp, T, W), dtype=np.int64), jnp.int32
    )
    pr = Affine(
        pa.x.reshape(Kp, T, -1), pa.y.reshape(Kp, T, -1), pa.inf.reshape(Kp, T)
    )
    got = accumulate_batched_pallas(pr, pd, nb, interpret=True, wb=1, tb=2)
    ref = jax.vmap(
        lambda d: pp._accumulate_buckets_dense(g1, pr, d, nb, True)
    )(pd)
    for a, b in zip(ref, got):
        assert np.array_equal(np.asarray(a), np.asarray(b))
