"""Curve group ops vs the Python-int golden implementation."""
import jax.numpy as jnp
import numpy as np
import pytest

from sonic_tpu import golden
from sonic_tpu.curve.group import g1, g2, Affine, Jacobian
from sonic_tpu.fields import limb, ext
from sonic_tpu.fields.constants import R_MOD
from sonic_tpu.fields.limb import FQ, FR


def _g1_points(rng, n):
    ks = [rng.randrange(1, R_MOD) for _ in range(n)]
    return ks, [golden.g1_mul(golden.G1_GEN, k) for k in ks]


def _aff_g1(points):
    """Host affine (x,y)|None list -> device Affine batch."""
    xs = [p[0] if p else 0 for p in points]
    ys = [p[1] if p else 0 for p in points]
    infs = [p is None for p in points]
    return Affine(FQ.from_int(xs), FQ.from_int(ys), jnp.asarray(infs))


def _aff_g2(points):
    xs = [p[0] if p else (0, 0) for p in points]
    ys = [p[1] if p else (0, 0) for p in points]
    infs = [p is None for p in points]
    X = ext.make(
        FQ.from_int([x[0] for x in xs]), FQ.from_int([x[1] for x in xs])
    )
    Y = ext.make(
        FQ.from_int([y[0] for y in ys]), FQ.from_int([y[1] for y in ys])
    )
    return Affine(X, Y, jnp.asarray(infs))


def _g1_to_host(aff: Affine):
    xs = FQ.to_int(aff.x)
    ys = FQ.to_int(aff.y)
    infs = np.asarray(aff.inf)
    xs, ys, infs = np.atleast_1d(xs), np.atleast_1d(ys), np.atleast_1d(infs)
    return [None if i else (int(x), int(y)) for x, y, i in zip(xs, ys, infs)]


def _g2_to_host(aff: Affine):
    x0 = np.atleast_1d(FQ.to_int(ext.c0(aff.x)))
    x1 = np.atleast_1d(FQ.to_int(ext.c1(aff.x)))
    y0 = np.atleast_1d(FQ.to_int(ext.c0(aff.y)))
    y1 = np.atleast_1d(FQ.to_int(ext.c1(aff.y)))
    infs = np.atleast_1d(np.asarray(aff.inf))
    return [
        None if i else ((int(a), int(b)), (int(c), int(d)))
        for a, b, c, d, i in zip(x0, x1, y0, y1, infs)
    ]


def test_generators_on_curve():
    assert golden.g1_is_on_curve(golden.G1_GEN)
    assert golden.g2_is_on_curve(golden.G2_GEN)
    # device generators decode to the same constants
    ga = g1.generator()
    assert int(FQ.to_int(ga.x)) == golden.G1_GEN[0]
    gb = g2.generator()
    assert int(FQ.to_int(ext.c0(gb.x))) == golden.G2_GEN[0][0]


def test_g1_add_double_mixed(rng):
    ks, pts = _g1_points(rng, 6)
    # include infinity and equal/negated pairs in the batch
    pts_a = pts + [None, pts[0], pts[1]]
    pts_b = pts[::-1] + [pts[2], pts[0], golden.g1_neg(pts[1])]
    A = g1.from_affine(_aff_g1(pts_a))
    B = g1.from_affine(_aff_g1(pts_b))
    got = _g1_to_host(g1.to_affine(g1.add(A, B)))
    expect = [golden.g1_add(p, q) for p, q in zip(pts_a, pts_b)]
    assert got == expect

    got_dbl = _g1_to_host(g1.to_affine(g1.double(A)))
    expect_dbl = [golden.g1_add(p, p) for p in pts_a]
    assert got_dbl == expect_dbl

    got_mixed = _g1_to_host(g1.to_affine(g1.add_mixed(A, _aff_g1(pts_b))))
    assert got_mixed == expect


def test_g1_scalar_mul(rng):
    ks, pts = _g1_points(rng, 3)
    scalars = [rng.randrange(R_MOD) for _ in range(2)] + [0]
    P = g1.from_affine(_aff_g1(pts))
    S = FR.from_int(scalars, mont=False)
    got = _g1_to_host(g1.to_affine(g1.scalar_mul(P, S)))
    expect = [golden.g1_mul(p, s) for p, s in zip(pts, scalars)]
    assert got == expect


def test_g2_ops(rng):
    ks = [rng.randrange(1, R_MOD) for _ in range(3)]
    pts = [golden.g2_mul(golden.G2_GEN, k) for k in ks]
    A = g2.from_affine(_aff_g2(pts))
    B = g2.from_affine(_aff_g2(pts[::-1]))
    got = _g2_to_host(g2.to_affine(g2.add(A, B)))
    expect = [golden.g2_add(p, q) for p, q in zip(pts, pts[::-1])]
    assert got == expect

    s = rng.randrange(R_MOD)
    S = FR.from_int([s] * 3, mont=False)
    got_mul = _g2_to_host(g2.to_affine(g2.scalar_mul(A, S)))
    expect_mul = [golden.g2_mul(p, s) for p in pts]
    assert got_mul == expect_mul
