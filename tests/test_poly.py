"""Dense Laurent + NTT vs golden sparse polynomial arithmetic."""
import jax.numpy as jnp
import numpy as np
import pytest

from sonic_tpu import golden_protocol as gp
from sonic_tpu.fields.constants import R_MOD
from sonic_tpu.fields.limb import FR
from sonic_tpu.poly import laurent, ntt


def _rand_poly(rng, lo, hi, density=1.0):
    terms = {}
    for e in range(lo, hi + 1):
        if rng.random() <= density:
            terms[e] = rng.randrange(R_MOD)
    if not terms:
        terms[lo] = 1
    return terms


def test_add_mul_eval(rng):
    f = _rand_poly(rng, -5, 7)
    g = _rand_poly(rng, -3, 4)
    F = laurent.Laurent.from_terms(f)
    G = laurent.Laurent.from_terms(g)
    assert laurent.add(F, G).to_terms() == gp.lp_add(f, g)
    assert laurent.mul(F, G).to_terms() == gp.lp_mul(f, g)
    z = rng.randrange(1, R_MOD)
    got = int(FR.to_int(laurent.evaluate(F, FR.from_int(z))))
    assert got == gp.lp_eval(f, z)


def test_div_by_linear(rng):
    f = _rand_poly(rng, -4, 9)
    z = rng.randrange(1, R_MOD)
    F = laurent.Laurent.from_terms(f)
    fz, W = laurent.div_by_linear(F, FR.from_int(z))
    assert int(FR.to_int(fz)) == gp.lp_eval(f, z)
    assert W.to_terms() == gp.lp_div_linear(f, z)


def test_ntt_roundtrip(rng):
    n = 16
    coeffs = [rng.randrange(R_MOD) for _ in range(n)]
    A = FR.from_int(coeffs)
    back = ntt.ntt(ntt.ntt(A), inverse=True)
    assert list(FR.to_int(back)) == coeffs


def test_ntt_mul_matches_schoolbook(rng):
    fa = {i: rng.randrange(R_MOD) for i in range(40)}
    fb = {i: rng.randrange(R_MOD) for i in range(70)}
    A = laurent.Laurent.from_terms(fa)
    B = laurent.Laurent.from_terms(fb)
    got = laurent.Laurent(0, ntt.poly_mul_ntt(A.coeffs, B.coeffs)).to_terms()
    assert got == gp.lp_mul(fa, fb)


def test_root_of_unity():
    w = ntt.root_of_unity(5)
    assert pow(w, 32, R_MOD) == 1
    assert pow(w, 16, R_MOD) != 1
