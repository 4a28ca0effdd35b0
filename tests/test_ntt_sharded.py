"""Four-step sharded NTT over 8 virtual devices == single-device NTT."""
import jax.numpy as jnp
import numpy as np
import pytest

from sonic_tpu.fields.constants import R_MOD
from sonic_tpu.fields.limb import FR
from sonic_tpu.parallel.mesh import make_mesh
from sonic_tpu.parallel.ntt_sharded import ntt_sharded, poly_mul_ntt_sharded
from sonic_tpu.poly.ntt import ntt, poly_mul_ntt


def _rand_coeffs(rng, n):
    return FR.from_int([rng.randrange(R_MOD) for _ in range(n)])


def test_ntt_sharded_matches_single(rng):
    n = 64
    mesh = make_mesh(8)
    a = _rand_coeffs(rng, n)
    got = np.asarray(ntt_sharded(a, mesh))
    want = np.asarray(ntt(a))
    assert (got == want).all()


def test_ntt_sharded_inverse_roundtrip(rng):
    n = 64
    mesh = make_mesh(8)
    a = _rand_coeffs(rng, n)
    fwd = ntt_sharded(a, mesh)
    back = np.asarray(ntt_sharded(jnp.asarray(fwd), mesh, inverse=True))
    assert (back == np.asarray(a)).all()


def test_poly_mul_sharded_matches(rng):
    mesh = make_mesh(8)
    da, db = 40, 30
    a = _rand_coeffs(rng, da)
    b = _rand_coeffs(rng, db)
    got = np.asarray(poly_mul_ntt_sharded(a, b, mesh))
    want = np.asarray(poly_mul_ntt(a, b))
    assert got.shape == want.shape
    assert (got == want).all()
