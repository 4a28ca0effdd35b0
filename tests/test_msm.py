"""MSM (Pippenger) vs the golden serial MSM."""
import jax.numpy as jnp
import numpy as np

from sonic_tpu import golden
from sonic_tpu.curve.group import g1
from sonic_tpu.msm.pippenger import msm_g1
from sonic_tpu.fields.constants import R_MOD
from sonic_tpu.fields.limb import FQ, FR
from tests.test_curve import _aff_g1, _g1_to_host


def test_msm_small(rng):
    n = 13
    ks = [rng.randrange(1, R_MOD) for _ in range(n)]
    pts = [golden.g1_mul(golden.G1_GEN, k) for k in ks]
    scalars = [rng.randrange(R_MOD) for _ in range(n - 2)] + [0, 1]
    P = _aff_g1(pts)
    S = FR.from_int(scalars, mont=False)
    res = msm_g1(P, S, 4, 4)
    got = _g1_to_host(g1.to_affine(res))[0]
    expect = golden.g1_msm(pts, scalars)
    assert got == expect


def test_msm_with_infinity_and_lanes(rng):
    n = 13
    ks = [rng.randrange(1, R_MOD) for _ in range(n)]
    pts = [golden.g1_mul(golden.G1_GEN, k) for k in ks]
    pts[3] = None  # infinity in the batch
    scalars = [rng.randrange(R_MOD) for _ in range(n)]
    P = _aff_g1(pts)
    S = FR.from_int(scalars, mont=False)
    got = _g1_to_host(g1.to_affine(msm_g1(P, S, 4, 4)))[0]
    expect = golden.g1_msm(pts, scalars)
    assert got == expect
