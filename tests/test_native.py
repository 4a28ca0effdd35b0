"""Native C++ pairing vs Python tower."""
import pytest

from sonic_tpu import golden
from sonic_tpu.native import pairing_product_is_one_native, get_lib
from sonic_tpu.pairing import host as pr
from sonic_tpu.fields.constants import R_MOD

needs_native = pytest.mark.skipif(
    get_lib() is None, reason="native library not built"
)


@needs_native
def test_native_cancel_pair(rng):
    a = rng.randrange(1, R_MOD)
    P = golden.g1_mul(golden.G1_GEN, a)
    Q = golden.G2_GEN
    assert pairing_product_is_one_native(
        [(P, Q), (golden.g1_neg(P), Q)]
    )
    assert not pairing_product_is_one_native([(P, Q)])


@needs_native
def test_native_matches_python_bilinear(rng):
    a = rng.randrange(1, R_MOD)
    b = rng.randrange(1, R_MOD)
    # e(aG, bH) * e(-abG, H) == 1
    P = golden.g1_mul(golden.G1_GEN, a)
    Q = golden.g2_mul(golden.G2_GEN, b)
    nab = golden.g1_neg(golden.g1_mul(golden.G1_GEN, a * b % R_MOD))
    pairs = [(P, Q), (nab, golden.G2_GEN)]
    assert pairing_product_is_one_native(pairs)
    assert pr.pairing_product(pairs) == pr.FQ12_ONE


@needs_native
def test_native_infinity_handling():
    assert pairing_product_is_one_native([(None, golden.G2_GEN)])
    assert pairing_product_is_one_native([(golden.G1_GEN, None)])


@needs_native
def test_native_gt_matches_python(rng):
    """Full GT value (post final-exp) is bit-identical between the C++ and
    Python towers — both implement the same x-chain exponentiation."""
    import ctypes

    import numpy as np

    lib = get_lib()
    lib.sonic_pairing_gt.argtypes = [ctypes.POINTER(ctypes.c_uint64)] * 3
    a = rng.randrange(1, R_MOD)
    b = rng.randrange(1, R_MOD)
    P = golden.g1_mul(golden.G1_GEN, a)
    Q = golden.g2_mul(golden.G2_GEN, b)

    def words(v):
        return [(v >> (64 * i)) & ((1 << 64) - 1) for i in range(6)]

    g1v = np.array(words(P[0]) + words(P[1]), np.uint64)
    (x0, x1), (y0, y1) = Q
    g2v = np.array(words(x0) + words(x1) + words(y0) + words(y1), np.uint64)
    out = np.zeros(72, np.uint64)
    lib.sonic_pairing_gt(
        g1v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        g2v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )

    def unwords(ws):
        return sum(int(w) << (64 * i) for i, w in enumerate(ws))

    native_gt = [
        (unwords(out[i * 12 : i * 12 + 6]), unwords(out[i * 12 + 6 : i * 12 + 12]))
        for i in range(6)
    ]
    e_py = pr.pairing(P, Q)
    assert native_gt == [tuple(c) for part in e_py for c in part]


@needs_native
def test_native_g1_msm_matches_golden(rng):
    from sonic_tpu.native import g1_msm_native

    pts = [
        golden.g1_mul(golden.G1_GEN, rng.randrange(1, R_MOD)) for _ in range(17)
    ]
    pts[3] = None
    scs = [rng.randrange(0, R_MOD) for _ in range(17)]
    scs[5] = 0
    assert g1_msm_native(pts, scs) == golden.g1_msm(pts, scs)
    # all-zero / all-infinity edge
    assert g1_msm_native([None, pts[0]], [5, 0]) is None
