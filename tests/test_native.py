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
