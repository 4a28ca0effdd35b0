"""Numerical sanitizer: canonical-form assertions over device arrays."""
import numpy as np
import pytest

from sonic_tpu.fields import limb
from sonic_tpu.fields.limb import FQ, FR
from sonic_tpu.utils.sanitize import assert_canonical


def test_canonical_ok():
    a = FR.from_int([1, 2, FR.modulus - 1])
    assert_canonical(a, FR)
    b = limb.mul(a, a, FR)
    assert_canonical(b, FR, "product")


def test_rejects_oversized_limb():
    bad = np.zeros((1, FR.nlimbs), np.uint32)
    bad[0, 0] = 1 << 20  # limb >= 2^16
    with pytest.raises(AssertionError, match="non-canonical limb"):
        assert_canonical(bad, FR)


def test_rejects_value_above_modulus():
    from sonic_tpu.fields import constants as C

    bad = np.array([C.int_to_limbs(FQ.modulus, FQ.nlimbs)], np.uint32)
    with pytest.raises(AssertionError, match="modulus"):
        assert_canonical(bad, FQ)


def test_rejects_wrong_limb_count():
    bad = np.zeros((2, 7), np.uint32)
    with pytest.raises(AssertionError, match="limb axis"):
        assert_canonical(bad, FR)
