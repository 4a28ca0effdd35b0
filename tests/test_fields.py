"""Golden tests: limb-array field arithmetic vs Python int (the role GMP
plays in the reference — SURVEY.md §2.3 galois-field row)."""
import numpy as np
import jax.numpy as jnp
import pytest

from sonic_tpu.fields import limb
from sonic_tpu.fields.constants import R_MOD, Q_MOD

SPECS = [(limb.FR, R_MOD), (limb.FQ, Q_MOD)]


def _rand_elems(rng, mod, n):
    return [rng.randrange(mod) for _ in range(n)]


@pytest.mark.parametrize("spec,mod", SPECS, ids=["Fr", "Fq"])
def test_roundtrip(rng, spec, mod):
    vals = _rand_elems(rng, mod, 8) + [0, 1, mod - 1]
    arr = spec.from_int(vals)
    back = spec.to_int(arr)
    assert list(back) == vals


@pytest.mark.parametrize("spec,mod", SPECS, ids=["Fr", "Fq"])
def test_add_sub_neg(rng, spec, mod):
    a = _rand_elems(rng, mod, 16)
    b = _rand_elems(rng, mod, 16)
    A, B = spec.from_int(a), spec.from_int(b)
    assert list(spec.to_int(limb.add(A, B, spec))) == [(x + y) % mod for x, y in zip(a, b)]
    assert list(spec.to_int(limb.sub(A, B, spec))) == [(x - y) % mod for x, y in zip(a, b)]
    assert list(spec.to_int(limb.neg(A, spec))) == [(-x) % mod for x in a]


@pytest.mark.parametrize("spec,mod", SPECS, ids=["Fr", "Fq"])
def test_mul(rng, spec, mod):
    a = _rand_elems(rng, mod, 32) + [0, 1, mod - 1, mod - 1]
    b = _rand_elems(rng, mod, 32) + [mod - 1, mod - 1, mod - 1, 0]
    A, B = spec.from_int(a), spec.from_int(b)
    got = list(spec.to_int(limb.mul(A, B, spec)))
    assert got == [(x * y) % mod for x, y in zip(a, b)]


@pytest.mark.parametrize("spec,mod", SPECS, ids=["Fr", "Fq"])
def test_mul_small(rng, spec, mod):
    a = _rand_elems(rng, mod, 8)
    A = spec.from_int(a)
    for k in (0, 1, 2, 3, 4, 8, 12):
        got = list(map(int, np.atleast_1d(spec.to_int(limb.mul_small(A, k, spec)))))
        assert got == [(x * k) % mod for x in a], f"k={k}"


@pytest.mark.parametrize("spec,mod", SPECS, ids=["Fr", "Fq"])
def test_inv(rng, spec, mod):
    a = _rand_elems(rng, mod - 1, 6)
    a = [x + 1 for x in a]  # nonzero
    A = spec.from_int(a)
    got = list(spec.to_int(limb.inv(A, spec)))
    assert got == [pow(x, -1, mod) for x in a]
    # zero maps to zero
    z = limb.inv(spec.from_int([0]), spec)
    assert list(spec.to_int(z)) == [0]


@pytest.mark.parametrize("spec,mod", SPECS, ids=["Fr", "Fq"])
def test_batch_inv(rng, spec, mod):
    a = _rand_elems(rng, mod - 1, 7)
    a = [x + 1 for x in a] + [0]  # include a zero lane
    A = spec.from_int(a)
    got = list(spec.to_int(limb.batch_inv(A, spec)))
    expect = [pow(x, -1, mod) if x else 0 for x in a]
    assert got == expect


@pytest.mark.parametrize("spec,mod", SPECS, ids=["Fr", "Fq"])
def test_pow_fixed(rng, spec, mod):
    a = _rand_elems(rng, mod, 4)
    A = spec.from_int(a)
    for e in (0, 1, 2, 5, 65537):
        got = list(map(int, np.atleast_1d(spec.to_int(limb.pow_fixed(A, e, spec)))))
        assert got == [pow(x, e, mod) for x in a], f"e={e}"


@pytest.mark.parametrize("spec,mod", SPECS, ids=["Fr", "Fq"])
def test_mont_roundtrip(rng, spec, mod):
    a = _rand_elems(rng, mod, 8)
    raw = spec.from_int(a, mont=False)
    m = limb.to_mont(raw, spec)
    back = limb.from_mont(m, spec)
    assert list(spec.to_int(back, mont=False)) == a


@pytest.mark.parametrize("spec,mod", SPECS, ids=["Fr", "Fq"])
def test_pallas_mont_mul_bit_exact(rng, spec, mod):
    """Interpret-mode run of the Pallas Montgomery kernel vs the jnp limb
    path — the kernel's column-direct convolution must stay bit-identical
    to limb._mul_lm (same column arithmetic, reordered sums)."""
    from sonic_tpu.fields.pallas_mul import mont_mul

    n = 700  # > one PANEL, non-multiple: exercises padding
    a = _rand_elems(rng, mod, n - 3) + [0, 1, mod - 1]
    b = _rand_elems(rng, mod, n - 3) + [mod - 1, 0, mod - 1]
    A, B = spec.from_int(a), spec.from_int(b)
    # Oracle pinned to the jnp limb path directly: limb.mul itself
    # dispatches to this same Pallas kernel at batch >= MIN_BATCH when
    # SONIC_TPU_PALLAS=1 / on TPU, which would make the comparison
    # kernel-vs-itself exactly in the configs that matter (ADVICE r4).
    want = limb._from_lm(limb._mul_lm(limb._to_lm(A), limb._to_lm(B), spec))
    got = mont_mul(A, B, spec, interpret=True)
    assert np.array_equal(np.asarray(want), np.asarray(got))
