"""Host pairing: structural self-tests (bilinearity, non-degeneracy)."""
from sonic_tpu import golden
from sonic_tpu.pairing import host as pairing
from sonic_tpu.fields.constants import R_MOD


def test_untwist_on_curve():
    X, Y = pairing.untwist(golden.G2_GEN)
    lhs = pairing.fq12_mul(Y, Y)
    rhs = pairing.fq12_add(
        pairing.fq12_mul(pairing.fq12_mul(X, X), X), pairing.fq12_from_fq(4)
    )
    assert lhs == rhs


def test_bilinearity(rng):
    a = rng.randrange(1, R_MOD)
    b = rng.randrange(1, R_MOD)
    P = golden.g1_mul(golden.G1_GEN, a)
    Q = golden.g2_mul(golden.G2_GEN, b)
    e_ab = pairing.pairing(P, Q)
    e_base = pairing.pairing(golden.G1_GEN, golden.G2_GEN)
    assert e_base != pairing.FQ12_ONE  # non-degeneracy
    assert e_ab == pairing.fq12_pow(e_base, a * b % R_MOD)
    # e(P1+P1', Q) = e(P1,Q) e(P1',Q)
    P2 = golden.g1_mul(golden.G1_GEN, 7)
    lhs = pairing.pairing(golden.g1_add(P, P2), Q)
    rhs = pairing.fq12_mul(pairing.pairing(P, Q), pairing.pairing(P2, Q))
    assert lhs == rhs


def test_pairing_infinity():
    assert pairing.pairing(None, golden.G2_GEN) == pairing.FQ12_ONE
    assert pairing.pairing(golden.G1_GEN, None) == pairing.FQ12_ONE


def test_pairing_product(rng):
    a = rng.randrange(1, R_MOD)
    P = golden.g1_mul(golden.G1_GEN, a)
    Q = golden.G2_GEN
    # e(P,Q) * e(-P,Q) == 1
    prod = pairing.pairing_product([(P, Q), (golden.g1_neg(P), Q)])
    assert prod == pairing.FQ12_ONE


def test_fast_final_exp_vs_generic(rng):
    """The x-chain final exponentiation computes the standard cube of the
    generic (q^12-1)/r power — same GT subgroup, bijective map."""
    a = rng.randrange(1, R_MOD)
    P = golden.g1_mul(golden.G1_GEN, a)
    f = pairing.miller_loop_generic(P, golden.G2_GEN)
    fast = pairing.final_exponentiation(f)
    slow = pairing.final_exponentiation_generic(f)
    assert fast == pairing.fq12_pow(slow, 3)


def test_fast_miller_vs_generic(rng):
    """Twist-resident Miller loop agrees with the untwisted affine oracle
    after final exponentiation (pre-FE values differ by subfield factors
    the exponentiation kills)."""
    a = rng.randrange(1, R_MOD)
    b = rng.randrange(1, R_MOD)
    P = golden.g1_mul(golden.G1_GEN, a)
    Q = golden.g2_mul(golden.G2_GEN, b)
    f_fast = pairing.miller_loop(P, Q)
    f_gen = pairing.miller_loop_generic(P, Q)
    assert pairing.final_exponentiation(f_fast) == pairing.final_exponentiation(
        f_gen
    )


def test_frobenius_is_qth_power(rng):
    a = rng.randrange(1, R_MOD)
    P = golden.g1_mul(golden.G1_GEN, a)
    f = pairing.miller_loop(P, golden.G2_GEN)
    from sonic_tpu.fields.constants import Q_MOD

    assert pairing.fq12_frob(f) == pairing.fq12_pow(f, Q_MOD)


def test_cyclotomic_square_in_subgroup(rng):
    a = rng.randrange(1, R_MOD)
    P = golden.g1_mul(golden.G1_GEN, a)
    e = pairing.pairing(P, golden.G2_GEN)  # in the order-r GT subgroup
    assert pairing.fq12_cyc_sqr(e) == pairing.fq12_mul(e, e)
