// BLS12-381 optimal ate pairing — native host implementation.
//
// Plays the role GMP plays in the reference stack (the only native code in
// sdiehl/sonic's dependency tree is GHC Integer/GMP inside galois-field —
// SURVEY.md §2.3): fast host bignum for the verifier's pairing checks
// (reference src/Sonic/CommitmentScheme.hs:51-68 does 3 pairings per pcV).
//
// Algorithms (mirrors sonic_tpu/pairing/host.py fast path exactly):
//   Fq:   6x64-bit limbs, Montgomery form (R = 2^384), CIOS multiply
//   Fq2 = Fq[u]/(u^2+1); Fq6 = Fq2[v]/(v^3 - (u+1)); Fq12 = Fq6[w]/(w^2 - v)
//   Miller loop: twist-resident Jacobian coords on E'(Fq2) with sparse
//     (014) line multiplication (eprint 2010/354 Alg. 26/27 adaptation) —
//     no Fq12 inversions in the loop.
//   Final exponentiation: easy part via conjugate/inverse/Frobenius^2, hard
//     part via the BLS x-chain with Granger–Scott cyclotomic squarings
//     (computes the standard 3*(q^4-q^2+1)/r multiple; bijective on GT).
//
// C ABI (see sonic_tpu/native.py):
//   sonic_pairing_product_is_one(g1_xy[ n*12 u64 ], g1_inf[n],
//                                g2_xy[ n*24 u64 ], g2_inf[n], n) -> 1/0
//   sonic_pairing_gt(g1_xy[12], g2_xy[24], out[72]) — canonical GT bytes
//     (standard-form limbs) for cross-checking vs the Python tower.

#include <cstdint>
#include <cstring>

typedef unsigned __int128 u128;
typedef uint64_t u64;

static const u64 Q[6] = {0xb9feffffffffaaabULL, 0x1eabfffeb153ffffULL,
                         0x6730d2a0f6b0f624ULL, 0x64774b84f38512bfULL,
                         0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL};
static const u64 R2[6] = {0xf4df1f341c341746ULL, 0x0a76e6a609d104f1ULL,
                          0x8de5476c4c95b6d5ULL, 0x67eb88a9939d83c0ULL,
                          0x9a793e85b519952dULL, 0x11988fe592cae3aaULL};
static const u64 N0INV = 0x89f3fffcfffcfffdULL;
static const u64 ONE_M[6] = {0x760900000002fffdULL, 0xebf4000bc40c0002ULL,
                             0x5f48985753c758baULL, 0x77ce585370525745ULL,
                             0x5c071a97a256ec6dULL, 0x15f65ec3fa80e493ULL};
static const u64 BLS_X = 0xd201000000010000ULL;  // |t|; t < 0

struct Fp {
  u64 l[6];
};

static inline bool fp_is_zero(const Fp &a) {
  u64 r = 0;
  for (int i = 0; i < 6; i++) r |= a.l[i];
  return r == 0;
}

static inline void fp_sub_raw(Fp &r, const Fp &a, const u64 *b) {
  u128 borrow = 0;
  for (int i = 0; i < 6; i++) {
    u128 d = (u128)a.l[i] - b[i] - borrow;
    r.l[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
}

static inline void fp_add(Fp &r, const Fp &a, const Fp &b) {
  u128 carry = 0;
  for (int i = 0; i < 6; i++) {
    u128 s = (u128)a.l[i] + b.l[i] + carry;
    r.l[i] = (u64)s;
    carry = s >> 64;
  }
  // r < 2q < 2^385; subtract q if >= q (2q < 2^384 so no carry out)
  Fp t;
  u128 borrow = 0;
  for (int i = 0; i < 6; i++) {
    u128 d = (u128)r.l[i] - Q[i] - borrow;
    t.l[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
  if (!borrow) r = t;
}

static inline void fp_sub(Fp &r, const Fp &a, const Fp &b) {
  u128 borrow = 0;
  for (int i = 0; i < 6; i++) {
    u128 d = (u128)a.l[i] - b.l[i] - borrow;
    r.l[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
  if (borrow) {
    u128 carry = 0;
    for (int i = 0; i < 6; i++) {
      u128 s = (u128)r.l[i] + Q[i] + carry;
      r.l[i] = (u64)s;
      carry = s >> 64;
    }
  }
}

static inline void fp_neg(Fp &r, const Fp &a) {
  if (fp_is_zero(a)) {
    r = a;
    return;
  }
  u128 borrow = 0;
  for (int i = 0; i < 6; i++) {
    u128 d = (u128)Q[i] - a.l[i] - borrow;
    r.l[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
}

// Montgomery CIOS multiply: r = a*b*R^-1 mod q
static void fp_mul(Fp &r, const Fp &a, const Fp &b) {
  u64 t[8] = {0};
  for (int i = 0; i < 6; i++) {
    u128 carry = 0;
    for (int j = 0; j < 6; j++) {
      u128 cur = (u128)t[j] + (u128)a.l[i] * b.l[j] + carry;
      t[j] = (u64)cur;
      carry = cur >> 64;
    }
    u128 s = (u128)t[6] + carry;
    t[6] = (u64)s;
    t[7] = (u64)(s >> 64);

    u64 m = t[0] * N0INV;
    carry = 0;
    u128 cur = (u128)t[0] + (u128)m * Q[0];
    carry = cur >> 64;
    for (int j = 1; j < 6; j++) {
      cur = (u128)t[j] + (u128)m * Q[j] + carry;
      t[j - 1] = (u64)cur;
      carry = cur >> 64;
    }
    s = (u128)t[6] + carry;
    t[5] = (u64)s;
    s = (u128)t[7] + (s >> 64);
    t[6] = (u64)s;
    t[7] = 0;
  }
  for (int i = 0; i < 6; i++) r.l[i] = t[i];
  if (t[6]) {
    Fp tmp;
    fp_sub_raw(tmp, r, Q);
    r = tmp;
  } else {
    Fp tmp;
    u128 borrow = 0;
    for (int i = 0; i < 6; i++) {
      u128 d = (u128)r.l[i] - Q[i] - borrow;
      tmp.l[i] = (u64)d;
      borrow = (d >> 64) ? 1 : 0;
    }
    if (!borrow) r = tmp;
  }
}

static inline void fp_sqr(Fp &r, const Fp &a) { fp_mul(r, a, a); }

static void fp_pow_words(Fp &r, const Fp &a, const u64 *e, int nbits) {
  Fp base = a, acc;
  memcpy(acc.l, ONE_M, sizeof(acc.l));
  for (int i = 0; i < nbits; i++) {
    if ((e[i / 64] >> (i % 64)) & 1) fp_mul(acc, acc, base);
    fp_sqr(base, base);
  }
  r = acc;
}

// q - 2 for Fermat inversion
static void fp_inv(Fp &r, const Fp &a) {
  u64 e[6];
  memcpy(e, Q, sizeof(e));
  u128 borrow = 2;
  for (int i = 0; i < 6; i++) {
    u128 d = (u128)e[i] - (u64)borrow;
    borrow = (d >> 64) ? 1 : 0;
    e[i] = (u64)d;
    if (!borrow) break;
  }
  fp_pow_words(r, a, e, 381);
}

static void fp_from_std(Fp &r, const u64 *std_le) {
  Fp tmp;
  memcpy(tmp.l, std_le, 6 * sizeof(u64));
  Fp r2;
  memcpy(r2.l, R2, sizeof(r2.l));
  fp_mul(r, tmp, r2);
}

// Montgomery -> standard form: multiply by 1
static void fp_to_std(u64 *out, const Fp &a) {
  Fp one_raw;
  memset(one_raw.l, 0, sizeof(one_raw.l));
  one_raw.l[0] = 1;
  Fp res;
  fp_mul(res, a, one_raw);
  memcpy(out, res.l, 6 * sizeof(u64));
}

// ---------------------------------------------------------------------------
// Tower
// ---------------------------------------------------------------------------

struct Fp2 {
  Fp c0, c1;
};
struct Fp6 {
  Fp2 c0, c1, c2;
};
struct Fp12 {
  Fp6 c0, c1;
};

static inline void fp2_add(Fp2 &r, const Fp2 &a, const Fp2 &b) {
  fp_add(r.c0, a.c0, b.c0);
  fp_add(r.c1, a.c1, b.c1);
}
static inline void fp2_sub(Fp2 &r, const Fp2 &a, const Fp2 &b) {
  fp_sub(r.c0, a.c0, b.c0);
  fp_sub(r.c1, a.c1, b.c1);
}
static inline void fp2_neg(Fp2 &r, const Fp2 &a) {
  fp_neg(r.c0, a.c0);
  fp_neg(r.c1, a.c1);
}
static inline void fp2_conj(Fp2 &r, const Fp2 &a) {
  r.c0 = a.c0;
  fp_neg(r.c1, a.c1);
}
static void fp2_mul(Fp2 &r, const Fp2 &a, const Fp2 &b) {
  Fp t0, t1, t2, s1, s2;
  fp_mul(t0, a.c0, b.c0);
  fp_mul(t1, a.c1, b.c1);
  fp_add(s1, a.c0, a.c1);
  fp_add(s2, b.c0, b.c1);
  fp_mul(t2, s1, s2);
  fp_sub(r.c0, t0, t1);
  Fp tmp;
  fp_add(tmp, t0, t1);
  fp_sub(r.c1, t2, tmp);
}
// (a0 + a1 u)^2 = (a0+a1)(a0-a1) + 2 a0 a1 u   — 2 muls instead of 3
static void fp2_sqr(Fp2 &r, const Fp2 &a) {
  Fp s, d, m;
  fp_add(s, a.c0, a.c1);
  fp_sub(d, a.c0, a.c1);
  fp_mul(m, a.c0, a.c1);
  fp_mul(r.c0, s, d);
  fp_add(r.c1, m, m);
}
// scale both components by an Fp
static inline void fp2_scale(Fp2 &r, const Fp2 &a, const Fp &k) {
  fp_mul(r.c0, a.c0, k);
  fp_mul(r.c1, a.c1, k);
}
static void fp2_inv(Fp2 &r, const Fp2 &a) {
  Fp n0, n1, norm, ninv;
  fp_sqr(n0, a.c0);
  fp_sqr(n1, a.c1);
  fp_add(norm, n0, n1);
  fp_inv(ninv, norm);
  fp_mul(r.c0, a.c0, ninv);
  Fp t;
  fp_mul(t, a.c1, ninv);
  fp_neg(r.c1, t);
}
// multiply by xi = u + 1: (c0 + c1 u)(1 + u) = (c0 - c1) + (c0 + c1) u
static inline void fp2_mul_xi(Fp2 &r, const Fp2 &a) {
  Fp t0, t1;
  fp_sub(t0, a.c0, a.c1);
  fp_add(t1, a.c0, a.c1);
  r.c0 = t0;
  r.c1 = t1;
}

static void fp2_pow_words(Fp2 &r, const Fp2 &a, const u64 *e, int nbits) {
  Fp2 base = a, acc;
  memset(&acc, 0, sizeof(acc));
  memcpy(acc.c0.l, ONE_M, sizeof(ONE_M));
  for (int i = 0; i < nbits; i++) {
    if ((e[i / 64] >> (i % 64)) & 1) fp2_mul(acc, acc, base);
    fp2_sqr(base, base);
  }
  r = acc;
}

static void fp6_add(Fp6 &r, const Fp6 &a, const Fp6 &b) {
  fp2_add(r.c0, a.c0, b.c0);
  fp2_add(r.c1, a.c1, b.c1);
  fp2_add(r.c2, a.c2, b.c2);
}
static void fp6_sub(Fp6 &r, const Fp6 &a, const Fp6 &b) {
  fp2_sub(r.c0, a.c0, b.c0);
  fp2_sub(r.c1, a.c1, b.c1);
  fp2_sub(r.c2, a.c2, b.c2);
}
static void fp6_neg(Fp6 &r, const Fp6 &a) {
  fp2_neg(r.c0, a.c0);
  fp2_neg(r.c1, a.c1);
  fp2_neg(r.c2, a.c2);
}
static void fp6_mul(Fp6 &r, const Fp6 &a, const Fp6 &b) {
  Fp2 t0, t1, t2, s;
  fp2_mul(t0, a.c0, b.c0);
  fp2_mul(t1, a.c1, b.c1);
  fp2_mul(t2, a.c2, b.c2);
  Fp2 a12, b12, m;
  fp2_add(a12, a.c1, a.c2);
  fp2_add(b12, b.c1, b.c2);
  fp2_mul(m, a12, b12);
  fp2_sub(m, m, t1);
  fp2_sub(m, m, t2);
  fp2_mul_xi(m, m);
  fp2_add(r.c0, t0, m);
  Fp2 a01, b01;
  fp2_add(a01, a.c0, a.c1);
  fp2_add(b01, b.c0, b.c1);
  fp2_mul(m, a01, b01);
  fp2_sub(m, m, t0);
  fp2_sub(m, m, t1);
  fp2_mul_xi(s, t2);
  fp2_add(r.c1, m, s);
  Fp2 a02, b02;
  fp2_add(a02, a.c0, a.c2);
  fp2_add(b02, b.c0, b.c2);
  fp2_mul(m, a02, b02);
  fp2_sub(m, m, t0);
  fp2_sub(m, m, t2);
  fp2_add(r.c2, m, t1);
}
static void fp6_inv(Fp6 &r, const Fp6 &a) {
  Fp2 c0, c1, c2, t, m;
  fp2_sqr(c0, a.c0);
  fp2_mul(t, a.c1, a.c2);
  fp2_mul_xi(m, t);
  fp2_sub(c0, c0, m);
  fp2_sqr(c1, a.c2);
  fp2_mul_xi(c1, c1);
  fp2_mul(t, a.c0, a.c1);
  fp2_sub(c1, c1, t);
  fp2_sqr(c2, a.c1);
  fp2_mul(t, a.c0, a.c2);
  fp2_sub(c2, c2, t);
  Fp2 acc, tmp, tmp2;
  fp2_mul(acc, a.c0, c0);
  fp2_mul(tmp, a.c2, c1);
  fp2_mul(tmp2, a.c1, c2);
  fp2_add(tmp, tmp, tmp2);
  fp2_mul_xi(tmp, tmp);
  fp2_add(acc, acc, tmp);
  Fp2 accinv;
  fp2_inv(accinv, acc);
  fp2_mul(r.c0, c0, accinv);
  fp2_mul(r.c1, c1, accinv);
  fp2_mul(r.c2, c2, accinv);
}
// multiply by v: (a0, a1, a2) -> (xi*a2, a0, a1)
static void fp6_mul_v(Fp6 &r, const Fp6 &a) {
  Fp2 t;
  fp2_mul_xi(t, a.c2);
  r.c2 = a.c1;
  r.c1 = a.c0;
  r.c0 = t;
}
// (a0,a1,a2) * (b0 + b1 v)
static void fp6_mul_by_01(Fp6 &r, const Fp6 &a, const Fp2 &b0, const Fp2 &b1) {
  Fp2 aa, bb, t, s;
  fp2_mul(aa, a.c0, b0);
  fp2_mul(bb, a.c1, b1);
  fp2_mul(t, a.c2, b1);
  fp2_mul_xi(t, t);
  Fp2 rc0, rc1, rc2;
  fp2_add(rc0, t, aa);
  Fp2 b01, a01;
  fp2_add(b01, b0, b1);
  fp2_add(a01, a.c0, a.c1);
  fp2_mul(rc1, b01, a01);
  fp2_sub(rc1, rc1, aa);
  fp2_sub(rc1, rc1, bb);
  fp2_mul(s, a.c2, b0);
  fp2_add(rc2, s, bb);
  r.c0 = rc0;
  r.c1 = rc1;
  r.c2 = rc2;
}
// (a0,a1,a2) * (b1 v)
static void fp6_mul_by_1(Fp6 &r, const Fp6 &a, const Fp2 &b1) {
  Fp2 t;
  fp2_mul(t, a.c2, b1);
  Fp2 rc0;
  fp2_mul_xi(rc0, t);
  Fp2 rc1, rc2;
  fp2_mul(rc1, a.c0, b1);
  fp2_mul(rc2, a.c1, b1);
  r.c0 = rc0;
  r.c1 = rc1;
  r.c2 = rc2;
}

static void fp12_mul(Fp12 &r, const Fp12 &a, const Fp12 &b) {
  Fp6 t0, t1, m, s;
  fp6_mul(t0, a.c0, b.c0);
  fp6_mul(t1, a.c1, b.c1);
  Fp6 a01, b01;
  fp6_add(a01, a.c0, a.c1);
  fp6_add(b01, b.c0, b.c1);
  fp6_mul(m, a01, b01);
  fp6_sub(m, m, t0);
  fp6_sub(m, m, t1);
  fp6_mul_v(s, t1);
  fp6_add(r.c0, t0, s);
  r.c1 = m;
}
// (a0 + a1 w)^2 = (a0^2 + v a1^2) + 2 a0 a1 w, via
// c0 = (a0+a1)(a0 + v a1) - t - v t, c1 = 2t with t = a0 a1 — 2 muls not 3
static void fp12_sqr(Fp12 &r, const Fp12 &a) {
  Fp6 t, s0, s1, m, vt;
  fp6_mul(t, a.c0, a.c1);
  fp6_add(s0, a.c0, a.c1);
  fp6_mul_v(s1, a.c1);
  fp6_add(s1, s1, a.c0);
  fp6_mul(m, s0, s1);
  fp6_sub(m, m, t);
  fp6_mul_v(vt, t);
  fp6_sub(r.c0, m, vt);
  fp6_add(r.c1, t, t);
}
static void fp12_inv(Fp12 &r, const Fp12 &a) {
  Fp6 t0, t1, t;
  fp6_mul(t0, a.c0, a.c0);
  fp6_mul(t1, a.c1, a.c1);
  fp6_mul_v(t, t1);
  fp6_sub(t0, t0, t);
  Fp6 tinv;
  fp6_inv(tinv, t0);
  fp6_mul(r.c0, a.c0, tinv);
  Fp6 m;
  fp6_mul(m, a.c1, tinv);
  fp6_neg(r.c1, m);
}
static void fp12_conj(Fp12 &r, const Fp12 &a) {
  r.c0 = a.c0;
  fp6_neg(r.c1, a.c1);
}
static void fp12_one(Fp12 &r) {
  memset(&r, 0, sizeof(r));
  memcpy(r.c0.c0.c0.l, ONE_M, sizeof(ONE_M));
}
static bool fp12_is_one(const Fp12 &a) {
  Fp12 one;
  fp12_one(one);
  return memcmp(&a, &one, sizeof(Fp12)) == 0;
}

// f * (c0 + c1 v + c4 v w) — ate line sparsity
static void fp12_mul_by_014(Fp12 &f, const Fp2 &c0, const Fp2 &c1,
                            const Fp2 &c4) {
  Fp6 aa, bb, r1, tmp;
  fp6_mul_by_01(aa, f.c0, c0, c1);
  fp6_mul_by_1(bb, f.c1, c4);
  Fp2 o;
  fp2_add(o, c1, c4);
  fp6_add(tmp, f.c1, f.c0);
  fp6_mul_by_01(r1, tmp, c0, o);
  fp6_sub(r1, r1, aa);
  fp6_sub(r1, r1, bb);
  Fp6 r0;
  fp6_mul_v(r0, bb);
  fp6_add(r0, r0, aa);
  f.c0 = r0;
  f.c1 = r1;
}

// ---------------------------------------------------------------------------
// Frobenius — coefficients computed once at init:
//   v^q = v * xi^((q-1)/3);  v^(2q) = v^2 * xi^(2(q-1)/3);  w^q = w * xi^((q-1)/6)
// ---------------------------------------------------------------------------

static Fp2 FROB6_C1, FROB6_C2, FROB12_C1;
static bool FROB_INIT = false;

// divide the 6-limb little-endian value by small d (exact division assumed ok;
// remainder discarded)
static void limbs_div_small(u64 *out, const u64 *in, u64 d) {
  u128 rem = 0;
  u64 tmp[6];
  for (int i = 5; i >= 0; i--) {
    u128 cur = (rem << 64) | in[i];
    tmp[i] = (u64)(cur / d);
    rem = cur % d;
  }
  memcpy(out, tmp, sizeof(tmp));
}

static void frob_init() {
  if (FROB_INIT) return;
  // q - 1
  u64 qm1[6];
  memcpy(qm1, Q, sizeof(qm1));
  qm1[0] -= 1;  // q is odd, no borrow
  u64 e3[6], e6[6];
  limbs_div_small(e3, qm1, 3);
  limbs_div_small(e6, qm1, 6);
  Fp2 xi;
  memcpy(xi.c0.l, ONE_M, sizeof(ONE_M));
  memcpy(xi.c1.l, ONE_M, sizeof(ONE_M));
  fp2_pow_words(FROB6_C1, xi, e3, 381);
  fp2_pow_words(FROB12_C1, xi, e6, 381);
  fp2_sqr(FROB6_C2, FROB6_C1);
  FROB_INIT = true;
}

static void fp6_frob(Fp6 &r, const Fp6 &a) {
  fp2_conj(r.c0, a.c0);
  Fp2 t;
  fp2_conj(t, a.c1);
  fp2_mul(r.c1, t, FROB6_C1);
  fp2_conj(t, a.c2);
  fp2_mul(r.c2, t, FROB6_C2);
}

static void fp12_frob(Fp12 &r, const Fp12 &a) {
  fp6_frob(r.c0, a.c0);
  Fp6 t;
  fp6_frob(t, a.c1);
  fp2_mul(r.c1.c0, t.c0, FROB12_C1);
  fp2_mul(r.c1.c1, t.c1, FROB12_C1);
  fp2_mul(r.c1.c2, t.c2, FROB12_C1);
}

static void fp12_frob2(Fp12 &r, const Fp12 &a) {
  Fp12 t;
  fp12_frob(t, a);
  fp12_frob(r, t);
}

// ---------------------------------------------------------------------------
// Cyclotomic arithmetic (valid after the easy part of the final exp)
// ---------------------------------------------------------------------------

// (a + b s)^2 in Fq4 = Fq2[s]/(s^2 - xi)
static void fp4_sqr(Fp2 &c0, Fp2 &c1, const Fp2 &a, const Fp2 &b) {
  Fp2 t0, t1, t2;
  fp2_sqr(t0, a);
  fp2_sqr(t1, b);
  fp2_mul_xi(t2, t1);
  fp2_add(c0, t2, t0);
  fp2_add(t2, a, b);
  fp2_sqr(t2, t2);
  fp2_sub(t2, t2, t0);
  fp2_sub(c1, t2, t1);
}

// Granger–Scott cyclotomic squaring
static void fp12_cyc_sqr(Fp12 &r, const Fp12 &f) {
  Fp2 z0 = f.c0.c0, z4 = f.c0.c1, z3 = f.c0.c2;
  Fp2 z2 = f.c1.c0, z1 = f.c1.c1, z5 = f.c1.c2;
  Fp2 t0, t1, t2, t3;
  fp4_sqr(t0, t1, z0, z1);
  fp2_sub(z0, t0, z0);
  fp2_add(z0, z0, z0);
  fp2_add(z0, z0, t0);
  fp2_add(z1, t1, z1);
  fp2_add(z1, z1, z1);
  fp2_add(z1, z1, t1);
  fp4_sqr(t0, t1, z2, z3);
  fp4_sqr(t2, t3, z4, z5);
  fp2_sub(z4, t0, z4);
  fp2_add(z4, z4, z4);
  fp2_add(z4, z4, t0);
  fp2_add(z5, t1, z5);
  fp2_add(z5, z5, z5);
  fp2_add(z5, z5, t1);
  fp2_mul_xi(t0, t3);
  fp2_add(z2, t0, z2);
  fp2_add(z2, z2, z2);
  fp2_add(z2, z2, t0);
  fp2_sub(z3, t2, z3);
  fp2_add(z3, z3, z3);
  fp2_add(z3, z3, t2);
  r.c0.c0 = z0;
  r.c0.c1 = z4;
  r.c0.c2 = z3;
  r.c1.c0 = z2;
  r.c1.c1 = z1;
  r.c1.c2 = z5;
}

// f^|x| by cyclotomic square-and-multiply, then conjugate (x < 0)
static void cyc_exp_by_x(Fp12 &r, const Fp12 &f) {
  Fp12 acc;
  bool started = false;
  for (int i = 63; i >= 0; i--) {
    if (started) fp12_cyc_sqr(acc, acc);
    if ((BLS_X >> i) & 1) {
      if (started) {
        fp12_mul(acc, acc, f);
      } else {
        acc = f;
        started = true;
      }
    }
  }
  fp12_conj(r, acc);  // x < 0
}

static void final_exp(Fp12 &out, const Fp12 &f) {
  frob_init();
  Fp12 t0, t1, t2, t3, t4, t5, t6, tmp;
  // easy: f^((q^6-1)(q^2+1))
  fp12_conj(t0, f);
  fp12_inv(t1, f);
  fp12_mul(t2, t0, t1);
  t1 = t2;
  fp12_frob2(tmp, t2);
  fp12_mul(t2, tmp, t1);
  // hard part (Aranha et al. x-chain; computes the 3x multiple)
  fp12_cyc_sqr(tmp, t2);
  fp12_conj(t1, tmp);
  cyc_exp_by_x(t3, t2);
  fp12_cyc_sqr(t4, t3);
  fp12_mul(t5, t1, t3);
  cyc_exp_by_x(t1, t5);
  cyc_exp_by_x(t0, t1);
  cyc_exp_by_x(t6, t0);
  fp12_mul(t6, t6, t4);
  cyc_exp_by_x(t4, t6);
  fp12_conj(t5, t5);
  fp12_mul(tmp, t5, t2);
  fp12_mul(t4, t4, tmp);
  fp12_conj(t5, t2);
  fp12_mul(t1, t1, t2);
  fp12_frob(tmp, t1);
  fp12_frob(t1, tmp);
  fp12_frob(tmp, t1);
  t1 = tmp;
  fp12_mul(t6, t6, t5);
  fp12_frob(tmp, t6);
  t6 = tmp;
  fp12_mul(t3, t3, t0);
  fp12_frob2(tmp, t3);
  t3 = tmp;
  fp12_mul(t3, t3, t1);
  fp12_mul(t3, t3, t6);
  fp12_mul(out, t3, t4);
}

// ---------------------------------------------------------------------------
// Miller loop: twist-resident, Jacobian coords on E'(Fq2)
// ---------------------------------------------------------------------------

// Jacobian doubling + line coefficients (eprint 2010/354 Alg. 26)
static void dbl_step(Fp2 &rx, Fp2 &ry, Fp2 &rz, Fp2 &l0, Fp2 &l1, Fp2 &l2) {
  Fp2 tmp0, tmp1, tmp2, tmp3, tmp4, tmp5, tmp6, zsq, t;
  fp2_sqr(tmp0, rx);
  fp2_sqr(tmp1, ry);
  fp2_sqr(tmp2, tmp1);
  fp2_add(t, tmp1, rx);
  fp2_sqr(tmp3, t);
  fp2_sub(tmp3, tmp3, tmp0);
  fp2_sub(tmp3, tmp3, tmp2);
  fp2_add(tmp3, tmp3, tmp3);
  fp2_add(tmp4, tmp0, tmp0);
  fp2_add(tmp4, tmp4, tmp0);
  fp2_add(tmp6, rx, tmp4);
  fp2_sqr(tmp5, tmp4);
  fp2_sqr(zsq, rz);
  fp2_sub(rx, tmp5, tmp3);
  fp2_sub(rx, rx, tmp3);
  fp2_add(t, rz, ry);
  fp2_sqr(t, t);
  fp2_sub(t, t, tmp1);
  fp2_sub(rz, t, zsq);
  fp2_sub(t, tmp3, rx);
  fp2_mul(ry, t, tmp4);
  Fp2 t2_8;
  fp2_add(t2_8, tmp2, tmp2);
  fp2_add(t2_8, t2_8, t2_8);
  fp2_add(t2_8, t2_8, t2_8);
  fp2_sub(ry, ry, t2_8);
  fp2_mul(tmp3, tmp4, zsq);
  fp2_add(tmp3, tmp3, tmp3);
  fp2_neg(tmp3, tmp3);
  fp2_sqr(t, tmp6);
  fp2_sub(tmp6, t, tmp0);
  fp2_sub(tmp6, tmp6, tmp5);
  Fp2 t1_4;
  fp2_add(t1_4, tmp1, tmp1);
  fp2_add(t1_4, t1_4, t1_4);
  fp2_sub(tmp6, tmp6, t1_4);
  fp2_mul(tmp0, rz, zsq);
  fp2_add(tmp0, tmp0, tmp0);
  l0 = tmp0;
  l1 = tmp3;
  l2 = tmp6;
}

// mixed Jacobian+affine addition + line coefficients (Alg. 27)
static void add_step(Fp2 &rx, Fp2 &ry, Fp2 &rz, const Fp2 &qx, const Fp2 &qy,
                     Fp2 &l0, Fp2 &l1, Fp2 &l2) {
  Fp2 zsq, ysq, t0, t1, t2, t3, t4, t5, t6, t7, t8, t9, t10, t;
  fp2_sqr(zsq, rz);
  fp2_sqr(ysq, qy);
  fp2_mul(t0, zsq, qx);
  fp2_add(t, qy, rz);
  fp2_sqr(t, t);
  fp2_sub(t, t, ysq);
  fp2_sub(t, t, zsq);
  fp2_mul(t1, t, zsq);
  fp2_sub(t2, t0, rx);
  fp2_sqr(t3, t2);
  fp2_add(t4, t3, t3);
  fp2_add(t4, t4, t4);
  fp2_mul(t5, t4, t2);
  fp2_sub(t6, t1, ry);
  fp2_sub(t6, t6, ry);
  fp2_mul(t9, t6, qx);
  fp2_mul(t7, t4, rx);
  fp2_sqr(t, t6);
  fp2_sub(t, t, t5);
  fp2_sub(t, t, t7);
  fp2_sub(rx, t, t7);
  fp2_add(t, rz, t2);
  fp2_sqr(t, t);
  fp2_sub(t, t, zsq);
  fp2_sub(rz, t, t3);
  fp2_add(t10, qy, rz);
  fp2_sub(t, t7, rx);
  fp2_mul(t8, t, t6);
  fp2_mul(t0, ry, t5);
  fp2_add(t0, t0, t0);
  fp2_sub(ry, t8, t0);
  fp2_sqr(t, t10);
  fp2_sub(t10, t, ysq);
  fp2_sqr(t, rz);
  fp2_sub(t10, t10, t);
  fp2_add(t9, t9, t9);
  fp2_sub(t9, t9, t10);
  fp2_add(t10, rz, rz);
  fp2_neg(t6, t6);
  fp2_add(t1, t6, t6);
  l0 = t10;
  l1 = t1;
  l2 = t9;
}

static void ell(Fp12 &f, const Fp2 &l0, const Fp2 &l1, const Fp2 &l2,
                const Fp &xp, const Fp &yp) {
  Fp2 c0, c1;
  fp2_scale(c0, l0, yp);
  fp2_scale(c1, l1, xp);
  fp12_mul_by_014(f, l2, c1, c0);
}

static void miller(Fp12 &f, const Fp &xp, const Fp &yp, const Fp2 &xq,
                   const Fp2 &yq) {
  Fp2 rx = xq, ry = yq, rz;
  memset(&rz, 0, sizeof(rz));
  memcpy(rz.c0.l, ONE_M, sizeof(ONE_M));
  fp12_one(f);
  Fp2 l0, l1, l2;
  int topbit = 63;
  while (!((BLS_X >> topbit) & 1)) topbit--;
  for (int i = topbit - 1; i >= 0; i--) {
    fp12_sqr(f, f);
    dbl_step(rx, ry, rz, l0, l1, l2);
    ell(f, l0, l1, l2, xp, yp);
    if ((BLS_X >> i) & 1) {
      add_step(rx, ry, rz, xq, yq, l0, l1, l2);
      ell(f, l0, l1, l2, xp, yp);
    }
  }
  // t < 0: conjugate
  Fp12 c;
  fp12_conj(c, f);
  f = c;
}

// ---------------------------------------------------------------------------
// G1 Jacobian arithmetic + Pippenger MSM (host side) — used by the verifier's
// batched pcV: the random-linear-combination of 3m+4 pairing checks needs
// three ~(3m+4)-point MSMs (see sonic_tpu/commitment.py pcv_batch).
// ---------------------------------------------------------------------------

struct G1J {
  Fp x, y, z;  // Jacobian; z == 0 -> infinity
};

static inline bool g1j_is_inf(const G1J &p) { return fp_is_zero(p.z); }
static inline void g1j_set_inf(G1J &p) { memset(&p, 0, sizeof(p)); }

// dbl-2009-l (a = 0)
static void g1j_dbl(G1J &r, const G1J &p) {
  if (g1j_is_inf(p)) {
    r = p;
    return;
  }
  Fp A, B, C, D, E, F, t;
  fp_sqr(A, p.x);
  fp_sqr(B, p.y);
  fp_sqr(C, B);
  fp_add(t, p.x, B);
  fp_sqr(t, t);
  fp_sub(t, t, A);
  fp_sub(t, t, C);
  fp_add(D, t, t);
  fp_add(E, A, A);
  fp_add(E, E, A);
  fp_sqr(F, E);
  G1J o;
  fp_sub(o.x, F, D);
  fp_sub(o.x, o.x, D);
  fp_sub(t, D, o.x);
  fp_mul(t, E, t);
  Fp C8;
  fp_add(C8, C, C);
  fp_add(C8, C8, C8);
  fp_add(C8, C8, C8);
  fp_sub(o.y, t, C8);
  fp_mul(t, p.y, p.z);
  fp_add(o.z, t, t);
  r = o;
}

// add-2007-bl, general Jacobian + Jacobian
static void g1j_add(G1J &r, const G1J &p, const G1J &q) {
  if (g1j_is_inf(p)) {
    r = q;
    return;
  }
  if (g1j_is_inf(q)) {
    r = p;
    return;
  }
  Fp z1z1, z2z2, u1, u2, s1, s2, t;
  fp_sqr(z1z1, p.z);
  fp_sqr(z2z2, q.z);
  fp_mul(u1, p.x, z2z2);
  fp_mul(u2, q.x, z1z1);
  fp_mul(t, q.z, z2z2);
  fp_mul(s1, p.y, t);
  fp_mul(t, p.z, z1z1);
  fp_mul(s2, q.y, t);
  Fp h, rr;
  fp_sub(h, u2, u1);
  fp_sub(rr, s2, s1);
  if (fp_is_zero(h)) {
    if (fp_is_zero(rr)) {
      g1j_dbl(r, p);
      return;
    }
    g1j_set_inf(r);
    return;
  }
  Fp i, j, v;
  fp_add(t, h, h);
  fp_sqr(i, t);
  fp_mul(j, h, i);
  fp_add(rr, rr, rr);
  fp_mul(v, u1, i);
  G1J o;
  fp_sqr(o.x, rr);
  fp_sub(o.x, o.x, j);
  fp_sub(o.x, o.x, v);
  fp_sub(o.x, o.x, v);
  fp_sub(t, v, o.x);
  fp_mul(t, rr, t);
  Fp t2;
  fp_mul(t2, s1, j);
  fp_add(t2, t2, t2);
  fp_sub(o.y, t, t2);
  fp_add(t, p.z, q.z);
  fp_sqr(t, t);
  fp_sub(t, t, z1z1);
  fp_sub(t, t, z2z2);
  fp_mul(o.z, t, h);
  r = o;
}

extern "C" {

// Pippenger MSM over G1 with 256-bit scalars.
//   pts: n * 12 u64 affine std-form (x, y); inf[i] = 1 skips point i
//   scalars: n * 4 u64 little-endian
//   out: 12 u64 affine std-form result; *out_inf = 1 if infinity
void sonic_g1_msm(const u64 *pts, const unsigned char *inf, const u64 *scalars,
                  int n, u64 *out, unsigned char *out_inf) {
  // adapt window size to n and window count to the real scalar width
  // (pcv_batch's rho scalars are 128-bit; full Fr scalars are 255-bit)
  int topbit = 0;
  for (int i = 0; i < n; i++) {
    for (int w = 3; w >= 0; w--) {
      if (scalars[i * 4 + w]) {
        int b = 63;
        while (!((scalars[i * 4 + w] >> b) & 1)) b--;
        int t = w * 64 + b + 1;
        if (t > topbit) topbit = t;
        break;
      }
    }
  }
  if (topbit == 0) topbit = 1;
  const int C = n >= 64 ? 8 : 4;
  const int WINDOWS = (topbit + C - 1) / C;
  G1J *mont = new G1J[n];
  for (int i = 0; i < n; i++) {
    if (inf[i]) {
      g1j_set_inf(mont[i]);
      continue;
    }
    fp_from_std(mont[i].x, pts + i * 12);
    fp_from_std(mont[i].y, pts + i * 12 + 6);
    memcpy(mont[i].z.l, ONE_M, sizeof(ONE_M));
  }
  G1J *buckets = new G1J[1 << C];
  G1J acc;
  g1j_set_inf(acc);
  for (int w = WINDOWS - 1; w >= 0; w--) {
    if (!g1j_is_inf(acc)) {
      for (int b = 0; b < C; b++) g1j_dbl(acc, acc);
    }
    for (int b = 0; b < (1 << C); b++) g1j_set_inf(buckets[b]);
    for (int i = 0; i < n; i++) {
      if (g1j_is_inf(mont[i])) continue;
      int bit = w * C;
      u64 d = (scalars[i * 4 + bit / 64] >> (bit % 64)) & ((1u << C) - 1);
      if (d) g1j_add(buckets[d], buckets[d], mont[i]);
    }
    G1J sum, run;
    g1j_set_inf(sum);
    g1j_set_inf(run);
    for (int b = (1 << C) - 1; b >= 1; b--) {
      g1j_add(run, run, buckets[b]);
      g1j_add(sum, sum, run);
    }
    g1j_add(acc, acc, sum);
  }
  delete[] mont;
  delete[] buckets;
  if (g1j_is_inf(acc)) {
    *out_inf = 1;
    memset(out, 0, 12 * sizeof(u64));
    return;
  }
  *out_inf = 0;
  Fp zinv, zinv2, zinv3, ax, ay;
  fp_inv(zinv, acc.z);
  fp_sqr(zinv2, zinv);
  fp_mul(zinv3, zinv2, zinv);
  fp_mul(ax, acc.x, zinv2);
  fp_mul(ay, acc.y, zinv3);
  fp_to_std(out, ax);
  fp_to_std(out + 6, ay);
}

// g1_xy: n * 12 u64 (x 6, y 6; little-endian, standard form)
// g2_xy: n * 24 u64 (x.c0, x.c1, y.c0, y.c1)
// infs: 1 = point at infinity (skipped: contributes factor 1)
int sonic_pairing_product_is_one(const u64 *g1_xy, const unsigned char *g1_inf,
                                 const u64 *g2_xy, const unsigned char *g2_inf,
                                 int n) {
  frob_init();
  Fp12 acc;
  fp12_one(acc);
  for (int i = 0; i < n; i++) {
    if (g1_inf[i] || g2_inf[i]) continue;
    Fp xp, yp;
    fp_from_std(xp, g1_xy + i * 12);
    fp_from_std(yp, g1_xy + i * 12 + 6);
    Fp2 xq, yq;
    fp_from_std(xq.c0, g2_xy + i * 24);
    fp_from_std(xq.c1, g2_xy + i * 24 + 6);
    fp_from_std(yq.c0, g2_xy + i * 24 + 12);
    fp_from_std(yq.c1, g2_xy + i * 24 + 18);
    Fp12 f;
    miller(f, xp, yp, xq, yq);
    fp12_mul(acc, acc, f);
  }
  Fp12 out;
  final_exp(out, acc);
  return fp12_is_one(out) ? 1 : 0;
}

// Full pairing value e(P, Q) in standard-form limbs, for cross-checking the
// native path against the Python tower: out = 72 u64, ordered
// (c0.c0.c0, c0.c0.c1, c0.c1.c0, ..., c1.c2.c1), each 6 limbs LE.
void sonic_pairing_gt(const u64 *g1_xy, const u64 *g2_xy, u64 *out) {
  frob_init();
  Fp xp, yp;
  fp_from_std(xp, g1_xy);
  fp_from_std(yp, g1_xy + 6);
  Fp2 xq, yq;
  fp_from_std(xq.c0, g2_xy);
  fp_from_std(xq.c1, g2_xy + 6);
  fp_from_std(yq.c0, g2_xy + 12);
  fp_from_std(yq.c1, g2_xy + 18);
  Fp12 f, e;
  miller(f, xp, yp, xq, yq);
  final_exp(e, f);
  const Fp2 *parts[6] = {&e.c0.c0, &e.c0.c1, &e.c0.c2,
                         &e.c1.c0, &e.c1.c1, &e.c1.c2};
  for (int i = 0; i < 6; i++) {
    fp_to_std(out + i * 12, parts[i]->c0);
    fp_to_std(out + i * 12 + 6, parts[i]->c1);
  }
}

int sonic_native_ok() { return 1; }
}
