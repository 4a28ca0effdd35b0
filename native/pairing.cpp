// BLS12-381 optimal ate pairing — native host implementation.
//
// Plays the role GMP plays in the reference stack (the only native code in
// sdiehl/sonic's dependency tree is GHC Integer/GMP inside galois-field —
// SURVEY.md §2.3): fast host bignum for the verifier's pairing checks
// (reference src/Sonic/CommitmentScheme.hs:51-68 does 3 pairings per pcV).
//
// Layout mirrors sonic_tpu/pairing/host.py exactly:
//   Fq:  6x64-bit limbs, Montgomery form (R = 2^384)
//   Fq2 = Fq[u]/(u^2+1); Fq6 = Fq2[v]/(v^3 - (u+1)); Fq12 = Fq6[w]/(w^2 - v)
//   G2 untwisted into E(Fq12) via psi(x,y) = (x w^-2, y w^-3); generic
//   affine line functions; final exponentiation = easy part + hard-part pow.
//
// C ABI (see sonic_tpu/native.py):
//   sonic_pairing_product_is_one(g1_xy[ n*12 u64 ], g1_inf[n],
//                                g2_xy[ n*24 u64 ], g2_inf[n], n) -> 1/0

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

static inline int fp_cmp(const Fp &a, const Fp &b) {
  for (int i = 5; i >= 0; i--) {
    if (a.l[i] != b.l[i]) return a.l[i] < b.l[i] ? -1 : 1;
  }
  return 0;
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
  // r < 2q < 2^385; subtract q if >= q (carry can only be 0 here since
  // 2q < 2^384)
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
  // conditional subtract (t[6] is 0 or 1)
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

static void fp_pow(Fp &r, const Fp &a, const u64 *e, int nbits) {
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
  // subtract 2
  u128 borrow = 2;
  for (int i = 0; i < 6; i++) {
    u128 d = (u128)e[i] - (u64)borrow;
    borrow = (d >> 64) ? 1 : 0;
    e[i] = (u64)d;
    if (!borrow) break;
  }
  fp_pow(r, a, e, 381);
}

static void fp_from_std(Fp &r, const u64 *std_le) {
  Fp tmp;
  memcpy(tmp.l, std_le, 6 * sizeof(u64));
  Fp r2;
  memcpy(r2.l, R2, sizeof(r2.l));
  fp_mul(r, tmp, r2);
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

static const Fp2 *fp2_zero_singleton() {
  static Fp2 z;
  static bool init = false;
  if (!init) {
    memset(&z, 0, sizeof(z));
    init = true;
  }
  return &z;
}

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
static inline void fp2_sqr(Fp2 &r, const Fp2 &a) { fp2_mul(r, a, a); }
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
  Fp2 t0, t1, t2, s, t;
  fp2_mul(t0, a.c0, b.c0);
  fp2_mul(t1, a.c1, b.c1);
  fp2_mul(t2, a.c2, b.c2);
  // c0 = t0 + xi*((a1+a2)(b1+b2) - t1 - t2)
  Fp2 a12, b12, m;
  fp2_add(a12, a.c1, a.c2);
  fp2_add(b12, b.c1, b.c2);
  fp2_mul(m, a12, b12);
  fp2_sub(m, m, t1);
  fp2_sub(m, m, t2);
  fp2_mul_xi(m, m);
  fp2_add(r.c0, t0, m);
  // c1 = (a0+a1)(b0+b1) - t0 - t1 + xi*t2
  Fp2 a01, b01;
  fp2_add(a01, a.c0, a.c1);
  fp2_add(b01, b.c0, b.c1);
  fp2_mul(m, a01, b01);
  fp2_sub(m, m, t0);
  fp2_sub(m, m, t1);
  fp2_mul_xi(s, t2);
  fp2_add(r.c1, m, s);
  // c2 = (a0+a2)(b0+b2) - t0 - t2 + t1
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
  Fp2 acc, tmp;
  fp2_mul(acc, a.c0, c0);
  fp2_mul(tmp, a.c2, c1);
  Fp2 tmp2;
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

static void fp12_add(Fp12 &r, const Fp12 &a, const Fp12 &b) {
  fp6_add(r.c0, a.c0, b.c0);
  fp6_add(r.c1, a.c1, b.c1);
}
static void fp12_sub(Fp12 &r, const Fp12 &a, const Fp12 &b) {
  fp6_sub(r.c0, a.c0, b.c0);
  fp6_sub(r.c1, a.c1, b.c1);
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
static inline void fp12_sqr(Fp12 &r, const Fp12 &a) { fp12_mul(r, a, a); }
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

// fp12 pow by big exponent (little-endian u64 words)
static void fp12_pow(Fp12 &r, const Fp12 &a, const u64 *e, int nwords) {
  Fp12 acc, base = a;
  fp12_one(acc);
  int nbits = nwords * 64;
  for (int i = 0; i < nbits; i++) {
    if ((e[i / 64] >> (i % 64)) & 1) fp12_mul(acc, acc, base);
    fp12_sqr(base, base);
  }
  r = acc;
}

// ---------------------------------------------------------------------------
// Miller loop on E(Fq12) with affine line functions (mirrors host.py)
// ---------------------------------------------------------------------------

struct Pt12 {
  Fp12 x, y;
};

static void fp12_from_fp(Fp12 &r, const Fp &a) {
  memset(&r, 0, sizeof(r));
  r.c0.c0.c0 = a;
}

static void fp12_small(Fp12 &r, u64 k) {
  // k * 1 in Montgomery form: add ONE_M k times (k tiny)
  memset(&r, 0, sizeof(r));
  Fp one;
  memcpy(one.l, ONE_M, sizeof(ONE_M));
  Fp acc;
  memset(acc.l, 0, sizeof(acc.l));
  for (u64 i = 0; i < k; i++) fp_add(acc, acc, one);
  fp12_from_fp(r, acc);
}

static void dbl_eval(Pt12 &t, Fp12 &l, const Fp &xp, const Fp &yp) {
  Fp12 three, two, lam, num, den, deninv, x3, y3, tmp, tmp2;
  fp12_small(three, 3);
  fp12_small(two, 2);
  fp12_sqr(num, t.x);
  fp12_mul(num, num, three);
  fp12_mul(den, t.y, two);
  fp12_inv(deninv, den);
  fp12_mul(lam, num, deninv);
  fp12_sqr(x3, lam);
  fp12_mul(tmp, t.x, two);
  fp12_sub(x3, x3, tmp);
  fp12_sub(tmp, t.x, x3);
  fp12_mul(y3, lam, tmp);
  fp12_sub(y3, y3, t.y);
  // line: lam*(xp - xt) - (yp - yt)
  Fp12 xp12, yp12;
  fp12_from_fp(xp12, xp);
  fp12_from_fp(yp12, yp);
  fp12_sub(tmp, xp12, t.x);
  fp12_mul(tmp, lam, tmp);
  fp12_sub(tmp2, yp12, t.y);
  fp12_sub(l, tmp, tmp2);
  t.x = x3;
  t.y = y3;
}

static void add_eval(Pt12 &t, const Pt12 &q, Fp12 &l, const Fp &xp,
                     const Fp &yp) {
  Fp12 lam, num, den, deninv, x3, y3, tmp, tmp2;
  fp12_sub(num, q.y, t.y);
  fp12_sub(den, q.x, t.x);
  fp12_inv(deninv, den);
  fp12_mul(lam, num, deninv);
  fp12_sqr(x3, lam);
  fp12_sub(x3, x3, t.x);
  fp12_sub(x3, x3, q.x);
  fp12_sub(tmp, t.x, x3);
  fp12_mul(y3, lam, tmp);
  fp12_sub(y3, y3, t.y);
  Fp12 xp12, yp12;
  fp12_from_fp(xp12, xp);
  fp12_from_fp(yp12, yp);
  fp12_sub(tmp, xp12, t.x);
  fp12_mul(tmp, lam, tmp);
  fp12_sub(tmp2, yp12, t.y);
  fp12_sub(l, tmp, tmp2);
  t.x = x3;
  t.y = y3;
}

// untwist: psi(x, y) = (x * xi^-1 * v^2, (y * xi^-1 * v) * w)
static void untwist(Pt12 &r, const Fp2 &x, const Fp2 &y) {
  // xi^-1
  Fp2 xi, xiinv;
  memcpy(xi.c0.l, ONE_M, sizeof(ONE_M));
  memcpy(xi.c1.l, ONE_M, sizeof(ONE_M));
  fp2_inv(xiinv, xi);
  memset(&r, 0, sizeof(r));
  fp2_mul(r.x.c0.c2, x, xiinv);  // c0 part, v^2 coefficient
  fp2_mul(r.y.c1.c1, y, xiinv);  // c1 (w) part, v coefficient
}

static void miller(Fp12 &f, const Fp &xp, const Fp &yp, const Fp2 &xq,
                   const Fp2 &yq) {
  Pt12 Q, T;
  untwist(Q, xq, yq);
  T = Q;
  fp12_one(f);
  // bits of BLS_X from second-most-significant down
  int topbit = 63;
  while (!((BLS_X >> topbit) & 1)) topbit--;
  for (int i = topbit - 1; i >= 0; i--) {
    Fp12 l;
    dbl_eval(T, l, xp, yp);
    fp12_sqr(f, f);
    fp12_mul(f, f, l);
    if ((BLS_X >> i) & 1) {
      add_eval(T, Q, l, xp, yp);
      fp12_mul(f, f, l);
    }
  }
  // t < 0: conjugate
  Fp12 c;
  fp12_conj(c, f);
  f = c;
}

// hard-part exponent (q^4 - q^2 + 1)/r and q^2, generated by tools/gen_exps.py
#include "pairing_exps.h"

static void final_exp(Fp12 &r, const Fp12 &f) {
  Fp12 finv, f1, f2, tmp;
  // easy: f^(q^6-1) = conj(f) * f^-1
  fp12_inv(finv, f);
  fp12_conj(f1, f);
  fp12_mul(f1, f1, finv);
  // ^(q^2+1)
  fp12_pow(tmp, f1, Q2_EXP, Q2_WORDS);
  fp12_mul(f2, tmp, f1);
  // hard part
  fp12_pow(r, f2, HARD_EXP, HARD_WORDS);
}

extern "C" {

// g1_xy: n * 12 u64 (x 6, y 6; little-endian, standard form)
// g2_xy: n * 24 u64 (x.c0, x.c1, y.c0, y.c1)
// infs: 1 = point at infinity (skipped: contributes factor 1)
int sonic_pairing_product_is_one(const u64 *g1_xy, const unsigned char *g1_inf,
                                 const u64 *g2_xy, const unsigned char *g2_inf,
                                 int n) {
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

int sonic_native_ok() { return 1; }
}
