"""Structured reference string — device-side generation and layout.

Reference: src/Sonic/SRS.hs. The reference stores 8 separate power-table
vectors; the TPU layout merges each (negative, positive) pair into ONE
contiguous array indexed by exponent+d, so commit/open table lookups become
static slices feeding the MSM (no gather):

    g_x[e + d]  = g^(x^e)            e in [-d, d]
    g_ax[e + d] = g^(alpha x^e)      e in [-d, d],  e = 0 slot is the point
                  at infinity — g^alpha is deliberately omitted
                  (SRS.hs:38-39; trapdoor-leak fix in ChangeLog 0.2)
    h_x, h_ax   = same over G2 (h_ax HAS the e=0 element, SRS.hs:40-41)

Generation: powers of x by log-depth ladder (limb.powers), then one batched
255-bit scalar-mul ladder over all 2d+1 exponents — replacing the
reference's d sequential `pow` + `mul` loops (SRS.hs:33-41, SURVEY.md §3.3).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .curve.group import g1, g2, Affine, Jacobian
from .fields import limb, ext
from .fields.limb import FR, FQ
from . import golden
from . import golden_protocol as gp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SRS:
    """Device SRS. g tables are G1 Affine batches (2d+1 rows); h tables are
    G2 Affine batches (2d+1 rows). Row index = exponent + d."""

    d: int
    g_x: Affine
    g_ax: Affine
    h_x: Affine
    h_ax: Affine

    def tree_flatten(self):
        return (self.g_x, self.g_ax, self.h_x, self.h_ax), self.d

    @classmethod
    def tree_unflatten(cls, d, children):
        return cls(d, *children)

    # -- generation ----------------------------------------------------------

    @classmethod
    def new(
        cls,
        d: int,
        x: int,
        alpha: int,
        mesh=None,
        h_mode: str = "full",
        n_hints=(),
    ) -> "SRS":
        """Trusted setup from trapdoor (x, alpha) — device compute.

        Power ladders by log-depth scan, then each table is a fixed-base
        windowed multiply (msm/fixed_base.py): ~32 batched gathered adds
        per point instead of the generic 255-step double-and-add ladder.
        With `mesh`, the 2d+1 exponent rows shard across devices
        (embarrassingly parallel — SURVEY.md §2.3, sharded SRS generation).

        h_mode:
          "full"     — materialize both G2 tables (reference SRS record
                       parity, SRS.hs:11-22; required for to_host/serial).
          "verifier" — skip the 2*(2d+1)-point G2 tables entirely: pcV
                       only ever reads h^{x^{-d+max}} for max in
                       {n, d}, h^alpha and h^{alpha x}
                       (CommitmentScheme.hs:58-68), so those few rows are
                       computed host-side from the trapdoor at setup and
                       pinned in the row cache. Over half the setup cost
                       at large d for a table the verifier reads 4 rows
                       of. Pass every circuit size the SRS will verify in
                       `n_hints` (the trapdoor is NOT retained, so
                       missing rows raise).
        """
        from .msm.fixed_base import fixed_base_mul
        from .utils.log import get_logger, phase_timer

        log = get_logger("srs")

        def _force(a):
            # opt-in timing fence: one-element fetch per logged phase
            # (block_until_ready lies on the tunnel backend)
            if log.mode and log.mode not in ("0", "off", "none"):
                np.asarray(a).ravel()[:1]

        x_m = FR.from_int(x)
        alpha_m = FR.from_int(alpha)
        xinv_m = limb.inv(x_m, FR)

        with phase_timer(log, "srs.powers", d=d):
            pos = limb.powers(x_m, FR, d + 1)  # x^0..x^d
            neg = limb.powers(xinv_m, FR, d + 1)[1:]  # x^-1..x^-d
            exps = jnp.concatenate([neg[::-1], pos], 0)  # x^-d..x^d (2d+1, L)
            aexps = limb.mul(exps, alpha_m, FR)
            # g^alpha (e=0 slot) is omitted from the G1 alpha table ->
            # scalar 0 -> point at infinity; h^alpha IS present
            # (SRS.hs:38-41).
            g_aexps = aexps.at[d].set(jnp.zeros_like(aexps[d]))

            exps_std = limb.from_mont(exps, FR)
            g_aexps_std = limb.from_mont(g_aexps, FR)
            h_aexps_std = limb.from_mont(aexps, FR)
            _force(h_aexps_std)

        rows = 2 * d + 1
        if mesh is not None:
            from .parallel.mesh import shard_leading

            # pad the (odd) 2d+1 row count to a device multiple; padded
            # zero scalars produce infinity rows, sliced off below
            ndev = mesh.devices.size
            pad = (-rows) % ndev

            def prep(a):
                if pad:
                    a = jnp.pad(a, ((0, pad), (0, 0)))
                return shard_leading(a, mesh)

            exps_std = prep(exps_std)
            g_aexps_std = prep(g_aexps_std)
            h_aexps_std = prep(h_aexps_std)

        def table(name, group, scalars):
            with phase_timer(log, f"srs.{name}", rows=rows):
                aff = group.to_affine(fixed_base_mul(group, scalars))
                if aff.x.shape[0] != rows:
                    aff = Affine(
                        aff.x[:rows], aff.y[:rows], aff.inf[:rows]
                    )
                _force(aff.x)
            return aff

        g_x = table("g_x", g1, exps_std)
        g_ax = table("g_ax", g1, g_aexps_std)
        if h_mode == "full":
            h_x = table("h_x", g2, exps_std)
            h_ax = table("h_ax", g2, h_aexps_std)
            return cls(d, g_x, g_ax, h_x, h_ax)
        if h_mode != "verifier":
            raise ValueError(f"unknown h_mode {h_mode!r}")
        srs = cls(d, g_x, g_ax, None, None)
        cache = srs._h_cache()
        P = gp.P
        for maxm in set(n_hints) | {d}:
            e = -d + maxm
            cache[("x", e)] = golden.g2_mul(golden.G2_GEN, pow(x, e, P))
        cache[("x", 0)] = golden.G2_GEN
        for e in (0, 1):
            cache[("ax", e)] = golden.g2_mul(
                golden.G2_GEN, alpha * pow(x, e, P) % P
            )
        return srs

    # -- host interop --------------------------------------------------------

    @classmethod
    def from_host(cls, srs: gp.SRS) -> "SRS":
        """Upload a host (golden) SRS — used by tests to avoid the device
        generation cost for tiny d."""
        d = srs.d

        def g1_rows(neg, pos, hole_at_zero):
            pts = list(reversed(neg)) + ([None] if hole_at_zero else []) + pos
            xs = [p[0] if p else 0 for p in pts]
            ys = [p[1] if p else 0 for p in pts]
            infs = [p is None for p in pts]
            return Affine(FQ.from_int(xs), FQ.from_int(ys), jnp.asarray(infs))

        def g2_rows(neg, pos, hole_at_zero):
            pts = list(reversed(neg)) + ([None] if hole_at_zero else []) + pos
            xs = [p[0] if p else ((0, 0)) for p in pts]
            ys = [p[1] if p else ((0, 0)) for p in pts]
            infs = [p is None for p in pts]
            X = ext.make(
                FQ.from_int([a[0] for a in xs]), FQ.from_int([a[1] for a in xs])
            )
            Y = ext.make(
                FQ.from_int([a[0] for a in ys]), FQ.from_int([a[1] for a in ys])
            )
            return Affine(X, Y, jnp.asarray(infs))

        return cls(
            d=d,
            g_x=g1_rows(srs.g_neg_x, srs.g_pos_x, False),
            g_ax=g1_rows(srs.g_neg_ax, srs.g_pos_ax, True),
            h_x=g2_rows(srs.h_neg_x, srs.h_pos_x, False),
            h_ax=g2_rows(srs.h_neg_ax, srs.h_pos_ax, False),
        )

    def to_host(self) -> gp.SRS:
        """Download to host (golden) representation for pairing checks and
        serialization round-trips."""
        if self.h_x is None:
            raise ValueError(
                "SRS(h_mode='verifier') has no full h tables; generate "
                "with h_mode='full' for host interop/serialization"
            )
        d = self.d

        def g1_list(tab, indices):
            xs = np.atleast_1d(FQ.to_int(tab.x))
            ys = np.atleast_1d(FQ.to_int(tab.y))
            infs = np.asarray(tab.inf)
            return [
                None if infs[i] else (int(xs[i]), int(ys[i])) for i in indices
            ]

        def g2_list(tab, indices):
            x0 = np.atleast_1d(FQ.to_int(ext.c0(tab.x)))
            x1 = np.atleast_1d(FQ.to_int(ext.c1(tab.x)))
            y0 = np.atleast_1d(FQ.to_int(ext.c0(tab.y)))
            y1 = np.atleast_1d(FQ.to_int(ext.c1(tab.y)))
            infs = np.asarray(tab.inf)
            return [
                None
                if infs[i]
                else (
                    (int(x0[i]), int(x1[i])),
                    (int(y0[i]), int(y1[i])),
                )
                for i in indices
            ]

        neg = list(range(d - 1, -1, -1))  # exponents -1 .. -d
        pos = list(range(d, 2 * d + 1))  # exponents 0 .. d
        pos1 = list(range(d + 1, 2 * d + 1))  # exponents 1 .. d
        return gp.SRS(
            d=d,
            g_neg_x=g1_list(self.g_x, neg),
            g_pos_x=g1_list(self.g_x, pos),
            h_neg_x=g2_list(self.h_x, neg),
            h_pos_x=g2_list(self.h_x, pos),
            g_neg_ax=g1_list(self.g_ax, neg),
            g_pos_ax=g1_list(self.g_ax, pos1),
            h_neg_ax=g2_list(self.h_ax, neg),
            h_pos_ax=g2_list(self.h_ax, pos),
        )

    # -- verifier elements ---------------------------------------------------
    # pcV touches only a handful of distinct h rows (h^{x^{-d+max}} for
    # max in {n, d}, h^alpha, h^{alpha x}) but is called 3m+4 times per
    # verify; each raw row read is 4 device->host transfers, so rows are
    # memoized per SRS instance (lazily attached — the dataclass is
    # frozen).

    def _h_cache(self) -> dict:
        cache = getattr(self, "_h_rows", None)
        if cache is None:
            cache = {}
            object.__setattr__(self, "_h_rows", cache)
        return cache

    def h_x_at(self, e: int):
        """h^(x^e) as host affine point (for pcV's h^{x^{-d+max}})."""
        cache = self._h_cache()
        key = ("x", e)
        if key not in cache:
            if self.h_x is None:
                raise ValueError(
                    f"SRS(h_mode='verifier') holds no h^(x^{e}) row; "
                    "regenerate with this circuit size in n_hints"
                )
            cache[key] = _g2_row_to_host(self.h_x, e + self.d)
        return cache[key]

    def h_ax_at(self, e: int):
        cache = self._h_cache()
        key = ("ax", e)
        if key not in cache:
            if self.h_ax is None:
                raise ValueError(
                    f"SRS(h_mode='verifier') holds no h^(alpha x^{e}) row"
                )
            cache[key] = _g2_row_to_host(self.h_ax, e + self.d)
        return cache[key]


def _bcast_affine(a: Affine, n: int) -> Affine:
    return Affine(
        jnp.broadcast_to(a.x, (n,) + a.x.shape),
        jnp.broadcast_to(a.y, (n,) + a.y.shape),
        jnp.broadcast_to(jnp.asarray(a.inf), (n,)),
    )


def _g2_row_to_host(tab: Affine, idx: int):
    if bool(np.asarray(tab.inf[idx])):
        return None
    x0 = int(FQ.to_int(ext.c0(tab.x[idx])))
    x1 = int(FQ.to_int(ext.c1(tab.x[idx])))
    y0 = int(FQ.to_int(ext.c0(tab.y[idx])))
    y1 = int(FQ.to_int(ext.c1(tab.y[idx])))
    return ((x0, x1), (y0, y1))


def g1_row_to_host(tab: Affine, idx: int):
    if bool(np.asarray(tab.inf[idx])):
        return None
    return (int(FQ.to_int(tab.x[idx])), int(FQ.to_int(tab.y[idx])))
