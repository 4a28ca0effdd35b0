"""Benchmark runner — prints ONE JSON line with the headline metric.

Headline: G1 MSM throughput (points/s/chip) — the prover's dominant kernel
(every commit/open is an MSM; reference CommitmentScheme.hs:26-29,45-48).
vs_baseline is the speedup over the host golden implementation measured in
the same run (the stand-in for the reference's serial CPU fold — the
reference publishes no numbers, BASELINE.md).

Usage: python bench.py            (full benchmark, sized by platform)
       python bench.py --quick    (tiny shapes, smoke test)
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-sonic")

import jax
import jax.numpy as jnp
import numpy as np


def _device_msm_rate(n: int, iters: int) -> float:
    from sonic_tpu.curve.group import g1
    from sonic_tpu.fields.limb import FQ, FR
    from sonic_tpu.msm.pippenger import msm
    from sonic_tpu.golden_protocol import P

    rng = np.random.default_rng(42)

    # Points: batched scalar-mul ladder of the generator by random scalars
    # (device compute); scalars: fresh randoms in standard limb form.
    pt_scalars = [int(x) for x in rng.integers(1, 1 << 63, size=n)]
    gen = g1.from_affine(
        _bcast(g1.generator(), n)
    )
    pts = g1.to_affine(g1.scalar_mul(gen, _std_limbs(pt_scalars, FR)))
    jax.block_until_ready(pts.x)

    msm_scalars = _std_limbs(
        [int(rng.integers(1, 1 << 62)) * int(rng.integers(1, 1 << 62)) % P for _ in range(n)],
        FR,
    )

    # Warmup (compile)
    out = msm(g1, pts, msm_scalars)
    jax.block_until_ready((out.x, out.y, out.z))

    t0 = time.perf_counter()
    for _ in range(iters):
        out = msm(g1, pts, msm_scalars)
        jax.block_until_ready((out.x, out.y, out.z))
    dt = time.perf_counter() - t0
    return n * iters / dt


def _host_msm_rate(n_sample: int) -> float:
    """Golden (Python-int) MSM rate: serial fold of scalar-mult + add,
    the same shape of work as the reference's commitPoly fold."""
    from sonic_tpu import golden as gc
    from sonic_tpu.golden_protocol import P

    rng = np.random.default_rng(7)
    scalars = [int(rng.integers(1, 1 << 62)) for _ in range(n_sample)]
    pts = [gc.g1_mul(gc.G1_GEN, 3 + i) for i in range(n_sample)]
    t0 = time.perf_counter()
    acc = None
    for s, p in zip(scalars, pts):
        acc = gc.g1_add(acc, gc.g1_mul(p, s * 12345 % P))
    dt = time.perf_counter() - t0
    return n_sample / dt


def _std_limbs(vals, spec):
    from sonic_tpu.fields import limb

    return limb.from_mont(spec.from_int(vals), spec)


def _bcast(a, n):
    from sonic_tpu.curve.group import Affine

    return Affine(
        jnp.broadcast_to(a.x, (n,) + a.x.shape),
        jnp.broadcast_to(a.y, (n,) + a.y.shape),
        jnp.broadcast_to(jnp.asarray(a.inf), (n,)),
    )


def main() -> None:
    quick = "--quick" in sys.argv
    platform = jax.devices()[0].platform
    if quick:
        n, iters = 1 << 10, 1
    elif platform == "tpu":
        n, iters = 1 << 16, 3
    else:
        n, iters = 1 << 12, 1

    device_rate = _device_msm_rate(n, iters)
    host_rate = _host_msm_rate(128)

    print(
        json.dumps(
            {
                "metric": f"msm_g1_points_per_s_per_chip_n{n}_{platform}",
                "value": round(device_rate, 1),
                "unit": "points/s",
                "vs_baseline": round(device_rate / host_rate, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
