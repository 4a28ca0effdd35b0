"""Machine-keyed JAX compilation-cache location.

The persistent compilation cache stores XLA:CPU AOT results that embed the
*compile* machine's CPU feature set; loading them on a host with different
features is rejected (or worse, risks SIGILL — the loader warns exactly
that). Benchmarks run on the TPU-tunnel host while tests/dryruns may run
elsewhere, so one shared cache directory poisons every other machine's
runs with feature-mismatch errors. Key the directory by a fingerprint of
the local CPU instead: each machine warms and reuses only its own entries.

No counterpart in the reference (it has no compile cache); this is
TPU-framework operational hygiene.
"""
from __future__ import annotations

import hashlib
import os
import platform


def machine_fingerprint() -> str:
    """Short stable hash of the host's CPU feature set + arch."""
    parts = [platform.machine(), platform.system()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    parts.append(line.strip())
                    break
    except OSError:
        parts.append(platform.processor() or "unknown")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def cache_dir(base: str = "/root/.cache/jax-sonic") -> str:
    """Machine-keyed compilation cache directory (honors an explicit
    JAX_COMPILATION_CACHE_DIR already present in the environment)."""
    explicit = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if explicit:
        return explicit
    return f"{base}-{machine_fingerprint()}"


def configure_jax_cache(min_compile_secs: float = 0.1) -> str:
    """Point jax's persistent compilation cache at the machine-keyed dir.

    Must run after `import jax` but before any compilation. Returns the
    directory used.

    min_compile_secs: persistence threshold. Keep it low everywhere: a
    warm CPU dryrun/test run otherwise re-pays ~70 s of sub-threshold
    recompiles (900+ small programs per mesh prove). Known cosmetic
    quirk: XLA:CPU stamps scatter/gather programs with
    +prefer-no-scatter/+prefer-no-gather target features that its own
    AOT loader then rejects as "unsupported by the host" (spurious —
    they are tuning flags, not CPU features); those few entries log an
    error and recompile, which no threshold value avoids (the big
    scatter program compiles in >2 s regardless).
    """
    import jax

    path = cache_dir()
    os.environ["JAX_COMPILATION_CACHE_DIR"] = path
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    # Pallas kernels serialize their MLIR with full-traceback locations
    # into the tpu_custom_call backend_config. The persistent-cache key
    # canonicalizes (strips debug info from) the OUTER module but cannot
    # reach inside that opaque payload, so caller file:line drift — a
    # different bench phase, an edited script — changes the key and
    # forces a full recompile of every pallas-bearing program (measured:
    # the ~320 s fused-prover compile re-paid per bench variant).
    # Single-frame locations point at the kernel source itself, which is
    # stable across callers. SONIC_TPU_FULL_LOCS=1 restores full
    # tracebacks for debugging.
    if not os.environ.get("SONIC_TPU_FULL_LOCS"):
        jax.config.update("jax_include_full_tracebacks_in_locations", False)
    return path
