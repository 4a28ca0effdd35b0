"""Test configuration: run everything on CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import random

import jax
import pytest

from sonic_tpu.utils.cache import configure_jax_cache

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU here.
jax.config.update("jax_platforms", "cpu")
# Machine-keyed cache dir: XLA:CPU AOT entries embed the compile machine's
# CPU features and must never be loaded on a different host (VERDICT r4
# weak #4 — cross-machine cache reuse produced loader errors everywhere).
# Persist nearly everything: a warm CPU run otherwise re-pays ~70 s of
# sub-threshold recompiles (900+ small programs), and the threshold never
# prevented the known spurious prefer-no-scatter reloads anyway (that
# program compiles in >2 s regardless).
configure_jax_cache(min_compile_secs=0.15)


@pytest.fixture
def rng():
    return random.Random(1337)
