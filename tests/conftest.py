"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
tests run without TPU hardware (the standard JAX substitute for a cluster).

Note: in this image a TPU plugin ('axon') overrides JAX_PLATFORMS, so the
platform must be pinned via jax.config before any backend is initialized.
"""

import os

import jax

# Hardware lane: VLPET_TESTS_ON_TPU=1 skips the CPU pin so the
# @hardware-marked tests (tests/test_tpu_hardware.py) run on the real chip:
#   VLPET_TESTS_ON_TPU=1 python -m pytest tests/test_tpu_hardware.py -q
# In the default (CPU) suite those tests self-skip.
_ON_TPU = os.environ.get("VLPET_TESTS_ON_TPU") == "1"

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8").strip()

    # Default matmul precision is bf16-style (TPU MXU semantics) — right for
    # production, wrong for golden-value parity tests. Pin fp32 under pytest.
    jax.config.update("jax_default_matmul_precision", "float32")

    # Persistent compile cache for the CPU suite: XLA:CPU compiles dominate
    # the suite's wall-clock on this 1-core host, and they are identical
    # across runs (same shapes, same fp32 pin). Keyed on backend+flags+jax
    # version, so it never collides with the TPU cache (/tmp/vlpet_jax_cache,
    # different dir anyway). First run populates; repeat runs skip every
    # compile over 1 s.
    jax.config.update("jax_compilation_cache_dir", "/tmp/vlpet_cpu_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
