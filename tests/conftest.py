"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
tests run without TPU hardware (the standard JAX substitute for a cluster).

Note: in this image a TPU plugin ('axon') overrides JAX_PLATFORMS, so the
platform must be pinned via jax.config before any backend is initialized.
"""

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    import os
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()

# Default matmul precision is bf16-style (TPU MXU semantics) — right for
# production, wrong for golden-value parity tests. Pin fp32 under pytest.
jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
