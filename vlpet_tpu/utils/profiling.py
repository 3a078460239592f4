"""Profiling + timing helpers (the reference had none — SURVEY.md §5).

* ``trace(logdir)`` — context manager around jax.profiler.trace
* ``StepTimer`` — examples/sec with a device-sync fetch
* ``device_sync(x)`` — reliable synchronization: a host readback of a scalar
  derived from x (block_until_ready can return early on the tunneled 'axon'
  platform, so a data-dependent fetch is the only trustworthy barrier).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp


def device_sync(tree: Any) -> float:
    """Force execution of everything `tree` depends on; returns a scalar."""
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "dtype")]
    if not leaves:
        return 0.0
    leaf = leaves[0]
    return float(jnp.asarray(leaf).astype(jnp.float32).ravel()[0])


@contextlib.contextmanager
def trace(logdir: str = "/tmp/vlpet_trace"):
    with jax.profiler.trace(logdir):
        yield
    print(f"profile written to {logdir}")


class StepTimer:
    """Throughput meter; call .step(batch_size) per step and .rate() to read."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.examples = 0
        self.steps = 0

    def step(self, batch_size: int):
        self.examples += batch_size
        self.steps += 1

    def rate(self, sync_tree: Optional[Any] = None) -> float:
        if sync_tree is not None:
            device_sync(sync_tree)
        dt = time.perf_counter() - self.t0
        return self.examples / max(dt, 1e-9)

    def reset(self):
        self.t0 = time.perf_counter()
        self.examples = 0
        self.steps = 0
