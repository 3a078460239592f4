"""Counter-based dropout masks for Pallas kernels (and their tests).

``keep_mask`` hashes the GLOBAL element index with a murmur3 finalizer, so
a kernel's backward regenerates the forward's exact mask from (seed, index)
without ever storing it — and a test can compute the identical mask with
plain jnp ops outside the kernel. (The dedicated TPU PRNG primitives
``pltpu.prng_*`` have no interpret-mode lowering, which would leave kernel
dropout untestable on CPU.)

P(keep) = 1 - rate, decided on 31 bits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def keep_mask(shape, row_base, seed, rate: float) -> Array:
    """Boolean keep mask of ``shape``; element identity = global flat index
    where dim 0 is offset by ``row_base`` (the grid program's row offset)."""
    idx = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) \
        + row_base.astype(jnp.uint32)
    for d in range(1, len(shape)):
        idx = idx * jnp.uint32(shape[d]) \
            + jax.lax.broadcasted_iota(jnp.uint32, shape, d)
    z = idx * jnp.uint32(2654435761) + seed.astype(jnp.uint32)
    z = z ^ (z >> 16)
    z = z * jnp.uint32(0x7FEB352D)
    z = z ^ (z >> 15)
    z = z * jnp.uint32(0x846CA68B)
    z = z ^ (z >> 16)
    thr = jnp.uint32(int(rate * (1 << 31)))
    return (z & jnp.uint32(0x7FFFFFFF)) >= thr


def module_hash_dropout(mod, x: Array, rate: float,
                        deterministic: bool) -> Array:
    """``nn.Dropout`` drop-in for flax modules (draws mod.make_rng('dropout')
    only when active) — no (B, L, D) rng-bit-generator tensor."""
    if deterministic or rate == 0.0:
        return x
    return hash_dropout_key(x, mod.make_rng("dropout"), float(rate))


def hash_dropout_key(x: Array, key, rate: float) -> Array:
    """hash_dropout with the scalar seed derived from a flax PRNG key
    (drop-in for ``nn.Dropout`` call sites: pass ``self.make_rng('dropout')``).
    Caller gates on deterministic/rate."""
    seed = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)
    return hash_dropout(x, seed, rate)


def hash_dropout(x: Array, seed, rate: float) -> Array:
    """jnp-level dropout from the hash mask, for sites OUTSIDE Pallas
    kernels (e.g. T5's residual ``x + dropout(y)``): XLA fuses the integer
    hash into the surrounding elementwise fusion, so no (B, L, D)
    rng-bit-generator tensor is materialized (~2 ms/step at flagship T5
    shapes). ``seed`` is a scalar int32/uint32 (one per call site/step)."""
    keep = keep_mask(x.shape, jnp.uint32(0), seed, rate)
    scale = jnp.asarray(1.0 / (1.0 - rate), x.dtype)
    return jnp.where(keep, x * scale, jnp.zeros_like(x))
