"""In-place KV-cache slot write (Pallas).

`jax.lax.dynamic_update_slice` on the (N, L, H, Dh) decode cache inside the
generation while-loop makes XLA copy the ENTIRE buffer every step on TPU
(layout conflict between the loop carry and the attention consumer) —
profiled at ~0.5 ms per buffer per step on the flagship config, 12 buffers
deep = ~6 ms/step of pure copy (PERF.md). This kernel aliases the cache
in-place and DMAs only the single (N, 1, H, Dh) time slot, so per-step
write traffic drops from 2x the full cache to just the new slot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _update_kernel(pos_ref, new_ref, cache_ref, out_ref, sem):
    """cache/out are the SAME HBM buffer (aliased). Copy the new slot in."""
    del cache_ref  # aliased with out_ref; reads would race the write anyway
    pos = pos_ref[0]
    dma = pltpu.make_async_copy(new_ref, out_ref.at[:, pl.ds(pos, 1)], sem)
    dma.start()
    dma.wait()


def cache_slot_update(cache: Array, new: Array, pos) -> Array:
    """Write `new` (N, H, Dh) into cache (N, L, H, Dh) at time slot `pos`,
    in place (the input buffer is donated/aliased). Returns the cache."""
    n, l, h, d = cache.shape
    new = new.reshape(n, 1, h, d)
    return pl.pallas_call(
        _update_kernel,
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # pos
            pl.BlockSpec(memory_space=pltpu.VMEM),   # new slot
            pl.BlockSpec(memory_space=pltpu.ANY),    # cache (stays in HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(jnp.asarray(pos, jnp.int32).reshape(1), new.astype(cache.dtype), cache)
