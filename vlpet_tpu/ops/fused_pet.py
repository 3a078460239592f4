"""Fused VL-PET encoder epilogue as a Pallas TPU kernel.

Computes, in one VMEM pass over row tiles:

    y = (h + gelu_new(h·Wd + bd)·Wu + bu) * sigmoid(gelu_new(x·Gd + bgd)·Gu + bgu)

i.e. the multihead-down adapter (already fused to a single (d, r) GEMM) plus
the VL-PET-large granularity gate — the per-sublayer hook chain of
my_transformers/modeling_bart.py:1149-1209 — without materializing the
adapter/gate intermediates in HBM. All six weight matrices stay resident in
VMEM across the row grid; each (TILE_M, d) tile of h/x is read once and y
written once.

Gradients: the op is exposed through jax.custom_vjp whose backward is the
VJP of the identical pure-jnp reference (rematerialized), so training uses
the fast forward and a standard XLA backward.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

TILE_M = 512


def _gelu_new(x):
    return jax.nn.gelu(x, approximate=True)


def _reference(h, x, Wd, bd, Wu, bu, Gd, bgd, Gu, bgu):
    """Pure-jnp reference (identical math, used for backward + testing)."""
    z = _gelu_new(h @ Wd + bd)
    adapter = z @ Wu + bu
    g = _gelu_new(x @ Gd + bgd)
    gate = jax.nn.sigmoid(g @ Gu + bgu)
    return (h + adapter) * gate


def _kernel(h_ref, x_ref, wd_ref, bd_ref, wu_ref, bu_ref,
            gd_ref, bgd_ref, gu_ref, bgu_ref, out_ref):
    h = h_ref[:]
    x = x_ref[:]
    z = jnp.dot(h, wd_ref[:], preferred_element_type=jnp.float32)
    z = _gelu_new(z + bd_ref[:].astype(jnp.float32))
    adapter = jnp.dot(z.astype(h.dtype), wu_ref[:],
                      preferred_element_type=jnp.float32)
    adapter = adapter + bu_ref[:].astype(jnp.float32)
    g = jnp.dot(x, gd_ref[:], preferred_element_type=jnp.float32)
    g = _gelu_new(g + bgd_ref[:].astype(jnp.float32))
    gate = jnp.dot(g.astype(x.dtype), gu_ref[:],
                   preferred_element_type=jnp.float32)
    gate = jax.nn.sigmoid(gate + bgu_ref[:].astype(jnp.float32))
    out_ref[:] = ((h.astype(jnp.float32) + adapter) * gate).astype(out_ref.dtype)


def _pallas_forward(h, x, Wd, bd, Wu, bu, Gd, bgd, Gu, bgu, *, interpret=False):
    M, d = h.shape
    r = Wd.shape[1]
    g_dim = Gd.shape[1]
    grid = (pl.cdiv(M, TILE_M),)
    row_spec = pl.BlockSpec((TILE_M, d), lambda i: (i, 0),
                            memory_space=pl.ANY if interpret else pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pl.ANY if interpret else pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[row_spec, row_spec,
                  full((d, r)), full((r,)), full((r, d)), full((d,)),
                  full((d, g_dim)), full((g_dim,)), full((g_dim, d)), full((d,))],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((M, d), h.dtype),
        interpret=interpret,
    )(h, x, Wd, bd, Wu, bu, Gd, bgd, Gu, bgu)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_multihead_adapter_gate(h, x, Wd, bd, Wu, bu, Gd, bgd, Gu, bgu):
    """y = (h + MH-adapter(h)) · σ(lowrank-gate(x)); h/x: (M, d)."""
    return _pallas_forward(h, x, Wd, bd, Wu, bu, Gd, bgd, Gu, bgu)


def _fwd(h, x, Wd, bd, Wu, bu, Gd, bgd, Gu, bgu):
    y = _pallas_forward(h, x, Wd, bd, Wu, bu, Gd, bgd, Gu, bgu)
    return y, (h, x, Wd, bd, Wu, bu, Gd, bgd, Gu, bgu)


def _bwd(res, dy):
    # backward = VJP of the identical jnp reference (recompute; standard remat)
    _, vjp = jax.vjp(_reference, *res)
    return vjp(dy)


fused_multihead_adapter_gate.defvjp(_fwd, _bwd)


def fused_epilogue_reference(h, x, Wd, bd, Wu, bu, Gd, bgd, Gu, bgu):
    return _reference(h, x, Wd, bd, Wu, bu, Gd, bgd, Gu, bgu)
