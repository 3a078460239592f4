"""Short-sequence fused attention (Pallas TPU).

VL-PET sequences are tiny (≤104 joint tokens, ≤600 for video QA), so a whole
(L, S) attention matrix per head fits comfortably in VMEM — no flash-style
tiling needed. This kernel fuses QK^T → +mask → softmax → ·V per (batch)
program, keeping the fp32 logits entirely on-chip; XLA's default lowering
round-trips the (B, H, L, S) logits through HBM and inserts layout copies
(see PERF.md). Measured 2.40 ms vs 3.76 ms XLA at the flagship encoder shape
(B=500, L=S=56, H=12, Dh=64) on v5e.

Layout: q, k, v are (B, L, H·Dh) — the natural projection output, so no
(B, L, H, Dh) ↔ (B, H, L, Dh) transposes are ever materialized. The head
loop is unrolled inside the kernel. ``mask`` is additive, shape
(B, 1, L, S) or per-head (B, H, L, S) (T5 relative bias).

Gradients: jax.custom_vjp with the backward = VJP of the identical jnp
reference (recompute), so training gets the fast forward and a standard XLA
backward.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(num_heads: int, head_dim: int, per_head_mask: bool,
            q_ref, k_ref, v_ref, mask_ref, out_ref):
    shared_mask = None
    if not per_head_mask:
        shared_mask = mask_ref[0, 0].astype(jnp.float32)  # (L, S)
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        mask = shared_mask if shared_mask is not None \
            else mask_ref[0, h].astype(jnp.float32)
        s = s + mask
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        o = jnp.dot(p, v, preferred_element_type=jnp.float32)
        out_ref[0, :, sl] = o.astype(out_ref.dtype)


def _pallas_attention(q: Array, k: Array, v: Array, mask: Array,
                      num_heads: int, *, interpret: bool = False) -> Array:
    B, L, inner = q.shape
    S = k.shape[1]
    head_dim = inner // num_heads
    Hm = mask.shape[1]
    per_head = Hm == num_heads and num_heads > 1
    ms = pl.ANY if interpret else pltpu.VMEM
    spec_q = pl.BlockSpec((1, L, inner), lambda b: (b, 0, 0), memory_space=ms)
    spec_kv = pl.BlockSpec((1, S, inner), lambda b: (b, 0, 0), memory_space=ms)
    bidx = (lambda b: (b, 0, 0, 0)) if mask.shape[0] != 1 else (lambda b: (0, 0, 0, 0))
    spec_m = pl.BlockSpec((1, Hm, L, S), bidx, memory_space=ms)
    return pl.pallas_call(
        functools.partial(_kernel, num_heads, head_dim, per_head),
        grid=(B,),
        in_specs=[spec_q, spec_kv, spec_kv, spec_m],
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((B, L, inner), q.dtype),
        interpret=interpret,
    )(q, k, v, mask)


def fused_attention_reference(q, k, v, mask, num_heads):
    B, L, inner = q.shape
    S = k.shape[1]
    hd = inner // num_heads
    qh = q.reshape(B, L, num_heads, hd)
    kh = k.reshape(B, S, num_heads, hd)
    vh = v.reshape(B, S, num_heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32)
    s = s + mask.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, vh)
    return o.reshape(B, L, inner)


def _bwd_kernel(num_heads: int, head_dim: int, per_head_mask: bool,
                q_ref, k_ref, v_ref, mask_ref, do_ref,
                dq_ref, dk_ref, dv_ref):
    """Fused attention backward: recomputes p in VMEM and emits dq/dk/dv —
    no HBM round trips for the (L, S) intermediates."""
    shared_mask = None
    if not per_head_mask:
        shared_mask = mask_ref[0, 0].astype(jnp.float32)
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        do = do_ref[0, :, sl].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        mask = shared_mask if shared_mask is not None \
            else mask_ref[0, h].astype(jnp.float32)
        p = jax.nn.softmax(s + mask, axis=-1)
        # dv = p^T @ do
        dv = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # dp = do @ v^T ; ds = p * (dp - rowsum(dp*p))
        dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = jnp.dot(ds, k.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q.astype(jnp.float32),
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def _pallas_attention_bwd(q, k, v, mask, do, num_heads, *, interpret=False):
    B, L, inner = q.shape
    S = k.shape[1]
    head_dim = inner // num_heads
    Hm = mask.shape[1]
    per_head = Hm == num_heads and num_heads > 1
    ms = pl.ANY if interpret else pltpu.VMEM
    spec_q = pl.BlockSpec((1, L, inner), lambda b: (b, 0, 0), memory_space=ms)
    spec_kv = pl.BlockSpec((1, S, inner), lambda b: (b, 0, 0), memory_space=ms)
    bidx = (lambda b: (b, 0, 0, 0)) if mask.shape[0] != 1 else (lambda b: (0, 0, 0, 0))
    spec_m = pl.BlockSpec((1, Hm, L, S), bidx, memory_space=ms)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads, head_dim, per_head),
        grid=(B,),
        in_specs=[spec_q, spec_kv, spec_kv, spec_m, spec_q],
        out_specs=(spec_q, spec_kv, spec_kv),
        out_shape=(jax.ShapeDtypeStruct((B, L, inner), q.dtype),
                   jax.ShapeDtypeStruct((B, S, inner), k.dtype),
                   jax.ShapeDtypeStruct((B, S, inner), v.dtype)),
        interpret=interpret,
    )(q, k, v, mask, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_attention(q: Array, k: Array, v: Array, mask: Array,
                    num_heads: int) -> Array:
    """q (B, L, H·Dh) pre-scaled; k, v (B, S, H·Dh); mask additive
    (B|1, 1|H, L, S). Returns (B, L, H·Dh).

    NOTE: the mask is treated as non-differentiable (zero cotangent). True
    for every PET recipe (the T5 relative bias is frozen); disable
    use_pallas_attention when fully fine-tuning T5's relative bias."""
    return _pallas_attention(q, k, v, mask, num_heads)


def _fwd(q, k, v, mask, num_heads):
    return _pallas_attention(q, k, v, mask, num_heads), (q, k, v, mask)


def _bwd(num_heads, res, do):
    q, k, v, mask = res
    dq, dk, dv = _pallas_attention_bwd(q, k, v, mask, do, num_heads)
    return dq, dk, dv, jnp.zeros_like(mask)


fused_attention.defvjp(_fwd, _bwd)
