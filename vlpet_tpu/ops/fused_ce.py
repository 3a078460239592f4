"""Fused linear + cross-entropy (Pallas TPU): loss straight from the decoder
states, the (B, T, V) logits never touch HBM.

The vocab projection feeds only the CE loss inside the train step, yet the
XLA path materializes the fp32 (500, 10, 50265) logits (~1 GB) plus the
log-softmax/subtract intermediates — ~10 ms of the flagship step (PERF.md).
This kernel streams vocab tiles through VMEM with an online logsumexp
(flash-style), emitting per-token losses; the backward recomputes each tile
and accumulates dx = (softmax - onehot) @ W.

FROZEN-HEAD contract: W (the tied `shared` embedding) and the bias get zero
cotangents — valid whenever the lm head is frozen, which every published
VL-PET recipe satisfies (freezing.py: `shared` trains only under
--unfreeze_language_model / --unfreeze_lm_head). models/vlbart.py selects
this path statically from those flags.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

TV = 4096    # vocab tile
NEG = -1e30


def pick_row_tile(N: int, cap: int = 1024):
    """Largest divisor of N that is a multiple of 8 (Mosaic sublane
    constraint) and <= cap; None if N has no such divisor (callers fall
    back to the dense CE path)."""
    best = None
    for t in range(8, min(cap, N) + 1, 8):
        if N % t == 0:
            best = t
    return best


def _fwd_kernel(V: int, x_ref, w_ref, b_ref, lab_ref,
                loss_ref, lse_ref, m_s, s_s, lab_s):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, NEG)
        s_s[:] = jnp.zeros_like(s_s)
        lab_s[:] = jnp.zeros_like(lab_s)

    logits = jax.lax.dot_general(x_ref[:], w_ref[:],
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    logits = logits + b_ref[0].astype(jnp.float32)[None, :]
    tn, tv = logits.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (tn, tv), 1) + j * tv
    logits = jnp.where(col < V, logits, NEG)

    m_old = m_s[:]
    m_new = jnp.maximum(m_old, jnp.max(logits, axis=1, keepdims=True))
    s_s[:] = (s_s[:] * jnp.exp(m_old - m_new)
              + jnp.sum(jnp.exp(logits - m_new), axis=1, keepdims=True))
    m_s[:] = m_new
    labels = lab_ref[:]  # (TN, 1) int32
    lab_s[:] = lab_s[:] + jnp.sum(
        jnp.where(col == labels, logits, 0.0), axis=1, keepdims=True)

    @pl.when(j == nj - 1)
    def _():
        lse = m_s[:] + jnp.log(s_s[:])
        valid = labels >= 0
        loss_ref[:] = jnp.where(valid, lse - lab_s[:], 0.0)
        lse_ref[:] = lse


def _bwd_kernel(V: int, x_ref, w_ref, b_ref, lab_ref, lse_ref, dl_ref,
                dx_ref, acc_s):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_s[:] = jnp.zeros_like(acc_s)

    logits = jax.lax.dot_general(x_ref[:], w_ref[:],
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    logits = logits + b_ref[0].astype(jnp.float32)[None, :]
    tn, tv = logits.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (tn, tv), 1) + j * tv
    logits = jnp.where(col < V, logits, NEG)
    p = jnp.exp(logits - lse_ref[:])  # (TN, TV)
    labels = lab_ref[:]
    onehot = (col == labels).astype(jnp.float32)
    scale = jnp.where(labels >= 0, dl_ref[:], 0.0)  # (TN, 1)
    g = ((p - onehot) * scale).astype(x_ref.dtype)
    # the final vocab tile reads W past row V (undefined memory): zero those
    # rows or 0-weight x NaN poisons the dx accumulation
    row_ok = (jax.lax.broadcasted_iota(jnp.int32, w_ref.shape, 0)
              + j * w_ref.shape[0]) < V
    wblk = jnp.where(row_ok, w_ref[:], 0).astype(x_ref.dtype)
    acc_s[:] = acc_s[:] + jax.lax.dot_general(
        g, wblk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        dx_ref[:] = acc_s[:].astype(dx_ref.dtype)


def _run_fwd(x, w, b, labels, *, interpret=False):
    N, D = x.shape
    V = w.shape[0]
    tn = pick_row_tile(N) if not interpret else (pick_row_tile(N) or N)
    assert tn is not None, f"N={N} has no x8 row tile; use the dense path"
    ms = pl.ANY if interpret else pltpu.VMEM
    grid = (N // tn, pl.cdiv(V, TV))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, V),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, D), lambda i, j: (i, 0), memory_space=ms),
            pl.BlockSpec((TV, D), lambda i, j: (j, 0), memory_space=ms),
            pl.BlockSpec((1, TV), lambda i, j: (0, j), memory_space=ms),
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0), memory_space=ms),
        ],
        out_specs=(
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0), memory_space=ms),
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0), memory_space=ms),
        ),
        out_shape=(jax.ShapeDtypeStruct((N, 1), jnp.float32),
                   jax.ShapeDtypeStruct((N, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((tn, 1), jnp.float32),
                        pltpu.VMEM((tn, 1), jnp.float32),
                        pltpu.VMEM((tn, 1), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w, b, labels)
    return out


def _run_bwd(x, w, b, labels, lse, dloss, *, interpret=False):
    N, D = x.shape
    V = w.shape[0]
    tn = pick_row_tile(N) if not interpret else (pick_row_tile(N) or N)
    assert tn is not None, f"N={N} has no x8 row tile; use the dense path"
    ms = pl.ANY if interpret else pltpu.VMEM
    grid = (N // tn, pl.cdiv(V, TV))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, V),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, D), lambda i, j: (i, 0), memory_space=ms),
            pl.BlockSpec((TV, D), lambda i, j: (j, 0), memory_space=ms),
            pl.BlockSpec((1, TV), lambda i, j: (0, j), memory_space=ms),
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0), memory_space=ms),
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0), memory_space=ms),
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0), memory_space=ms),
        ],
        out_specs=pl.BlockSpec((tn, D), lambda i, j: (i, 0), memory_space=ms),
        out_shape=jax.ShapeDtypeStruct((N, D), x.dtype),
        scratch_shapes=[pltpu.VMEM((tn, D), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w, b, labels, lse, dloss)


@jax.custom_vjp
def fused_linear_ce(x: Array, w: Array, b: Array, labels: Array) -> Array:
    """Per-token CE of softmax(x @ w^T + b) vs labels, ignore_index=-100.

    x: (N, D) activations (bf16/fp32); w: (V, D); b: (V,); labels: (N,) int.
    Returns (N,) fp32 losses, 0 at ignored positions. W and b receive ZERO
    cotangents (frozen-head contract — see module docstring)."""
    loss, _ = _run_fwd(x, w.astype(x.dtype), b.reshape(1, -1),
                       labels.reshape(-1, 1).astype(jnp.int32))
    return loss[:, 0]


def _vjp_fwd(x, w, b, labels):
    wc = w.astype(x.dtype)
    loss, lse = _run_fwd(x, wc, b.reshape(1, -1),
                         labels.reshape(-1, 1).astype(jnp.int32))
    return loss[:, 0], (x, wc, b, labels, lse)


def _vjp_bwd(res, dloss):
    x, wc, b, labels, lse = res
    dx = _run_bwd(x, wc, b.reshape(1, -1),
                  labels.reshape(-1, 1).astype(jnp.int32), lse,
                  dloss.reshape(-1, 1).astype(jnp.float32))
    # frozen-head contract: zero cotangents for w/b (DCE'd when, as in every
    # published recipe, they are not differentiated at all)
    return dx, jnp.zeros_like(wc), jnp.zeros_like(b), None


fused_linear_ce.defvjp(_vjp_fwd, _vjp_bwd)


def fused_linear_ce_reference(x, w, b, labels):
    logits = (x.astype(jnp.float32) @ w.astype(jnp.float32).T
              + b.astype(jnp.float32))
    logp = jax.nn.log_softmax(logits, axis=-1)
    safe = jnp.where(labels >= 0, labels, 0)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    return jnp.where(labels >= 0, nll, 0.0)
