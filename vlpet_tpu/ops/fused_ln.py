"""Fused residual dropout + add + LayerNorm (Pallas TPU), fwd + bwd.

The post-LN transformer pattern ``LN(residual + dropout(h))`` appears 30
times per flagship step (2×6 encoder + 3×6 decoder sublayers). XLA's
lowering materializes, per site: the u32 rng tensor (rng-bit-generator,
~0.5 ms each at encoder shapes), the bool keep-mask saved for the backward,
an extra bf16 copy of the normalized input, and f32 mean/var — ~6 ms/step
of HBM-bound loop fusions + 2 ms of rng (hlo_stats, PERF.md).

This kernel reads h and residual once, computes the dropout mask from a
counter-based hash (murmur3 finalizer over the element index — regenerated
in the backward from the same seed, so NOTHING is saved except what autodiff
already keeps alive), normalizes in fp32 in-register, and writes only y.
The backward recomputes mask/mean/rstd and emits dh, dresidual, dgamma,
dbeta in one pass (dgamma/dbeta accumulate across the sequential grid).

Layout: h, residual (B, L, D); gamma/beta (D,) fp32 (flax param layout).
Two block layouts, same math and the same element-indexed hash mask:
the FLAT kernels (default — faster at flagship shapes too, 4797.7 vs
4645.2 ex/s A/B) grid over the (B·L, D) row view with (R, D) blocks,
which fit at any sequence length (LayerNorm is per-row, so the
batch/sequence split is irrelevant to the math and the global flat index
is unchanged); the 3-D kernels tile the batch dim with (tb, L, D) blocks
and remain for shapes flat can't block (odd B·L, or D not a lane
multiple, with a blockable batch dim).

Reference behavior: dropout-then-post-LN chain of
my_transformers/modeling_bart.py:1122-1388 (flax: nn.Dropout + nn.LayerNorm
with force_float32_reductions + fast variance).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# tests monkeypatch to run in interpreter mode on CPU
_INTERPRET = False


def _block_rows(B: int, cap: int = 16) -> int:
    for tb in range(min(cap, B), 0, -1):
        if B % tb == 0:
            return tb
    return 1


# Mosaic's scoped-vmem stack limit (see ops/attention.py)
_VMEM_LIMIT = 16 * 1024 * 1024


def _fit_rows(B: int, L: int, D: int) -> int:
    """Largest batch-row block whose backward working set fits the
    scoped-vmem stack, from an affine model fitted to two hardware
    measurements at (tb, 604, 768) f32 (the video-QA CLI shapes, r3 bug):
    38.93M at tb=4 and 20.28M at tb=1 → usage ≈ (7.6 + 3.4·tb)·L·D·4
    (the constant is Mosaic's block double-buffering + reduction stack).
    Flagship (B=500, L=56) keeps tb=10 with ~2x headroom; L≈604 solves to
    tb<1 → 0, and callers fall back to the jnp chain."""
    budget = int(_VMEM_LIMIT * 0.9) / (L * D * 4)
    tb_max = int((budget - 7.6) / 3.4)
    return _block_rows(B, cap=min(16, tb_max)) if tb_max >= 1 else 0


def _flat_rows(N: int, D: int) -> int:
    """Row block for the FLAT kernels (grid over the B·L rows of the
    (N, D) view — LayerNorm is per-row, so the batch/sequence split is
    irrelevant to the math). Long sequences blow the 3-D kernels' stack
    because their block carries L whole (the affine model's 7.6·L·D·4
    constant); a flat block carries only R rows, so ANY length fits once
    B·L has a multiple-of-8 divisor within budget. Budget reuses the
    3-D model's ~11 co-resident f32 block-copies at a 0.8 margin
    (verified on hardware at the video-QA shapes, PERF.md)."""
    if D % 128 != 0:
        return 0  # (R, D) blocks need lane-multiple D (Mosaic tiling rule)
    cap = int((_VMEM_LIMIT * 0.8) // (11 * D * 4))
    best = 0
    r = 8
    while r <= min(cap, N):
        if N % r == 0:
            best = r
        r += 8
    # hardware-probed envelope (scripts/probe_flat_ln.py, 2026-08-19):
    # R = 16, 56, 200, 256, 320, AND 392 (the model's cap at D=768) all
    # compile and run — the 11-copy budget is confirmed across the full
    # legal range, not just at the two originally fitted shapes.
    if best:
        return best
    # No exact divisor (e.g. B·L = 50·113 = 5650, a single factor of 2):
    # the call sites zero-PAD the row view to a multiple of R and slice
    # back — padded rows produce garbage y (sliced off) and zero
    # dgamma/dbeta contributions (dy is zero-padded), and the hash mask
    # keys on the global row index so real rows keep their exact values.
    # This keeps EVERY D%128==0 shape on the flat kernels; before r4 such
    # shapes fell to the 3-D kernels, whose affine VMEM model — fitted at
    # L=604 — proved badly optimistic at other L on the current
    # toolchain (26.17M actual vs 14.4M modeled at (50, 113, 768) f32
    # tb=10, the tvqa video-CLI regression this padding fixes).
    return min((cap // 8) * 8, -(-N // 8) * 8)


def fused_ln_fits(B: int, L: int, D: int) -> bool:
    """False only when neither the 3-D batch-row kernels nor the flat
    row kernels can block the shape — callers then fall back to the jnp
    chain. Long sequences (video QA L≈604) take the flat path."""
    return _fit_rows(B, L, D) >= 1 or _flat_rows(B * L, D) >= 1


from vlpet_tpu.ops.hashdrop import keep_mask as _hash_keep_nd


def _hash_keep(shape, row_base, seed, rate: float):
    return _hash_keep_nd(shape, row_base, seed, rate)


def _stats(x, eps: float):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu)
    return mu, jax.lax.rsqrt(var + eps)


def _fwd_kernel(rate: float, eps: float, seed_ref, h_ref, res_ref, g_ref,
                b_ref, y_ref):
    tb = h_ref.shape[0]
    row_base = pl.program_id(0) * tb
    hf = h_ref[...].astype(jnp.float32)
    if rate > 0.0:
        keep = _hash_keep(h_ref.shape, row_base, seed_ref[0], rate)
        hf = jnp.where(keep, hf * (1.0 / (1.0 - rate)), 0.0)
    x = res_ref[...].astype(jnp.float32) + hf
    mu, rstd = _stats(x, eps)
    mul = rstd * g_ref[...].astype(jnp.float32)
    y = (x - mu) * mul + b_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_kernel(rate: float, eps: float, seed_ref, h_ref, res_ref, g_ref,
                dy_ref, dh_ref, dres_ref, dg_ref, db_ref):
    tb = h_ref.shape[0]
    pid = pl.program_id(0)
    row_base = pid * tb
    hf = h_ref[...].astype(jnp.float32)
    keep = None
    if rate > 0.0:
        keep = _hash_keep(h_ref.shape, row_base, seed_ref[0], rate)
        hf = jnp.where(keep, hf * (1.0 / (1.0 - rate)), 0.0)
    x = res_ref[...].astype(jnp.float32) + hf
    mu, rstd = _stats(x, eps)
    xhat = (x - mu) * rstd
    g = g_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    dxhat = dy * g
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    dres_ref[...] = dx.astype(dres_ref.dtype)
    if keep is not None:
        dh = jnp.where(keep, dx * (1.0 / (1.0 - rate)), 0.0)
    else:
        dh = dx
    dh_ref[...] = dh.astype(dh_ref.dtype)
    pg = jnp.sum(dy * xhat, axis=(0, 1))[None, None]  # (1, 1, D)
    pb = jnp.sum(dy, axis=(0, 1))[None, None]

    @pl.when(pid == 0)
    def _init():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    dg_ref[...] += pg
    db_ref[...] += pb


def _fwd_kernel_flat(rate: float, eps: float, seed_ref, h_ref, res_ref,
                     g_ref, b_ref, y_ref):
    """Flat-row forward: blocks are (R, D) slices of the (B·L, D) view.
    The hash mask's element identity — global flat index (b·L+l)·D+d —
    is IDENTICAL to the 3-D kernels' and the jnp reference's, so the two
    paths produce the same values for the same seed."""
    R = h_ref.shape[0]
    row_base = pl.program_id(0) * R
    hf = h_ref[...].astype(jnp.float32)
    if rate > 0.0:
        keep = _hash_keep(h_ref.shape, row_base, seed_ref[0], rate)
        hf = jnp.where(keep, hf * (1.0 / (1.0 - rate)), 0.0)
    x = res_ref[...].astype(jnp.float32) + hf
    mu, rstd = _stats(x, eps)
    mul = rstd * g_ref[...].astype(jnp.float32)
    y_ref[...] = ((x - mu) * mul + b_ref[...].astype(jnp.float32)) \
        .astype(y_ref.dtype)


def _bwd_kernel_flat(rate: float, eps: float, seed_ref, h_ref, res_ref,
                     g_ref, dy_ref, dh_ref, dres_ref, dg_ref, db_ref):
    R = h_ref.shape[0]
    pid = pl.program_id(0)
    row_base = pid * R
    hf = h_ref[...].astype(jnp.float32)
    keep = None
    if rate > 0.0:
        keep = _hash_keep(h_ref.shape, row_base, seed_ref[0], rate)
        hf = jnp.where(keep, hf * (1.0 / (1.0 - rate)), 0.0)
    x = res_ref[...].astype(jnp.float32) + hf
    mu, rstd = _stats(x, eps)
    xhat = (x - mu) * rstd
    dy = dy_ref[...].astype(jnp.float32)
    dxhat = dy * g_ref[...].astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    dres_ref[...] = dx.astype(dres_ref.dtype)
    if keep is not None:
        dh = jnp.where(keep, dx * (1.0 / (1.0 - rate)), 0.0)
    else:
        dh = dx
    dh_ref[...] = dh.astype(dh_ref.dtype)
    pg = jnp.sum(dy * xhat, axis=0)[None]  # (1, D)
    pb = jnp.sum(dy, axis=0)[None]

    @pl.when(pid == 0)
    def _init():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    dg_ref[...] += pg
    db_ref[...] += pb


def _flat_specs(D, R, ms):
    spec_row = pl.BlockSpec((R, D), lambda i: (i, 0), memory_space=ms)
    spec_vec = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=ms)
    spec_seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    return spec_row, spec_vec, spec_seed


def _pad_flat(x, Np):
    """Zero-pad the (N, D) row view to Np rows (see _flat_rows: the hash
    mask keys on the global row index, so real rows are unaffected; the
    padded rows' outputs are sliced off and their cotangents vanish)."""
    return x if x.shape[0] == Np else jnp.pad(x, ((0, Np - x.shape[0]),
                                                  (0, 0)))


def _fwd_call_flat(h, res, gamma, beta, seed, rate, eps, *, interpret=False):
    B, L, D = h.shape
    N = B * L
    R = _flat_rows(N, D)
    Np = -(-N // R) * R
    ms = pl.ANY if interpret else pltpu.VMEM
    spec_row, spec_vec, spec_seed = _flat_specs(D, R, ms)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel_flat, rate, eps),
        grid=(Np // R,),
        in_specs=[spec_seed, spec_row, spec_row, spec_vec, spec_vec],
        out_specs=spec_row,
        out_shape=jax.ShapeDtypeStruct((Np, D), h.dtype),
        interpret=interpret,
    )(seed, _pad_flat(h.reshape(N, D), Np), _pad_flat(res.reshape(N, D), Np),
      gamma.reshape(1, D), beta.reshape(1, D))
    return y[:N].reshape(B, L, D)


def _bwd_call_flat(h, res, gamma, seed, dy, rate, eps, *, interpret=False):
    B, L, D = h.shape
    N = B * L
    R = _flat_rows(N, D)
    Np = -(-N // R) * R
    ms = pl.ANY if interpret else pltpu.VMEM
    spec_row, spec_vec, spec_seed = _flat_specs(D, R, ms)
    dh, dres, dg, db = pl.pallas_call(
        functools.partial(_bwd_kernel_flat, rate, eps),
        grid=(Np // R,),
        in_specs=[spec_seed, spec_row, spec_row, spec_vec, spec_row],
        out_specs=(spec_row, spec_row, spec_vec, spec_vec),
        out_shape=(jax.ShapeDtypeStruct((Np, D), h.dtype),
                   jax.ShapeDtypeStruct((Np, D), res.dtype),
                   jax.ShapeDtypeStruct((1, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32)),
        interpret=interpret,
    )(seed, _pad_flat(h.reshape(N, D), Np), _pad_flat(res.reshape(N, D), Np),
      gamma.reshape(1, D), _pad_flat(dy.reshape(N, D), Np))
    return (dh[:N].reshape(B, L, D), dres[:N].reshape(B, L, D),
            dg.reshape(D), db.reshape(D))


def _specs(B, L, D, tb, ms):
    spec_row = pl.BlockSpec((tb, L, D), lambda b: (b, 0, 0), memory_space=ms)
    spec_vec = pl.BlockSpec((1, 1, D), lambda b: (0, 0, 0), memory_space=ms)
    spec_seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    return spec_row, spec_vec, spec_seed


def _fwd_call(h, res, gamma, beta, seed, rate, eps, *, interpret=False):
    B, L, D = h.shape
    if _flat_rows(B * L, D) >= 1:
        # DEFAULT: the flat-row kernels win at flagship shapes too
        # (4797.7 vs 4645.2 ex/s same-session A/B — PERF.md) and fit any
        # sequence length; the 3-D batch-row path below remains for
        # shapes flat can't block (odd B·L with a blockable batch dim)
        return _fwd_call_flat(h, res, gamma, beta, seed, rate, eps,
                              interpret=interpret)
    tb = _fit_rows(B, L, D)
    ms = pl.ANY if interpret else pltpu.VMEM
    spec_row, spec_vec, spec_seed = _specs(B, L, D, tb, ms)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, rate, eps),
        grid=(B // tb,),
        in_specs=[spec_seed, spec_row, spec_row, spec_vec, spec_vec],
        out_specs=spec_row,
        out_shape=jax.ShapeDtypeStruct((B, L, D), h.dtype),
        interpret=interpret,
    )(seed, h, res, gamma.reshape(1, 1, D), beta.reshape(1, 1, D))


def _bwd_call(h, res, gamma, seed, dy, rate, eps, *, interpret=False):
    B, L, D = h.shape
    if _flat_rows(B * L, D) >= 1:
        return _bwd_call_flat(h, res, gamma, seed, dy, rate, eps,
                              interpret=interpret)
    tb = _fit_rows(B, L, D)
    ms = pl.ANY if interpret else pltpu.VMEM
    spec_row, spec_vec, spec_seed = _specs(B, L, D, tb, ms)
    dh, dres, dg, db = pl.pallas_call(
        functools.partial(_bwd_kernel, rate, eps),
        grid=(B // tb,),
        in_specs=[spec_seed, spec_row, spec_row, spec_vec, spec_row],
        out_specs=(spec_row, spec_row, spec_vec, spec_vec),
        out_shape=(jax.ShapeDtypeStruct((B, L, D), h.dtype),
                   jax.ShapeDtypeStruct((B, L, D), res.dtype),
                   jax.ShapeDtypeStruct((1, 1, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1, D), jnp.float32)),
        interpret=interpret,
    )(seed, h, res, gamma.reshape(1, 1, D), dy)
    return dh, dres, dg.reshape(D), db.reshape(D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_dropout_add_ln(h: Array, res: Array, gamma: Array, beta: Array,
                         seed: Array, rate: float, eps: float) -> Array:
    """y = LayerNorm(res + dropout(h; rate)) with gamma/beta, fp32 stats.

    ``seed`` (1,) int32 determines the dropout mask (regenerated in the
    backward — no mask tensor is ever stored). gamma/beta receive true
    gradients (layer norms are trainable in the published recipes)."""
    return _fwd_call(h, res, gamma, beta, seed, rate, eps,
                     interpret=_INTERPRET)


def _vjp_fwd(h, res, gamma, beta, seed, rate, eps):
    y = _fwd_call(h, res, gamma, beta, seed, rate, eps, interpret=_INTERPRET)
    return y, (h, res, gamma, seed)


def _vjp_bwd(rate, eps, saved, dy):
    h, res, gamma, seed = saved
    dh, dres, dg, db = _bwd_call(h, res, gamma, seed, dy, rate, eps,
                                 interpret=_INTERPRET)
    return dh, dres, dg, db, None


fused_dropout_add_ln.defvjp(_vjp_fwd, _vjp_bwd)


def ln_supported(cfg) -> bool:
    """Kernel applicability: TPU backend + bf16 compute path (the kernel is
    a training-path optimization; CPU keeps the flax-equivalent chain)."""
    return jax.default_backend() not in ("cpu",)

