"""Exact fused top-k + logsumexp over the vocabulary — the beam/greedy
scoring reduction (models/generate.py topk_lse).

Why a kernel: the decode step needs, per logits row, (a) the EXACT top-k
values+indices (the reference's beam search uses torch.topk — exact; HF
transformers-4.2.1 beam_search) and (b) the row logsumexp. On this
toolchain the stock options each read the (B·K, V) logits from HBM at
least twice and none is exact at speed:

  * ``lax.top_k``: exact, 7.9 ms at (2500, 50265) k=10 — a 13x miss vs
    the ~0.6 ms HBM-read roofline (it's a sort-based custom call);
  * ``lax.approx_max_k(recall_target=0.99)``: 3.6 ms but only 96.4% of
    rows recover the exact top-10 set (measured 2026-08-20 — the r3
    "empirically exact" note no longer holds on jax 0.9.0, caught by the
    tests/test_tpu_hardware.py guard); higher recall targets cost the
    same as exact top_k;
  * ``logsumexp`` is a separate full HBM pass either way.

This kernel reads each logits row ONCE into VMEM (bf16 rows stay bf16 in
HBM — no upfront f32 cast materializes), then runs k iterations of
max → first-occurrence argmax → mask entirely in VMEM, plus one
exp-sum pass for the logsumexp. Tie semantics match lax.top_k (stable
descending sort = equal values surface in index order) because each
iteration masks only the FIRST occurrence of the maximum.

Feasibility: rows are viewed (R//rb, rb, V) with block (1, rb, V) — the
last-two block dims equal the array dims, so any rb dividing R is legal
(no 8x128 divisibility needed; same trick as ops/attention.py's
(tb, L, inner) blocks). rb is the largest divisor of R in [8, 16]:
below 8 the sublane dim risks Mosaic's size-1 broadcast limits, above 16
the f32 working set (x + masked copy + iota) crowds the 16 MB scoped-vmem
stack at V≈50k. Shapes with no such divisor (or k > 16, or V too small
to matter) fall back to exact lax.top_k.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# VMEM budget for one (rb, V) f32 row block (~4 co-resident score-space
# copies: x, work, iota, eq/where temps) against Mosaic's 16 MB stack.
_VMEM_BUDGET = 12 * 1024 * 1024

# Lane count of the vector registers the hierarchical kernel sweeps over;
# a candidate chunk is one LANE COLUMN of the (NS, 128) row view.
_CHUNK = 128
# Per-chunk candidate depth: the sweep keeps the top-4 of every lane
# column. Exactness does NOT rest on this constant — the detector in
# topk_lse_hier catches any row where >4 of its top-k share a lane and
# reroutes the whole batch to the exact fallback; 4 keeps that event
# rare (P(>=5 of 10 in one of 128 lanes) ~ 1e-6/row => ~0.2% of
# flagship batches) while the sweep stays ~4 levels x ~5 data passes.
_LEVELS = 4
# Pad sentinel: far below any real logit, finite so exp(pad - max) == 0
# exactly and comparisons stay ordered (never use -inf: NaN risk in lse
# if a whole row were pads; and jnp.finfo(...).max is a STRONG scalar —
# see CLAUDE.md — so a plain float literal).
_PAD = -1.0e30


def _row_block(R: int, V: int, copies: int = 4) -> int:
    """Largest divisor of R in [8, 16] whose (rb, V) f32 working set
    (``copies`` co-resident score-space arrays) fits; 0 if none (caller
    falls back to lax.top_k)."""
    for rb in range(16, 7, -1):
        if R % rb == 0 and copies * rb * V * 4 <= _VMEM_BUDGET:
            return rb
    return 0


def _topk_lse_kernel(k: int, V: int, x_ref, vals_ref, toks_ref, lse_ref):
    x = x_ref[0].astype(jnp.float32)                       # (rb, V)
    rb = x.shape[0]
    # logsumexp (exact, f32): one in-VMEM pass. Output is (rb, 1) — a
    # rank-2 (1, rb) block is Mosaic-illegal (sublane dim 1), so lse rides
    # as a rank-3 (1, rb, 1) block whose last-two dims equal the array's.
    m0 = jnp.max(x, axis=-1, keepdims=True)
    lse_ref[0] = (jnp.log(jnp.sum(jnp.exp(x - m0), axis=-1, keepdims=True))
                  + m0).astype(lse_ref.dtype)
    iota = jax.lax.broadcasted_iota(jnp.int32, (rb, V), 1)
    work = x
    vals, toks = [], []
    for _ in range(k):
        m = jnp.max(work, axis=-1, keepdims=True)          # (rb, 1)
        # first occurrence of the max — lax.top_k's stable tie order
        idx = jnp.min(jnp.where(work == m, iota, V), axis=-1,
                      keepdims=True)                       # (rb, 1)
        vals.append(m)
        toks.append(idx)
        work = jnp.where(iota == idx, -jnp.inf, work)
    # everything stays >=2-D (Mosaic's vector layouts) — concat, not stack
    vals_ref[0] = jnp.concatenate(vals, axis=1).astype(vals_ref.dtype)
    toks_ref[0] = jnp.concatenate(toks, axis=1).astype(toks_ref.dtype)


def _hier_sweep_kernel(x_ref, vals_ref, gi_ref, lse_ref, det_ref):
    """Sweep half of the hierarchical exact top-k: the row is viewed
    (NS, 128) and a candidate chunk is a LANE COLUMN (the NS values
    sharing lane l), so every reduction runs over the SUBLANE axis,
    which Mosaic lowers to elementwise tile accumulation (~1 op/element).
    Two earlier cuts were rejected on hardware: chunking over contiguous
    128-lane runs made every reduce intra-lane shuffle-bound
    (log2(128) steps per 128 elements — as slow as the iterative kernel),
    and popping the k winners inside the kernel serialized ~120 tiny
    (rb, 128) ops per grid step (latency-bound: ~37 us/block). This
    kernel therefore ONLY builds the per-lane top-_LEVELS candidates
    (values + global indices) and the row logsumexp; the k-round
    extraction runs in XLA on the (R, _LEVELS*128) candidate matrix
    (vectorized over ALL rows at once) in topk_lse_hier.

    Within a lane, levels are first-occurrence-masked, so equal values
    carry ascending sublane indices — the XLA extraction's
    (value desc, global index asc) pop rule then reproduces lax.top_k's
    stable tie order exactly."""
    # Pad lanes of a non-multiple-of-128 vocab were already set to _PAD
    # in HBM by the wrapper's jnp.pad — no in-kernel index masking (a
    # first cut materialized a global-index iota here and blew the 16 MB
    # scoped vmem stack by 3.7 MB at rb=10).
    x = x_ref[0].astype(jnp.float32)                       # (rb, NS, C)
    rb, NS, C = x.shape
    # logsumexp (exact, f32) — pads contribute exp(_PAD - m) == 0
    m1 = jnp.max(x, axis=1)                                # (rb, C)
    m0 = jnp.max(m1, axis=1, keepdims=True)                # (rb, 1)
    s = jnp.sum(jnp.sum(jnp.exp(x - m0[:, :, None]), axis=1),
                axis=1, keepdims=True)
    lse_ref[0] = (jnp.log(s) + m0).astype(lse_ref.dtype)
    # sweep: per-lane top-_LEVELS values + first-occurrence sublanes
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (rb, NS, C), 1)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (rb, C), 1)
    work, vals, gis = x, [], []
    m = m1
    for lv in range(_LEVELS):
        a = jnp.min(jnp.where(work == m[:, None, :], sub_iota, NS),
                    axis=1)                                # (rb, C)
        vals.append(m)
        gis.append(a * C + lane_iota)                      # global index
        work = jnp.where(sub_iota == a[:, None, :], _PAD, work)
        m = jnp.max(work, axis=1)
    # the (_LEVELS+1)-th per-lane value, emitted for the DETECTOR only:
    # a lane can strand a competitor iff its (_LEVELS+1)-th value still
    # reaches the k-th extracted one. Comparing the deepest KEPT level
    # instead fires on every lane that merely holds _LEVELS of the top-k
    # (all of them visible and correctly extracted) — a ~1e-4/row false
    # positive that put the 8 ms lax.top_k fallback inside ~22% of
    # flagship batches when first measured.
    det_ref[0] = m.astype(det_ref.dtype)
    vals_ref[0] = jnp.concatenate(vals, axis=1).astype(vals_ref.dtype)
    gi_ref[0] = jnp.concatenate(gis, axis=1).astype(gi_ref.dtype)


def topk_lse_hier(logits: Array, k: int,
                  *, interpret: bool = False
                  ) -> Tuple[Array, Array, Array]:
    """Exact (top_vals (R, k) f32, top_toks (R, k) i32, lse (R,) f32) —
    the TPU vocab-scale beam/greedy reduction (generate.TOPK_MODE
    'exact_hier'). Pipeline: Pallas sweep kernel (per-lane-column
    top-_LEVELS candidates, one HBM read) -> XLA extraction (k rounds of
    (value desc, global index asc) pops over the (R, _LEVELS*128)
    candidates) -> exactness detector -> rare per-batch lax.cond
    fallback to lax.top_k.

    Detector soundness: a result can only differ from lax.top_k if some
    lane stranded a value y ordered before the k-th extracted (vk, gi_k);
    every stranded value sits at or below that lane's (_LEVELS+1)-th
    value M5 (levels are sorted descending and the top _LEVELS are all
    visible to extraction), so y >= vk implies M5 >= vk — i.e.
    `any(det >= vk)` catches every failure, and fires ONLY when
    >_LEVELS of a row's top-k share one lane column or a value ties at
    the k-th boundary (P ~ 1e-6/row at the flagship shape; zero false
    positives otherwise). Non-multiple-of-128 vocabs are padded once in
    HBM (BART 50265->50304; T5's 32128 is already 251*128)."""
    R, V = logits.shape
    # f32 peak residency measured on hardware: ~8.8 row-block copies
    # co-resident (block + double-buffer + sweep generations + where
    # temps + the sublane iota); budget 9 copies against 15 MB (1 MB
    # slack under the 16 MB scoped stack): rb=8 at vocab scale = 14.2 MB
    # actual, where rb=10's 17.75 MB overflowed. Non-f32 inputs add a
    # full cast copy; k<=2 does fewer vector ops in the iterative kernel
    # — both route there.
    rb = 0
    if logits.dtype == jnp.float32:
        for cand in range(16, 7, -1):
            if R % cand == 0 and 9 * cand * V * 4 <= 15 * 1024 * 1024:
                rb = cand
                break
    NS = -(-V // _CHUNK)
    if rb == 0 or k <= 2 or k > 16 or V < 4 * k or NS <= _LEVELS:
        return topk_lse_exact(logits, k, interpret=interpret)
    if NS * _CHUNK != V:
        xp = jnp.pad(logits, ((0, 0), (0, NS * _CHUNK - V)),
                     constant_values=jnp.asarray(_PAD, logits.dtype))
    else:
        xp = logits
    x4 = xp.reshape(R // rb, rb, NS, _CHUNK)
    ms = pl.ANY if interpret else pltpu.VMEM
    W = _LEVELS * _CHUNK
    cand_vals, cand_gi, lse, det = pl.pallas_call(
        _hier_sweep_kernel,
        grid=(R // rb,),
        in_specs=[pl.BlockSpec((1, rb, NS, _CHUNK), lambda b: (b, 0, 0, 0),
                               memory_space=ms)],
        out_specs=(pl.BlockSpec((1, rb, W), lambda b: (b, 0, 0),
                                memory_space=ms),
                   pl.BlockSpec((1, rb, W), lambda b: (b, 0, 0),
                                memory_space=ms),
                   pl.BlockSpec((1, rb, 1), lambda b: (b, 0, 0),
                                memory_space=ms),
                   pl.BlockSpec((1, rb, _CHUNK), lambda b: (b, 0, 0),
                                memory_space=ms)),
        out_shape=(jax.ShapeDtypeStruct((R // rb, rb, W), jnp.float32),
                   jax.ShapeDtypeStruct((R // rb, rb, W), jnp.int32),
                   jax.ShapeDtypeStruct((R // rb, rb, 1), jnp.float32),
                   jax.ShapeDtypeStruct((R // rb, rb, _CHUNK),
                                        jnp.float32)),
        interpret=interpret,
    )(x4)
    cand_vals = cand_vals.reshape(R, W)
    cand_gi = cand_gi.reshape(R, W)
    lse = lse.reshape(R)
    det = det.reshape(R, _CHUNK)
    # XLA extraction: candidate gi are unique per row (distinct lanes
    # differ mod 128; within a lane first-occurrence masking gives
    # distinct sublanes), so `gi == cgi` hits exactly one candidate
    vc = cand_vals
    vals_l, toks_l = [], []
    for _ in range(k):
        g = jnp.max(vc, axis=1, keepdims=True)
        cgi = jnp.min(jnp.where(vc == g, cand_gi, jnp.int32(2 ** 30)),
                      axis=1, keepdims=True)
        vals_l.append(g)
        toks_l.append(cgi)
        vc = jnp.where(cand_gi == cgi, _PAD, vc)
    vals = jnp.concatenate(vals_l, axis=1)
    toks = jnp.concatenate(toks_l, axis=1)
    vk = vals[:, -1:]
    bad = jnp.any(det >= vk)

    def _fallback(_):
        xf = logits.astype(jnp.float32)
        v, t = jax.lax.top_k(xf, k)
        return v, t.astype(jnp.int32)

    vals, toks = jax.lax.cond(bad, _fallback,
                              lambda _: (vals, toks), logits)
    return vals, toks, lse


def topk_lse_exact(logits: Array, k: int,
                   *, interpret: bool = False
                   ) -> Tuple[Array, Array, Array]:
    """(top_vals (R, k) f32, top_toks (R, k) i32, lse (R,) f32) — exact,
    one HBM read of ``logits`` (R, V). Falls back to lax.top_k +
    logsumexp when no legal row block exists (see module docstring)."""
    R, V = logits.shape
    rb = _row_block(R, V)
    if rb == 0 or k > 16 or V < 4 * k:
        logits = logits.astype(jnp.float32)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        vals, toks = jax.lax.top_k(logits, k)
        return vals, toks.astype(jnp.int32), lse
    ms = pl.ANY if interpret else pltpu.VMEM
    x3 = logits.reshape(R // rb, rb, V)
    vals, toks, lse = pl.pallas_call(
        functools.partial(_topk_lse_kernel, k, V),
        grid=(R // rb,),
        in_specs=[pl.BlockSpec((1, rb, V), lambda b: (b, 0, 0),
                               memory_space=ms)],
        out_specs=(pl.BlockSpec((1, rb, k), lambda b: (b, 0, 0),
                                memory_space=ms),
                   pl.BlockSpec((1, rb, k), lambda b: (b, 0, 0),
                                memory_space=ms),
                   pl.BlockSpec((1, rb, 1), lambda b: (b, 0, 0),
                                memory_space=ms)),
        out_shape=(jax.ShapeDtypeStruct((R // rb, rb, k), jnp.float32),
                   jax.ShapeDtypeStruct((R // rb, rb, k), jnp.int32),
                   jax.ShapeDtypeStruct((R // rb, rb, 1), jnp.float32)),
        interpret=interpret,
    )(x3)
    return (vals.reshape(R, k), toks.reshape(R, k), lse.reshape(R))
