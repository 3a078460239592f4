"""Decode-time attention for reorder-free beam search.

Classic beam search physically reorders the self-attention KV cache to the
chosen beams every step (HF: `_reorder_cache`, reference:
my_transformers/modeling_bart.py generation path). On TPU that gather over
the full (B*K, L, H, Dh) buffers is pure HBM traffic — measured at
~15 ms/step on the flagship config (PERF.md), the single largest decode
cost.

Here the cache rows are NEVER moved. Each beam instead carries an integer
ancestry vector `anc[b, k, t]` — which physical row holds beam k's KV at
position t. Attention reads the cache through an additive selection mask:

    logits[b,k,h,j,l] = q[b,k,h] . K[b,j,l,h]          (scores vs ALL rows)
    masked with  0 where (anc[b,k,l] == j and l <= pos) else -inf
    softmax over the flattened (j,l) axis == softmax over beam k's true
    history (exactly one j survives per l).

Extra score FLOPs are x(num_beams) on a tiny term; HBM traffic drops from
(read + write + re-read) of the whole cache to a single read, and the
softmax runs on (J*L) lanes instead of the lane-starved (1, L).

The cross-attention KV (identical across beams) is likewise kept
un-expanded at (B, S, ...) and shared by all K beams, cutting its read
traffic by another x(num_beams).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array
NEG_INF = -1.0e9

# tests monkeypatch to run the kernels in interpreter mode on CPU
_INTERPRET = False
# tests monkeypatch (together with _INTERPRET) to force the Pallas beam
# kernel path on CPU — e2e coverage of the TPU-only branch
_FORCE_KERNEL = False


def beam_selection_mask(beam_anc: Array, decode_pos: Array, cache_len: int,
                        num_rows: int) -> Array:
    """Additive (B, K, J, L) mask from ancestry indices.

    beam_anc: (B, K, L) int32 — physical row of beam k's KV at position l.
    Position l is attendable iff l <= decode_pos and j == beam_anc[b,k,l].
    """
    j = jnp.arange(num_rows)[None, None, :, None]
    l = jnp.arange(cache_len)[None, None, None, :]
    sel = (beam_anc[:, :, None, :] == j) & (l <= decode_pos)
    return jnp.where(sel, 0.0, NEG_INF).astype(jnp.float32)


def beam_sel_big(anc: Array, decode_pos, J: int, L: int,
                 tb: int = None) -> Array:
    """(B*K, L*tb*J) additive kernel mask built FLAT from the ancestry.

    Column order matches the kernel's cache-block reshape:
    c = l*(tb*J) + t*J + j (t = batch position within the tb-block).
    Row r = b*K + k may attend column c iff t(c) == b % tb (own-batch
    block diagonal), anc[b, k, l(c)] == j(c) (ancestry), and
    l(c) <= decode_pos (causal).

    The previous build went through a 5-D where + reshape whose tiny minor
    dims (8, 5) forced pathological TPU tile layouts — 1.2 ms/step at
    flagship beam shapes (r3 profile: a 27 GiB/s broadcast_select fusion
    plus two 16 MB relayouts). Here the only large tensor is the final
    (B*K, L*tb*J) f32 in its native {1,0} layout: the l-expansion of anc
    rides a tiny (L, L*tb*J) 0/1 matmul (MXU; exact — row indices are far
    below 2^24) and everything else is iota arithmetic, so XLA emits one
    GEMM + one elementwise fusion.
    """
    if tb is None:
        tb = _BEAM_TB
    B, K, _ = anc.shape
    tbJ = tb * J
    C = L * tbJ
    expand = (jnp.arange(C)[None, :] // tbJ
              == jnp.arange(L)[:, None]).astype(jnp.float32)
    anc_rep = anc.reshape(B * K, L).astype(jnp.float32) @ expand  # (BK, C)
    c = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    j_col = (c % J).astype(jnp.float32)
    t_col = (c // J) % tb
    l_col = c // tbJ
    t_row = ((jnp.arange(B * K, dtype=jnp.int32) // K) % tb)[:, None]
    ok = ((anc_rep == j_col) & (t_col == t_row)
          & (l_col <= jnp.asarray(decode_pos, jnp.int32)))
    return jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32)


def decode_attend(q: Array, k: Array, v: Array,
                  mask: Optional[Array] = None,
                  bias_row: Optional[Array] = None) -> Array:
    """Single-step decode self-attention over a TIME-MAJOR cache.

    q: (B, 1, H, Dh); k, v: (L, B, H*Dh) — the cache is RANK-3 so its
    natural layout is the projection GEMM's (a rank-4 (L, B, H, Dh) carry
    made XLA pick a batch-minor layout and relay the full cache every beam
    step; two identity-pin workarounds lost — PERF.md r3 "What was
    tried"); mask: additive with trailing L axis
    (e.g. (1, 1, 1, L) position mask); bias_row: optional (1, H, 1, L) T5
    relative bias. Returns (B, 1, H*Dh)."""
    H, Dh = q.shape[-2:]
    L, B = k.shape[:2]
    k = k.reshape(L, B, H, Dh)
    v = v.reshape(L, B, H, Dh)
    qb = q.reshape(B, H, Dh)
    logits = jnp.einsum("bhd,lbhd->bhl", qb, k,
                        preferred_element_type=jnp.float32)  # (B, H, L)
    if mask is not None:
        # (B or 1, 1, 1, L) additive -> (B or 1, 1, L)
        logits = logits + mask.astype(jnp.float32).reshape(mask.shape[0], 1, L)
    if bias_row is not None:
        logits = logits + bias_row.astype(jnp.float32).reshape(1, H, L)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhl,lbhd->bhd", probs, v)
    return out.reshape(B, 1, H * Dh)


_BEAM_TB = 8  # batch elements per program (sublane-aligns tb*J cache rows)
_VMEM_LIMIT = 16 * 1024 * 1024


def beam_blocks_fit(L: int, K: int, J: int, inner: int, num_heads: int,
                    io_bytes: int) -> bool:
    """Scoped-VMEM feasibility of the beam self-attend kernels' blocks
    (per program: q/out (tb·K, inner), k/v (L, tb·J, inner), the flat
    sel mask (tb·K, L·tb·J) and bias (H, L·tb·J)). Calibrated on
    hardware (2026-08-19): the f32 video-CLI beam (L=40, K=J=5, inner
    768) estimates 10.4 MB and used 18.75 MB on chip (OOM vs the 16 MB
    stack) — a 1.8× model-to-actual factor (Mosaic double-buffering) —
    while the flagship bf16 beam estimates 5.4 MB (×1.9 = 10.2 MB) and
    runs. Threshold: est·1.9 ≤ 16M·0.9. Infeasible shapes take the XLA
    einsum fallback (correct, slower)."""
    tb = _BEAM_TB
    tbK, tbJ = tb * K, tb * J
    est = (io_bytes * (2 * L * tbJ * inner + 2 * tbK * inner)
           + 4 * (tbK * L * tbJ + num_heads * L * tbJ))
    return est * 1.9 <= _VMEM_LIMIT * 0.9


def _beam_self_kernel(num_heads: int, head_dim: int,
                      q_ref, k_ref, v_ref, sel_ref, bias_ref, out_ref):
    """Per program: tb batch elements. q (tb*K, H*Dh); k/v blocks are the
    TIME-MAJOR cache rows (L, tb*J, H*Dh) — read natively, so the cache
    never needs an XLA layout transpose (which forced a full copy per step
    fused with the dynamic_update_slice).

    All ops are 2-D: scores run against ALL tb*J rows of the block (a
    (tb*K, L*tb*J) mask with -inf off the own-batch block-diagonal and off
    the ancestry selects the true history; the x-tb extra score FLOPs are
    ~0.1 ms/step, noise vs the HBM the layout copies cost). bias
    (H, L*tb*J) is the per-head additive row (T5), zeros otherwise."""
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[:, sl]                             # (tb*K, Dh)
        kh = k_ref[:, :, sl].reshape(-1, head_dim)   # (L*tb*J, Dh)
        vh = v_ref[:, :, sl].reshape(-1, head_dim)
        s = jax.lax.dot_general(q, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + sel_ref[:] + bias_ref[h][None, :]
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        o = jnp.dot(p, vh, preferred_element_type=jnp.float32)
        out_ref[:, sl] = o.astype(out_ref.dtype)


def _beam_self_attend_pallas(q2, k3, v3, sel_big, bias_big, num_heads,
                             K: int, J: int, *, interpret=False):
    """q2 (B*K, H*Dh); k3/v3 (L, B*J, H*Dh) time-major;
    sel_big (B*K, L*tb*J); bias_big (H, L*tb*J) fp32."""
    BK, inner = q2.shape
    L = k3.shape[0]
    tb = _BEAM_TB
    B = BK // K
    assert B % tb == 0, f"beam batch {B} must be padded to a multiple of {tb}"
    head_dim = inner // num_heads
    grid_n = B // tb
    tbK = tb * K
    tbJ = tb * J
    ms = pl.ANY if interpret else pltpu.VMEM
    return pl.pallas_call(
        functools.partial(_beam_self_kernel, num_heads, head_dim),
        grid=(grid_n,),
        in_specs=[
            pl.BlockSpec((tbK, inner), lambda i: (i, 0), memory_space=ms),
            pl.BlockSpec((L, tbJ, inner), lambda i: (0, i, 0),
                         memory_space=ms),
            pl.BlockSpec((L, tbJ, inner), lambda i: (0, i, 0),
                         memory_space=ms),
            pl.BlockSpec((tbK, L * tbJ), lambda i: (i, 0), memory_space=ms),
            pl.BlockSpec((num_heads, L * tbJ), lambda i: (0, 0),
                         memory_space=ms),
        ],
        out_specs=pl.BlockSpec((tbK, inner), lambda i: (i, 0),
                               memory_space=ms),
        out_shape=jax.ShapeDtypeStruct((BK, inner), q2.dtype),
        interpret=interpret,
    )(q2, k3, v3, sel_big, bias_big)


def _beam_self_update_kernel(num_heads: int, head_dim: int, pos_ref,
                             q_ref, k_ref, v_ref, kn_ref, vn_ref, sel_ref,
                             bias_ref, obias_ref, out_ref, ko_ref, vo_ref):
    """_beam_self_kernel + IN-PLACE cache update (input_output_aliases).

    The current step's KV rides as separate (tbJ, inner) inputs and is
    written to cache row [pos] through the aliased outputs, so the XLA-level
    dynamic_update_slice — whose layout disagreement with this custom call
    forced a full k+v relayout copy EVERY step (~5.7 ms/step at flagship
    beam shapes, 29%% of the step — r3 profile) — disappears entirely: the
    custom call is the only reader AND writer of the cache buffer, pinning
    one layout across the while-loop carry.

    The cache block still holds the PREVIOUS step's row at [pos]; the
    current token's attention contribution comes from an explicit own-row
    term (each beam attends its own new KV exactly once): softmax runs
    online over [cache scores (l < pos via sel mask)] ∪ [own score].
    obias is the (1, num_heads) own-position relative bias (T5), zeros
    otherwise."""
    ko_ref[...] = kn_ref[...][None]
    vo_ref[...] = vn_ref[...][None]
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[:, sl]                             # (tbK, Dh)
        kh = k_ref[:, :, sl].reshape(-1, head_dim)   # (L*tbJ, Dh)
        vh = v_ref[:, :, sl].reshape(-1, head_dim)
        s = jax.lax.dot_general(q, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + sel_ref[:] + bias_ref[h][None, :]
        s_own = jnp.sum((q * kn_ref[:, sl]).astype(jnp.float32), axis=1,
                        keepdims=True) + obias_ref[0, h]
        m = jnp.maximum(jnp.max(s, axis=1, keepdims=True), s_own)
        e = jnp.exp(s - m)
        eo = jnp.exp(s_own - m)
        denom = jnp.sum(e, axis=1, keepdims=True) + eo
        p = (e / denom).astype(q.dtype)
        o = jnp.dot(p, vh, preferred_element_type=jnp.float32)
        o = o + (eo / denom) * vn_ref[:, sl].astype(jnp.float32)
        out_ref[:, sl] = o.astype(out_ref.dtype)


def beam_decode_attend_update(q: Array, k_cache: Array, v_cache: Array,
                              k_new: Array, v_new: Array, sel_mask: Array,
                              decode_pos, own_bias: Optional[Array] = None,
                              bias_row: Optional[Array] = None):
    """Fused ancestry-masked self-attention + in-place cache write.

    q, k_new, v_new: (B*K, 1, H, Dh) current step; k_cache, v_cache:
    (L, B*J, H, Dh) time-major (row [decode_pos] still holds stale data —
    it is OVERWRITTEN through aliased outputs). sel_mask: (B, K, J, L)
    additive built with positions l <= decode_pos - 1 (the current position
    enters via the own-row term), or the raw (B, K, L) int32 ancestry —
    then the flat kernel mask is built directly at decode_pos - 1
    (beam_sel_big). own_bias: optional (H,) additive on the
    own score (T5 relative bias at distance 0); bias_row: optional
    (1, H, 1, L) per-position bias for the cache side.

    Returns (out (B*K, 1, H*Dh), new_k_cache, new_v_cache) with the cache
    arrays updated in place (same shapes). TPU-only (callers fall back to
    the dus + beam_decode_attend path on CPU)."""
    H, Dh = q.shape[-2:]
    tb = _BEAM_TB
    if sel_mask.ndim == 3:  # raw ancestry
        B, K, L = sel_mask.shape[0], sel_mask.shape[1], k_cache.shape[0]
        J = k_cache.shape[1] // B
        assert B % tb == 0
        sel_big = beam_sel_big(sel_mask,
                               jnp.asarray(decode_pos, jnp.int32) - 1,
                               J, L, tb)
    else:
        B, K, J, L = sel_mask.shape
        assert B % tb == 0
        t_of_b = (jnp.arange(B) % tb)[:, None, None, None, None]
        sel5 = jnp.where(
            jnp.arange(tb)[None, None, None, :, None] == t_of_b,
            jnp.swapaxes(sel_mask, 2, 3)[:, :, :, None, :],
            NEG_INF)
        sel_big = sel5.reshape(B * K, L * tb * J)
    inner = H * Dh
    if bias_row is not None:
        bias_big = jnp.repeat(
            bias_row.astype(jnp.float32).reshape(H, L), tb * J, axis=1)
    else:
        bias_big = jnp.zeros((H, L * tb * J), jnp.float32)
    obias = (own_bias.astype(jnp.float32).reshape(1, H)
             if own_bias is not None else jnp.zeros((1, H), jnp.float32))

    q2 = q.reshape(B * K, inner)
    k3 = k_cache.reshape(L, B * J, inner)
    v3 = v_cache.reshape(L, B * J, inner)
    kn = k_new.reshape(B * J, inner)
    vn = v_new.reshape(B * J, inner)
    head_dim = inner // H
    tbK, tbJ = tb * K, tb * J
    ms = pl.ANY if _INTERPRET else pltpu.VMEM
    pos = jnp.asarray(decode_pos, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec((tbK, inner), lambda i, s: (i, 0), memory_space=ms),
            pl.BlockSpec((L, tbJ, inner), lambda i, s: (0, i, 0),
                         memory_space=ms),
            pl.BlockSpec((L, tbJ, inner), lambda i, s: (0, i, 0),
                         memory_space=ms),
            pl.BlockSpec((tbJ, inner), lambda i, s: (i, 0), memory_space=ms),
            pl.BlockSpec((tbJ, inner), lambda i, s: (i, 0), memory_space=ms),
            pl.BlockSpec((tbK, L * tbJ), lambda i, s: (i, 0),
                         memory_space=ms),
            pl.BlockSpec((H, L * tbJ), lambda i, s: (0, 0), memory_space=ms),
            pl.BlockSpec((1, H), lambda i, s: (0, 0), memory_space=ms),
        ],
        out_specs=(
            pl.BlockSpec((tbK, inner), lambda i, s: (i, 0), memory_space=ms),
            pl.BlockSpec((1, tbJ, inner), lambda i, s: (s[0], i, 0),
                         memory_space=ms),
            pl.BlockSpec((1, tbJ, inner), lambda i, s: (s[0], i, 0),
                         memory_space=ms),
        ),
    )
    out, k3n, v3n = pl.pallas_call(
        functools.partial(_beam_self_update_kernel, H, head_dim),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B * K, inner), q.dtype),
            jax.ShapeDtypeStruct((L, B * J, inner), k_cache.dtype),
            jax.ShapeDtypeStruct((L, B * J, inner), v_cache.dtype),
        ),
        input_output_aliases={2: 1, 3: 2},
        interpret=_INTERPRET,
    )(pos, q2, k3, v3, kn.astype(k_cache.dtype), vn.astype(v_cache.dtype),
      sel_big, bias_big, obias)
    return (out.reshape(B * K, 1, inner),
            k3n.reshape(k_cache.shape), v3n.reshape(v_cache.shape))


def beam_decode_attend(q: Array, k: Array, v: Array, sel_mask: Array,
                       bias_row: Optional[Array] = None,
                       decode_pos=None) -> Array:
    """Ancestry-masked self-attention for one decode step.

    q: (B*K, 1, H, Dh) — current-step queries, beam-major rows
    k, v: (L, B*J, H*Dh) — TIME-MAJOR RANK-3 physical KV cache (J == K),
        never reordered (rows) and never copied (time: leading-dim
        updates; rank-3 keeps the while-carry in the kernel's layout,
        see decode_attend docstring)
    sel_mask: (B, K, J, L) additive (from beam_selection_mask), or the raw
        (B, K, L) int32 ancestry itself (requires decode_pos) — preferred:
        the TPU path then builds its flat kernel mask directly
        (beam_sel_big) and the 4-D form never materializes.
    bias_row: optional (1, H, 1, L) additive position bias (T5) — position-
        dependent only, so it broadcasts over beams and physical rows.
    Returns (B*K, 1, H*Dh).

    Shape strategy: the K beams act as a query *sequence* of length K and
    the flattened (J, L) cache as the memory — the canonical
    (B, H, Lq, S) attention layout XLA already tiles well. (A 5-d
    (B,K,H,J,L) formulation measured 30x slower: XLA assigned layouts with
    5-wide minor dims, leaving the VPU lanes ~96% idle.)
    """
    anc = None
    if sel_mask.ndim == 3:  # raw ancestry
        assert decode_pos is not None
        anc, sel_mask = sel_mask, None
        B, K, _ = anc.shape
        L = k.shape[0]
        J = k.shape[1] // B
    else:
        B, K, J, L = sel_mask.shape
    H, Dh = q.shape[-2:]
    if ((jax.default_backend() not in ("cpu",) or _FORCE_KERNEL)
            and B % _BEAM_TB == 0
            and beam_blocks_fit(L, K, J, H * Dh, H,
                                jnp.dtype(q.dtype).itemsize)):
        # Pallas kernel: reads the time-major cache natively (no XLA layout
        # transpose -> the cache dus stays in place) and keeps the softmax
        # in VMEM. seq2seq_generate pads B to a multiple of tb in beam mode.
        # The kernel scores each beam against ALL tb*J cache rows of its
        # program block; the big mask is -inf off the own-batch diagonal
        # and off the ancestry. Column order c = l*(tb*J) + t*J + j, t =
        # batch position within the block. Layer-independent -> XLA CSEs
        # the build across layers.
        tb = _BEAM_TB
        if anc is not None:
            sel_big = beam_sel_big(anc, decode_pos, J, L, tb)
        else:
            t_of_b = (jnp.arange(B) % tb)[:, None, None, None, None]
            sel5 = jnp.where(
                jnp.arange(tb)[None, None, None, :, None] == t_of_b,
                jnp.swapaxes(sel_mask, 2, 3)[:, :, :, None, :],  # (B,K,L,1,J)
                NEG_INF)
            sel_big = sel5.reshape(B * K, L * tb * J)
        if bias_row is not None:
            bias_big = jnp.repeat(
                bias_row.astype(jnp.float32).reshape(H, L), tb * J, axis=1)
        else:
            bias_big = jnp.zeros((H, L * tb * J), jnp.float32)
        out = _beam_self_attend_pallas(
            q.reshape(B * K, H * Dh), k, v, sel_big, bias_big, H, K, J,
            interpret=_INTERPRET)
        return out.reshape(B * K, 1, H * Dh)
    if sel_mask is None:
        sel_mask = beam_selection_mask(anc, decode_pos, L, J)
    qb = q.reshape(B, K, H, Dh)
    # pad the beam/query axis to the 8-sublane boundary — K=5 leaves XLA's
    # softmax fusions VPU-starved (measured ~40x off roofline)
    Kp = max(8, K)
    if Kp != K:
        qb = jnp.pad(qb, ((0, 0), (0, Kp - K), (0, 0), (0, 0)))
    kb = k.reshape(L, B, J, H, Dh)
    vb = v.reshape(L, B, J, H, Dh)
    logits = jnp.einsum("bqhd,lbjhd->bhqjl", qb, kb,
                        preferred_element_type=jnp.float32)  # (B,H,Kp,J,L)
    logits = logits.reshape(B, H, Kp, J * L)
    mask = sel_mask.reshape(B, 1, K, J * L)
    if Kp != K:
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, Kp - K), (0, 0)))
    logits = logits + mask
    if bias_row is not None:
        # memory index m = j*L + l -> repeat the L-bias J times
        bias = jnp.tile(bias_row.astype(jnp.float32).reshape(1, H, 1, L),
                        (1, 1, 1, J))
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqjl,lbjhd->bqhd",
                     probs.reshape(B, H, Kp, J, L), vb)
    return out[:, :K].reshape(B * K, 1, H * Dh)


def beam_cross_attend(q: Array, k: Array, v: Array,
                      mask: Optional[Array] = None,
                      bias: Optional[Array] = None) -> Array:
    """Cross-attention with beam-shared (un-expanded) encoder KV.

    q: (B*K, 1, H, Dh); k, v: (B, S, H*Dh) RANK-3 (preferred: the flat
    form's layout settles OUTSIDE the decode loop — the rank-4
    (B, S, H, Dh) view's (12, 64) tile padding forced a full relayout
    copy per layer per step, 1.5 ms/step at flagship beam shapes, r3
    profile) or legacy (B, S, H, Dh). One copy per batch element, shared
    by its K beams (beams = a K-long query sequence; no causal structure
    in cross-attention, so this is exact). mask: optional (B, 1, 1, S)
    additive. Returns (B*K, 1, H*Dh).
    """
    H, Dh = q.shape[-2:]
    B, S = k.shape[:2]
    K = q.shape[0] // B
    qb = q.reshape(B, K, H, Dh)
    if jax.default_backend() not in ("cpu",):
        # beams are just K query rows over a shared memory: reuse the fused
        # VMEM attention kernel (XLA's (B,H,K,S) softmax fusions for tiny K
        # measured ~40 ms/layer, 100x off roofline — PERF.md)
        from vlpet_tpu.ops.attention import fused_attention

        if bias is None:
            # length-collapsed (B,1,1,S) form: broadcast happens in-kernel
            m = (mask.astype(jnp.float32).reshape(B, 1, 1, S)
                 if mask is not None else jnp.zeros((1, 1, 1, S), jnp.float32))
        else:
            m = jnp.zeros((B, 1, K, S), jnp.float32) + bias.astype(jnp.float32)
            if mask is not None:
                m = m + mask.astype(jnp.float32).reshape(B, 1, 1, S)
        out = fused_attention(qb.reshape(B, K, H * Dh),
                              k.reshape(B, S, H * Dh),
                              v.reshape(B, S, H * Dh), m, H)
        return out.reshape(B * K, 1, H * Dh)
    Kp = max(8, K)  # sublane-pad the beam/query axis (see beam_decode_attend)
    if Kp != K:
        qb = jnp.pad(qb, ((0, 0), (0, Kp - K), (0, 0), (0, 0)))
    kb = k.reshape(B, S, H, Dh)
    vb = v.reshape(B, S, H, Dh)
    logits = jnp.einsum("bqhd,bshd->bhqs", qb, kb,
                        preferred_element_type=jnp.float32)  # (B,H,Kp,S)
    if mask is not None:
        logits = logits + mask.astype(jnp.float32).reshape(B, 1, 1, S)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqs,bshd->bqhd", probs, vb)
    return out[:, :K].reshape(B * K, 1, H * Dh)
