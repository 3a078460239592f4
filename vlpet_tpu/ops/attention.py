"""Short-sequence fused attention (Pallas TPU), forward + backward.

VL-PET sequences are tiny (≤104 joint tokens, ≤600 for video QA), so a whole
(L, S) attention matrix per head fits comfortably in VMEM — no flash-style
tiling needed. The kernels fuse QK^T → +mask → softmax → ·V per program,
keeping the fp32 logits entirely on-chip. XLA's default lowering both
round-trips the (B, H, L, S) logits through HBM and materializes ~110
(B, L, H, Dh) ↔ (B, H, L, Dh) layout copies per train step (31 ms of the
176 ms flagship step — PERF.md).

Layout: q, k, v are (B, L, H·Dh) — the natural projection-GEMM output, so
no head transposes are ever materialized. Each program processes a
multi-row block of TB batch elements (all heads), and every head's matmuls
carry the TB batch dim in one dot_general — the round-1 kernel's
(B,)-grid of 500 single-row programs with an unrolled head loop serialized
the backward (PERF.md "What was tried"); this version wins in training too.

``mask`` is additive, (B|1, 1|H, L, S) (per-head = T5 relative bias).

Gradients: jax.custom_vjp; the backward kernel recomputes the softmax in
VMEM (standard recompute) and emits dq/dk/dv in the same multi-row layout.
The mask gets a zero cotangent (frozen in every PET recipe).

Attention-probability dropout (``rate`` > 0) is fused in-kernel via the
hash-mask scheme (ops/hashdrop.py): the keep mask is a pure function of
(seed, head, element index), regenerated in the backward — nothing stored.
This matters for T5, whose reference applies ``dropout_rate`` (0.1) to the
softmax probabilities (my_transformers/modeling_t5.py T5Attention), so every
TRAINING step fell back to the XLA einsum path: at flagship T5 shapes that
cost ~41 ms/step of layout copies + (B, H, L, S) u32 rng tensors (25% of
the step — PERF.md r3 T5 profile). BART recipes keep attention_dropout at
0.0 (HF default), so BART trains through this kernel either way.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vlpet_tpu.ops.hashdrop import keep_mask

Array = jax.Array


def head_seed(seed, h):
    """Per-head seed: keep_mask's flat element index covers (batch, L, S)
    only, so heads decorrelate via a golden-ratio seed offset (tests
    recompute the identical mask outside the kernel with this helper).
    ``h`` may be a python int (the all-heads kernels' unrolled loop) or a
    traced scalar (the one-head-per-program kernels' program_id) — uint32
    multiplication wraps mod 2^32 either way, so the values agree."""
    return (seed.astype(jnp.uint32)
            + jnp.uint32(h) * jnp.uint32(0x9E3779B9))


def _block_rows(B: int, cap: int = 16) -> int:
    """Largest divisor of B that is <= cap (multi-row program blocks)."""
    for tb in range(min(cap, B), 0, -1):
        if B % tb == 0:
            return tb
    return 1


# Mosaic's scoped-vmem stack limit; kernels allocating past it fail to
# compile ("Ran out of memory in memory space vmem ... limit 16.00M").
_VMEM_LIMIT = 16 * 1024 * 1024


def _full_kernel_fits(B: int, L: int, S: int, inner: int, num_heads: int,
                      has_bias: bool, rate: float,
                      io_bytes: int = 4) -> bool:
    """Conservative scoped-VMEM feasibility of the all-heads-per-program
    kernels (the flagship path). Deliberately over-counts the per-head
    working set (~2 extra (TB, L, S) f32 copies) — a borderline shape
    quietly taking a slower path costs perf, not correctness; the flagship
    shapes (≤104 joint tokens) pass with >2x headroom."""
    def program_bytes(tb: int, n_io: int, n_work: int) -> int:
        io = n_io * tb * max(L, S) * inner * io_bytes
        mask = tb * 8 * S * 4
        bias = num_heads * L * S * 4 if has_bias else 0
        work = n_work * tb * L * S * 4
        if rate > 0.0:
            work += 2 * tb * L * S * 4  # u32 hash indices + keep mask
        return io + mask + bias + work
    # fwd: q/k/v/out blocks + ~2 score-space copies (logits, probs);
    # bwd: q/k/v/do/dq/dk/dv/(spare) + ~4 copies (p, dp, ds, dropped-p)
    fwd = program_bytes(_block_rows(B), 4, 3)
    bwd = program_bytes(_block_rows(B, cap=8 if rate > 0.0 else 16), 8, 5)
    return max(fwd, bwd) < int(_VMEM_LIMIT * 0.9)


def _perhead_fits(L: int, S: int, head_dim: int, has_bias: bool, rate: float,
                  io_bytes: int, need_bwd: bool, bias_grad: bool) -> bool:
    """Scoped-VMEM feasibility of the one-head-per-program kernels (the
    long-sequence path): each program holds a single (L, S) score matrix,
    so the working set is H× smaller than the flagship kernels'. Copy
    counts calibrated on hardware (scripts/probe_perhead_attention.py):
    every S=604 variant up to fp32 bias+dropout+bias_grad compiles, so the
    bwd counts the ~5 genuinely co-resident score-space f32 copies
    (p/keep/pd/dp/ds — s dies into p, the u32 hash indices are transient)
    rather than the fwd's deliberate over-count; shapes past the verified
    envelope (S≈700+) still gate out."""
    io = 7 * max(L, S) * head_dim * io_bytes * 2   # blocks, double-buffered
    mask = 2 * 8 * S * 4
    bias = 2 * L * S * 4 if has_bias else 0        # (1,1,L,S) f32 block ×2
    score = L * S * 4
    fwd = io + mask + bias + (5 if rate > 0.0 else 3) * score
    bwd = io + mask + bias + (6 if rate > 0.0 else 5) * score
    if bias_grad:
        bwd += score                               # grid-resident dbias
    need = max(fwd, bwd) if need_bwd else fwd
    return need < int(_VMEM_LIMIT * 0.9)


_LTILED_BLOCKS = (256, 128, 64, 32, 16, 8)


def _ltiled_block(L: int, S: int, inner: int, num_heads: int, has_bias: bool,
                  rate: float, io_bytes: int, need_bwd: bool) -> int:
    """Largest query-row block (multiple of 8) whose L-tiled working set
    fits the scoped-vmem stack; 0 if none does. The kernel holds one
    (block_l, S) score strip per head at a time plus the full (S, inner)
    k/v blocks (grid-resident across the row sweep), so the ceiling is set
    by S·inner io + strip copies — NOT by L, which only sets the grid.

    Blocks are additionally capped at the 8-row-padded query length: a
    block taller than Lp is pure padding compute (the short-query cross
    sites, L≈10, would otherwise sweep a 128-row strip for 10 real rows)."""
    cap = max(8, -(-L // 8) * 8)
    for bl in _LTILED_BLOCKS:
        if bl > cap:
            continue
        kv = 2 * S * inner * io_bytes * 2          # k+v, double-buffered
        q_rows = 2 * bl * inner * io_bytes * 2     # q + out blocks
        mask = max(8, bl) * S * 4 * 2
        bias_b = num_heads * bl * S * 4 * 2 if has_bias else 0
        strip = bl * S * 4
        fwd = kv + q_rows + mask + bias_b + (3 if rate > 0.0 else 2) * strip
        if io_bytes >= 4:
            # f32 calibration: the (50, 636, 768) f32 bwd at bl=64 used
            # 16.41M on hardware vs 14.27M modeled (tvc video CLI,
            # 2026-08-19) — Mosaic's f32 buffering overhead is ~2.1M past
            # the byte model; all bf16 blocks are probe-validated as-is
            fwd += 2.5 * 1024 * 1024
        need = fwd
        if need_bwd:
            if bl > 128:
                # hardware-calibrated cap (probe_ltiled_attention, dated
                # note in PERF.md): the bl=256 backward fails to compile
                # at S=604 even though the byte model says it fits, while
                # bl=128@604 and bl=64@1024 both compile AND are the
                # fastest feasible blocks — Mosaic's internal temporaries
                # grow superlinearly with the strip height
                continue
            rows_bwd = 4 * bl * inner * io_bytes * 2   # q/do/dq(+spare)
            dkv = 2 * S * inner * 4                    # f32 accumulators
            bwd = (kv + rows_bwd + dkv + mask + bias_b
                   + (6 if rate > 0.0 else 4) * strip)
            if io_bytes >= 4:
                bwd += 2.5 * 1024 * 1024  # f32 calibration (see fwd)
            need = max(fwd, bwd)
        if need < int(_VMEM_LIMIT * 0.9):
            return bl
    return 0


def _select_attention_mode(B: int, L: int, S: int, inner: int,
                           num_heads: int, has_bias: bool, rate: float,
                           io_bytes: int = 4, need_bwd: bool = True,
                           bias_grad: bool = False):
    """'full' (all heads per program — flagship), 'perhead' (one head per
    program — long sequences, e.g. video QA S≈604), 'ltiled' (all heads,
    query rows tiled — S beyond the per-head ceiling, e.g. S≥700 training),
    or None (XLA path). ``FORCE_MODE`` overrides for benches/tests."""
    if FORCE_MODE is not None:
        return FORCE_MODE
    if _full_kernel_fits(B, L, S, inner, num_heads, has_bias, rate,
                         io_bytes):
        return "full"
    perhead_ok = _perhead_fits(L, S, inner // num_heads, has_bias, rate,
                               io_bytes, need_bwd, bias_grad)
    ltiled_ok = (not bias_grad
                 and _ltiled_block(L, S, inner, num_heads, has_bias, rate,
                                   io_bytes, need_bwd) > 0)
    # Preference measured e2e (PERF.md "Long-sequence shapes", r4): BART
    # video S=604 — ltiled never lost across paired same-session A/Bs
    # (400.0 vs 378.9 in one session, 376.4 vs 375.2 in another — i.e.
    # parity-to-better within tunnel noise) and it extends the feasible-S
    # ceiling, so it is the default; but T5 (per-head bias) loses (166.8
    # vs 197.0: the bias block VMEM forces tiny row blocks in the ltiled
    # backward), and short-query sites (decoder cross, L≈10) would pad
    # rows up to a full block for nothing.
    # io_bytes <= 2: the preference is asserted only where it was
    # hardware-validated (bf16 — every e2e A/B and probe); f32 long
    # sequences keep the per-head kernels (the f32 ltiled backward's
    # VMEM behavior ran ~2.1M past the model on the tvc CLI shape and is
    # a fallback configuration, not a perf path). ltiled remains the
    # last resort for f32 shapes past the per-head ceiling, now under
    # the f32-calibrated block model.
    # Bias sites join the preference only in the FORWARD direction
    # (need_bwd=False) and only when the flag below is on: the ltiled
    # fwd measured faster than perhead for T5 bias shapes in isolation
    # (3.29 vs 3.77 ms @ S=604 bf16) while its BACKWARD loses badly —
    # the bwd dispatcher passes need_bwd=True and keeps perhead.
    bias_pref_ok = (not has_bias
                    or (PREFER_LTILED_FWD_WITH_BIAS and not need_bwd))
    # Short-QUERY long-KV sites (decoder cross at video shapes: L≈10,
    # S≈604): the per-head kernels transpose the (B, S, H·Dh) K/V to
    # (B, H, S, Dh) at every layer fwd+bwd — the 17.5 ms/step formatting
    # residual of the r4 video profile (PERF.md). The L-tiled family keeps
    # the projection-native layout; with blocks capped at the padded query
    # length (see _ltiled_block) the padding compute is one 16-row strip.
    # S capped at 704: the route's wins are measured at S=604 (+6.6%) and
    # S=704 (+9.7%), but at S=1024 adding the short-q cross kernels to the
    # step graph pushes the ENCODER self-attn kernel's scoped-vmem stack
    # over the limit (16.61M vs 16M, layer 5 — 2026-08-20, with or without
    # the small FFN tile) — another instance of the graph-context-dependent
    # Mosaic allocation documented in PERF.md "Toolchain drift". Beyond the
    # measured window the cross sites keep the per-head kernels.
    short_q_ok = (PREFER_LTILED_SHORT_Q and L < 128 and 512 <= S <= 704)
    if (ltiled_ok and bias_pref_ok and io_bytes <= 2
            and ((PREFER_LTILED_OVER_PERHEAD and L >= 128) or short_q_ok)):
        return "ltiled"
    if perhead_ok:
        return "perhead"
    if ltiled_ok:
        return "ltiled"
    return None


#: Test/bench hook: force a specific kernel family ('full' | 'perhead' |
#: 'ltiled') regardless of the VMEM feasibility estimates. None = auto.
FORCE_MODE: Optional[str] = None

#: Long-sequence preference: when 'full' doesn't fit and BOTH long-sequence
#: families do, take the L-tiled kernels instead of the per-head ones (only
#: for bias-free, L>=128 sites — see _select_attention_mode). Default True
#: from the e2e A/Bs (PERF.md "Long-sequence (video) shapes", r4): BART
#: video S=604 never measured worse than per-head (400.0 vs 378.9, then
#: 376.4 vs 375.2 in a second session — parity within tunnel noise),
#: S=704 neutral (343.9 vs 345.1), and the family extends the feasible-S
#: ceiling; the excluded cases (T5 per-head bias, short-query cross
#: sites) measured worse under ltiled and keep the per-head kernels.
PREFER_LTILED_OVER_PERHEAD: bool = True

#: Extend the preference to BIAS sites in the forward direction only
#: (T5 relative-position bias; the backward keeps perhead). MEASURED AND
#: REJECTED as the default (same-session e2e A/B, 2026-08-19:
#: t5_video_fwdlt 194.4 vs t5_video_base 197.1 ex/s — the isolated
#: kernel's fwd win, 3.29 vs 3.77 ms, is offset e2e by the L-padding and
#: per-program bias-block loads the ltiled layout adds). Kept as a knob
#: for future toolchains.
PREFER_LTILED_FWD_WITH_BIAS: bool = False

#: Short-query preference: route bias-free L<128, 512<=S<=704 sites (the
#: video decoder-cross shapes) onto the L-tiled kernels instead of per-head,
#: killing their K/V (B,S,H·Dh)↔(B,H,S,Dh) transposes (the 17.5 ms/step
#: formatting residual of the r4 video profile). Default True from the
#: same-session e2e A/Bs (scripts/bench_step_variants.py, 2026-08-20,
#: two independent sessions): BART video S=604 **403.2 vs 378.4** then
#: **399.8 vs 374.7** ex/s (+6.6%/+6.7%); T5 video **209.7 vs 198.4**
#: (+5.7%); losses bit-stable. The block cap at the 8-row-padded query
#: length (_ltiled_block) is what makes this viable: the strip is 16 rows
#: for L=10, not a 128-row padding sweep. S=704 also wins (378.2 vs
#: 344.7, +9.7%); S=1024 is EXCLUDED — see the gate in
#: _select_attention_mode (graph-context scoped-vmem OOM).
PREFER_LTILED_SHORT_Q: bool = True


def fused_attention_fits(B: int, L: int, S: int, inner: int, num_heads: int,
                         has_bias: bool, rate: float, io_bytes: int = 4,
                         need_bwd: bool = True,
                         bias_grad: bool = False) -> bool:
    """Can SOME Pallas attention kernel run this shape inside the 16 MB
    scoped-vmem stack? Long-sequence shapes (video QA S≈604) that blow the
    all-heads kernels route to the one-head-per-program variant; only
    shapes beyond both (e.g. S≳700 training with bias+dropout) fall back
    to the XLA einsum path. ``need_bwd=False`` (eval/generation callers)
    requires only the forward to fit; the backward then has an XLA
    recompute fallback, so a stray gradient is slow, never wrong."""
    return _select_attention_mode(B, L, S, inner, num_heads, has_bias, rate,
                                  io_bytes, need_bwd, bias_grad) is not None


def _heads(q_ref, h, head_dim):
    sl = slice(h * head_dim, (h + 1) * head_dim)
    return q_ref[:, :, sl]


def _causal_allowed(L: int, S: int):
    """(L, S) bool: query i may see key j iff j <= i + (S - L) — the
    past-offset form (prefix-tuning prepends S-L always-visible slots)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (L, S), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (L, S), 1)
    return col <= row + (S - L)


def _compact_mask(mask_ref, L: int):
    """(TBm, 8, S) block of 8 identical sublane rows → (TBm, L, S) f32.

    Mosaic cannot broadcast a size-1 sublane dim (and a (tb, S) 2-D block
    violates the 8×128 tiling rule when tb isn't a multiple of 8), so the
    caller ships the length-collapsed mask with its sublane dim pre-padded
    to one full 8-row tile; tiling up to L is aligned concatenation of
    whole tiles — pure in-register VPU work, no HBM. The old dense path
    loaded a (TB, L, S) fp32 mask per program instead — the dominant HBM
    traffic of the kernel."""
    m = mask_ref[...].astype(jnp.float32)  # (TBm, 8, S)
    reps = (L + 7) // 8
    if reps > 1:
        m = jnp.concatenate([m] * reps, axis=1)
    return m[:, :L]


def _shared_terms(per_head_mask, causal, compact, q_ref, k_ref, mask_ref):
    """Head-independent additive terms, computed once per program."""
    L, S = q_ref.shape[1], k_ref.shape[1]
    if compact:
        shared = _compact_mask(mask_ref, L)
    elif per_head_mask:
        shared = None
    else:
        shared = mask_ref[:, 0].astype(jnp.float32)
    allowed = _causal_allowed(L, S)[None] if causal else None
    return shared, allowed


def _head_logits(head_dim, per_head_mask, q_ref, k_ref, mask_ref, bias_ref,
                 shared, allowed, h):
    q = _heads(q_ref, h, head_dim)      # (TB, L, Dh)
    k = _heads(k_ref, h, head_dim)      # (TB, S, Dh)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    if shared is not None:
        s = s + shared
    else:
        s = s + mask_ref[:, h].astype(jnp.float32)
    if bias_ref is not None:
        # batch-shared per-head additive bias (T5 relative positions):
        # loaded once per program — the per-batch (B,H,L,S) sum the XLA
        # path would materialize never exists
        s = s + bias_ref[0, h].astype(jnp.float32)
    if allowed is not None:
        s = jnp.where(allowed, s, jnp.float32(-1e9))
    return s


def _fwd_kernel(num_heads: int, head_dim: int, per_head_mask: bool,
                causal: bool, compact: bool, has_bias: bool, rate: float,
                *refs):
    if rate > 0.0:
        seed_ref, *refs = refs
    else:
        seed_ref = None
    q_ref, k_ref, v_ref, mask_ref, *rest = refs
    bias_ref = rest[0] if has_bias else None
    out_ref = rest[-1]
    shared, allowed = _shared_terms(per_head_mask, causal, compact,
                                    q_ref, k_ref, mask_ref)
    # NOTE: batching all H softmaxes into one call over sublane-concatenated
    # (TB, H·L, S) logits was tried and is perf-NEUTRAL in the forward
    # (4663 vs 4670 ex/s e2e) and VMEM-infeasible in the backward
    # (p/dp/ds resident together: 21.5 MB > the 16 MB scoped stack) — the
    # per-head loop is not op-issue-bound. See PERF.md.
    for h in range(num_heads):
        p = jax.nn.softmax(
            _head_logits(head_dim, per_head_mask, q_ref, k_ref, mask_ref,
                         bias_ref, shared, allowed, h),
            axis=-1)
        if rate > 0.0:
            row_base = pl.program_id(0) * q_ref.shape[0]
            keep = keep_mask(p.shape, row_base, head_seed(seed_ref[0], h),
                             rate)
            p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
        p = p.astype(q_ref.dtype)
        o = jax.lax.dot_general(p, _heads(v_ref, h, head_dim),
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        out_ref[:, :, h * head_dim:(h + 1) * head_dim] = o.astype(out_ref.dtype)


def _specs(B, L, S, inner, Hm, Bm, Lm, tb, ms):
    spec_q = pl.BlockSpec((tb, L, inner), lambda b: (b, 0, 0), memory_space=ms)
    spec_kv = pl.BlockSpec((tb, S, inner), lambda b: (b, 0, 0), memory_space=ms)
    if Lm == 1 and Hm == 1:
        # compact (length-collapsed) mask: rides as (Bm, 8, S) — one full
        # 8-row sublane tile of identical rows (see _compact_mask)
        if Bm == 1:
            spec_m = pl.BlockSpec((1, 8, S), lambda b: (0, 0, 0),
                                  memory_space=ms)
        else:
            spec_m = pl.BlockSpec((tb, 8, S), lambda b: (b, 0, 0),
                                  memory_space=ms)
    elif Bm == 1:
        spec_m = pl.BlockSpec((1, Hm, Lm, S), lambda b: (0, 0, 0, 0),
                              memory_space=ms)
    else:
        spec_m = pl.BlockSpec((tb, Hm, Lm, S), lambda b: (b, 0, 0, 0),
                              memory_space=ms)
    return spec_q, spec_kv, spec_m


def _pallas_attention(q: Array, k: Array, v: Array, mask: Array,
                      num_heads: int, causal: bool = False,
                      bias: Optional[Array] = None, rate: float = 0.0,
                      seed: Optional[Array] = None,
                      *, interpret: bool = False) -> Array:
    B, L, inner = q.shape
    S = k.shape[1]
    head_dim = inner // num_heads
    mode = _select_attention_mode(B, L, S, inner, num_heads, bias is not None,
                                  rate, jnp.dtype(q.dtype).itemsize,
                                  need_bwd=False)
    if mode == "perhead":
        return _pallas_attention_perhead(q, k, v, mask, num_heads, causal,
                                         bias, rate, seed,
                                         interpret=interpret)
    if mode == "ltiled":
        return _pallas_attention_ltiled(q, k, v, mask, num_heads, causal,
                                        bias, rate, seed,
                                        interpret=interpret)
    Hm, Lm = mask.shape[1], mask.shape[2]
    per_head = Hm == num_heads and num_heads > 1
    compact = Lm == 1 and Hm == 1
    if compact:
        mask = jnp.broadcast_to(mask.reshape(mask.shape[0], 1, S),
                                (mask.shape[0], 8, S))
    tb = _block_rows(B)
    ms = pl.ANY if interpret else pltpu.VMEM
    spec_q, spec_kv, spec_m = _specs(B, L, S, inner, Hm, mask.shape[0], Lm,
                                     tb, ms)
    pre_specs, pre_args = [], []
    if rate > 0.0:
        pre_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        pre_args = [seed]
    in_specs = pre_specs + [spec_q, spec_kv, spec_kv, spec_m]
    args = pre_args + [q, k, v, mask]
    if bias is not None:
        assert bias.shape == (1, num_heads, L, S), bias.shape
        in_specs.append(pl.BlockSpec((1, num_heads, L, S),
                                     lambda b: (0, 0, 0, 0), memory_space=ms))
        args.append(bias)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads, head_dim, per_head, causal,
                          compact, bias is not None, rate),
        grid=(B // tb,),
        in_specs=in_specs,
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((B, L, inner), q.dtype),
        interpret=interpret,
    )(*args)


def _ph_mask_term(compact, mask_ref, L):
    """The additive mask for one (L, S) score matrix, from the per-head
    kernels' mask block: compact (1, 8, S) — 8 identical sublane rows,
    tiled up to L by whole-tile concatenation (see _compact_mask) — or
    dense (1, 1|H-indexed, L, S)."""
    if compact:
        m = mask_ref[0].astype(jnp.float32)      # (8, S)
        reps = (L + 7) // 8
        if reps > 1:
            m = jnp.concatenate([m] * reps, axis=0)
        return m[:L]
    return mask_ref[0, 0].astype(jnp.float32)    # (L, S)


def _ph_probs(causal, compact, has_bias, rate, seed_ref, q_ref, k_ref,
              mask_ref, bias_ref):
    """Recompute shared by the per-head fwd and bwd kernels: softmax probs
    ``p`` (pre-dropout) and the regenerated keep mask (or None)."""
    L = q_ref.shape[2]
    h = pl.program_id(0)
    b = pl.program_id(1)
    s = jax.lax.dot_general(q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (L, S)
    s = s + _ph_mask_term(compact, mask_ref, L)
    if has_bias:
        s = s + bias_ref[0, 0].astype(jnp.float32)
    if causal:
        s = jnp.where(_causal_allowed(L, k_ref.shape[2]), s,
                      jnp.float32(-1e9))
    p = jax.nn.softmax(s, axis=-1)
    keep = None
    if rate > 0.0:
        # same element identity as the all-heads kernels / the jnp
        # reference: flat (batch, L, S) index + per-head seed offset
        keep = keep_mask(p.shape, b * L, head_seed(seed_ref[0], h), rate)
    return p, keep


def _ph_fwd_kernel(causal: bool, compact: bool, has_bias: bool, rate: float,
                   *refs):
    if rate > 0.0:
        seed_ref, *refs = refs
    else:
        seed_ref = None
    q_ref, k_ref, v_ref, mask_ref, *rest = refs
    bias_ref = rest[0] if has_bias else None
    out_ref = rest[-1]
    p, keep = _ph_probs(causal, compact, has_bias, rate, seed_ref,
                        q_ref, k_ref, mask_ref, bias_ref)
    if keep is not None:
        p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
    o = jax.lax.dot_general(p.astype(q_ref.dtype), v_ref[0, 0],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    out_ref[0, 0] = o.astype(out_ref.dtype)


def _ph_specs(B, L, S, hd, mask, num_heads, ms):
    """(q/k/v/out specs, mask spec, prepared mask) for the (H, B) grid."""
    Bm, Hm, Lm = mask.shape[0], mask.shape[1], mask.shape[2]
    compact = Lm == 1 and Hm == 1
    spec_q = pl.BlockSpec((1, 1, L, hd), lambda h, b: (b, h, 0, 0),
                          memory_space=ms)
    spec_kv = pl.BlockSpec((1, 1, S, hd), lambda h, b: (b, h, 0, 0),
                           memory_space=ms)
    if compact:
        mask = jnp.broadcast_to(mask.reshape(Bm, 1, S), (Bm, 8, S))
        spec_m = pl.BlockSpec(
            (1, 8, S), lambda h, b: (b if Bm > 1 else 0, 0, 0),
            memory_space=ms)
    else:
        assert Lm == L, (Lm, L)  # Lm==1 non-compact never occurs (Hm>1 ⇒ Lm=L)
        spec_m = pl.BlockSpec(
            (1, 1, L, S),
            lambda h, b: (b if Bm > 1 else 0, h if Hm > 1 else 0, 0, 0),
            memory_space=ms)
    return spec_q, spec_kv, spec_m, mask, compact


def _to_heads(x, num_heads):
    B, L, inner = x.shape
    return x.reshape(B, L, num_heads, inner // num_heads).transpose(0, 2, 1, 3)


def _pallas_attention_perhead(q: Array, k: Array, v: Array, mask: Array,
                              num_heads: int, causal: bool = False,
                              bias: Optional[Array] = None, rate: float = 0.0,
                              seed: Optional[Array] = None,
                              *, interpret: bool = False) -> Array:
    """Long-sequence fused attention: grid (H, B), ONE head's (L, S) score
    matrix per program, q/k/v rearranged to (B, H, L|S, Dh) so every block
    equals its array dims (legal at any L/S — no 8×128 divisibility needed).
    The working set is H× smaller than the all-heads kernels', extending
    the Pallas ceiling from S≈330 to the video-QA joint length (S≈604,
    PERF.md "Long-sequence shapes"); the layout transposes it re-introduces
    are ~2 orders of magnitude cheaper than the (B, H, S, S) HBM score
    round-trips the XLA path pays at these shapes."""
    B, L, inner = q.shape
    S = k.shape[1]
    hd = inner // num_heads
    ms = pl.ANY if interpret else pltpu.VMEM
    spec_q, spec_kv, spec_m, mask, compact = _ph_specs(
        B, L, S, hd, mask, num_heads, ms)
    pre_specs, pre_args = [], []
    if rate > 0.0:
        pre_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        pre_args = [seed]
    in_specs = pre_specs + [spec_q, spec_kv, spec_kv, spec_m]
    args = pre_args + [_to_heads(q, num_heads), _to_heads(k, num_heads),
                       _to_heads(v, num_heads), mask]
    if bias is not None:
        assert bias.shape == (1, num_heads, L, S), bias.shape
        in_specs.append(pl.BlockSpec((1, 1, L, S), lambda h, b: (0, h, 0, 0),
                                     memory_space=ms))
        args.append(bias)
    out4 = pl.pallas_call(
        functools.partial(_ph_fwd_kernel, causal, compact, bias is not None,
                          rate),
        grid=(num_heads, B),
        in_specs=in_specs,
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((B, num_heads, L, hd), q.dtype),
        interpret=interpret,
    )(*args)
    return out4.transpose(0, 2, 1, 3).reshape(B, L, inner)


def _ph_bwd_kernel(causal: bool, compact: bool, has_bias: bool, rate: float,
                   bias_grad: bool, *refs):
    """One head's backward. With ``bias_grad`` the batch-shared bias's
    cotangent dbias[h] = Σ_batch ds[b, h] accumulates into a (1, 1, L, S)
    fp32 block whose index depends only on h — the batch axis is the
    INNER grid dimension, so the block stays grid-resident across the
    whole accumulation (TPU grids are sequential)."""
    if rate > 0.0:
        seed_ref, *refs = refs
    else:
        seed_ref = None
    q_ref, k_ref, v_ref, mask_ref, *rest = refs
    dbias_ref = None
    if bias_grad:
        *rest, dbias_ref = rest
    if has_bias:
        bias_ref, do_ref, dq_ref, dk_ref, dv_ref = rest
    else:
        bias_ref = None
        do_ref, dq_ref, dk_ref, dv_ref = rest
    if bias_grad:
        @pl.when(pl.program_id(1) == 0)
        def _init():
            dbias_ref[...] = jnp.zeros_like(dbias_ref)
    p, keep = _ph_probs(causal, compact, has_bias, rate, seed_ref,
                        q_ref, k_ref, mask_ref, bias_ref)
    if keep is not None:
        inv = 1.0 / (1.0 - rate)
        pd = jnp.where(keep, p * inv, 0.0)
    else:
        pd = p
    do = do_ref[0, 0].astype(jnp.float32)        # (L, Dh)
    kk = k_ref[0, 0].astype(jnp.float32)
    vv = v_ref[0, 0].astype(jnp.float32)
    qq = q_ref[0, 0].astype(jnp.float32)
    # dv = pd^T @ do (contract L); dp = do @ v^T; route dp through the
    # dropout mask; ds = p * (dp - rowsum(dp*p)) (softmax bwd, UNdropped p)
    dv = jax.lax.dot_general(pd, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, vv, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if keep is not None:
        dp = jnp.where(keep, dp * inv, 0.0)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    if bias_grad:
        dbias_ref[0, 0] = dbias_ref[0, 0] + ds
    dq = jax.lax.dot_general(ds, kk, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds, qq, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _pallas_attention_perhead_bwd(q, k, v, mask, do, num_heads,
                                  causal=False, bias=None, rate=0.0,
                                  seed=None, bias_grad=False,
                                  *, interpret=False):
    B, L, inner = q.shape
    S = k.shape[1]
    hd = inner // num_heads
    ms = pl.ANY if interpret else pltpu.VMEM
    spec_q, spec_kv, spec_m, mask, compact = _ph_specs(
        B, L, S, hd, mask, num_heads, ms)
    pre_specs, pre_args = [], []
    if rate > 0.0:
        pre_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        pre_args = [seed]
    in_specs = pre_specs + [spec_q, spec_kv, spec_kv, spec_m]
    args = pre_args + [_to_heads(q, num_heads), _to_heads(k, num_heads),
                       _to_heads(v, num_heads), mask]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, 1, L, S), lambda h, b: (0, h, 0, 0),
                                     memory_space=ms))
        args.append(bias)
    in_specs.append(spec_q)
    args.append(_to_heads(do, num_heads))
    bias_grad = bias_grad and bias is not None
    out_specs = (spec_q, spec_kv, spec_kv)
    out_shape = (jax.ShapeDtypeStruct((B, num_heads, L, hd), q.dtype),
                 jax.ShapeDtypeStruct((B, num_heads, S, hd), k.dtype),
                 jax.ShapeDtypeStruct((B, num_heads, S, hd), v.dtype))
    if bias_grad:
        out_specs = out_specs + (pl.BlockSpec((1, 1, L, S),
                                              lambda h, b: (0, h, 0, 0),
                                              memory_space=ms),)
        out_shape = out_shape + (jax.ShapeDtypeStruct((1, num_heads, L, S),
                                                      jnp.float32),)
    outs = pl.pallas_call(
        functools.partial(_ph_bwd_kernel, causal, compact, bias is not None,
                          rate, bias_grad),
        grid=(num_heads, B),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    def back(x4, Lx):
        return x4.transpose(0, 2, 1, 3).reshape(B, Lx, inner)
    dq, dk, dv = back(outs[0], L), back(outs[1], S), back(outs[2], S)
    if bias_grad:
        return dq, dk, dv, outs[3]
    return dq, dk, dv


# ---------------------------------------------------------------------------
# L-tiled all-heads kernels (flash-style query-row tiling; any S)
# ---------------------------------------------------------------------------
#
# The per-head kernels cap out when one (L, S) score matrix's ~5 backward
# copies blow the scoped-vmem stack (S≈700 with bias+dropout). These
# kernels tile the QUERY rows instead: grid (B, ceil(L/block_l)), each
# program computing block_l query rows against ALL S keys for every head —
# the score working set shrinks to (block_l, S) strips while the softmax
# stays exact (full row present; no online max/sum rescaling needed).
# k/v ride as full (S, inner) blocks whose index depends only on the batch
# grid dim, so they stay grid-resident across the row sweep.
#
# Two structural wins over the per-head family:
# * ANY sequence length fits — block_l shrinks to keep strips in VMEM
#   while k/v io (S·inner) stays small until S is in the thousands;
# * q/k/v keep the native (B, L, H·Dh) projection layout — none of the
#   (B, L, H·Dh) ↔ (B, H, L, Dh) transposes the per-head kernels
#   re-introduced (22% of the video-QA step was data formatting).
#
# The trainable-bias cotangent (dbias = Σ_batch ds) is NOT supported here:
# its accumulation needs the batch axis innermost, which would break the
# dk/dv accumulation (batch outer, rows inner). bias_grad callers fall
# back to the XLA path — only full-FT T5 past the per-head ceiling hits it.


def _lt_pad_rows(x, Lp):
    if x is None or x.shape[1] == Lp:
        return x
    return jnp.pad(x, ((0, 0), (0, Lp - x.shape[1]), (0, 0)))


def _lt_prepare(q, mask, bias, do, num_heads, block_l):
    """Pad query rows to a block_l multiple; pad mask/bias row dims to
    match. Padded rows produce garbage sliced off by the caller; their
    gradients vanish because the padded ``do`` rows are zero."""
    B, L, inner = q.shape
    Lp = -(-L // block_l) * block_l
    q = _lt_pad_rows(q, Lp)
    do = _lt_pad_rows(do, Lp)
    if mask.shape[2] == 1 and mask.shape[1] > 1:
        # per-head length-collapsed (B|1, H, 1, S): the compact fast path
        # is Hm==1-only, and the dense spec below indexes the row dim with
        # the row-block id — a dim-2 extent of 1 would be an out-of-bounds
        # block (advisor r4). Broadcast to full Lp rows; no current call
        # site produces this shape (T5 per-head terms ride the bias arg),
        # so the materialization cost never occurs in practice.
        mask = jnp.broadcast_to(mask, mask.shape[:2] + (Lp, mask.shape[3]))
    elif mask.shape[2] not in (1, Lp):  # dense (B|1, 1|H, L, S) mask
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, Lp - mask.shape[2]), (0, 0)))
    if bias is not None and bias.shape[2] != Lp:
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, Lp - bias.shape[2]),
                              (0, 0)))
    return q, mask, bias, do, Lp


def _lt_specs(B, S, inner, mask, num_heads, block_l, ms):
    """Block specs for the (B, n_row_blocks) grid."""
    Bm, Hm, Lm = mask.shape[0], mask.shape[1], mask.shape[2]
    compact = Lm == 1 and Hm == 1
    spec_q = pl.BlockSpec((1, block_l, inner), lambda b, l: (b, l, 0),
                          memory_space=ms)
    spec_kv = pl.BlockSpec((1, S, inner), lambda b, l: (b, 0, 0),
                           memory_space=ms)
    if compact:
        mask = jnp.broadcast_to(mask.reshape(Bm, 1, S), (Bm, 8, S))
        spec_m = pl.BlockSpec((1, 8, S),
                              lambda b, l: (b if Bm > 1 else 0, 0, 0),
                              memory_space=ms)
    else:
        spec_m = pl.BlockSpec(
            (1, Hm, block_l, S),
            lambda b, l: (b if Bm > 1 else 0, 0, l, 0), memory_space=ms)
    return spec_q, spec_kv, spec_m, mask, compact


def _lt_mask_term(compact, per_head, mask_ref, block_l, h):
    if compact:
        m = mask_ref[0].astype(jnp.float32)          # (8, S)
        reps = (block_l + 7) // 8
        if reps > 1:
            m = jnp.concatenate([m] * reps, axis=0)
        return m[:block_l]
    return mask_ref[0, h if per_head else 0].astype(jnp.float32)


def _lt_head(head_dim, per_head, compact, has_bias, causal, rate, L, S,
             block_l, seed_ref, q_ref, k_ref, mask_ref, bias_ref, h):
    """One head's (block_l, S) softmax probs + dropout keep mask."""
    sl = slice(h * head_dim, (h + 1) * head_dim)
    s = jax.lax.dot_general(q_ref[0, :, sl], k_ref[0, :, sl],
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + _lt_mask_term(compact, per_head, mask_ref, block_l, h)
    if has_bias:
        s = s + bias_ref[0, h].astype(jnp.float32)
    row0 = pl.program_id(1) * block_l
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (block_l, S), 0) + row0
        col = jax.lax.broadcasted_iota(jnp.int32, (block_l, S), 1)
        s = jnp.where(col <= row + (S - L), s, jnp.float32(-1e9))
    p = jax.nn.softmax(s, axis=-1)
    keep = None
    if rate > 0.0:
        # same element identity as every other path: global flat index
        # over the REAL (batch, L, S) score tensor + per-head seed offset
        keep = keep_mask((block_l, S), pl.program_id(0) * L + row0,
                         head_seed(seed_ref[0], h), rate)
    return p, keep


def _lt_fwd_kernel(num_heads, head_dim, per_head, compact, has_bias, causal,
                   rate, L, S, block_l, *refs):
    if rate > 0.0:
        seed_ref, *refs = refs
    else:
        seed_ref = None
    q_ref, k_ref, v_ref, mask_ref, *rest = refs
    bias_ref = rest[0] if has_bias else None
    out_ref = rest[-1]
    for h in range(num_heads):
        p, keep = _lt_head(head_dim, per_head, compact, has_bias, causal,
                           rate, L, S, block_l, seed_ref, q_ref, k_ref,
                           mask_ref, bias_ref, h)
        if keep is not None:
            p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
        sl = slice(h * head_dim, (h + 1) * head_dim)
        o = jax.lax.dot_general(p.astype(q_ref.dtype), v_ref[0, :, sl],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        out_ref[0, :, sl] = o.astype(out_ref.dtype)


def _pallas_attention_ltiled(q, k, v, mask, num_heads, causal=False,
                             bias=None, rate=0.0, seed=None,
                             *, block_l=None, interpret=False):
    B, L, inner = q.shape
    S = k.shape[1]
    hd = inner // num_heads
    if block_l is None:
        block_l = _ltiled_block(L, S, inner, num_heads, bias is not None,
                                rate, jnp.dtype(q.dtype).itemsize,
                                need_bwd=False)
    assert block_l > 0
    q, mask, bias, _, Lp = _lt_prepare(q, mask, bias, None, num_heads,
                                       block_l)
    ms = pl.ANY if interpret else pltpu.VMEM
    spec_q, spec_kv, spec_m, mask, compact = _lt_specs(
        B, S, inner, mask, num_heads, block_l, ms)
    per_head = mask.shape[1] == num_heads and num_heads > 1
    pre_specs, pre_args = [], []
    if rate > 0.0:
        pre_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        pre_args = [seed]
    in_specs = pre_specs + [spec_q, spec_kv, spec_kv, spec_m]
    args = pre_args + [q, k, v, mask]
    if bias is not None:
        assert bias.shape == (1, num_heads, Lp, S), bias.shape
        in_specs.append(pl.BlockSpec((1, num_heads, block_l, S),
                                     lambda b, l: (0, 0, l, 0),
                                     memory_space=ms))
        args.append(bias)
    out = pl.pallas_call(
        functools.partial(_lt_fwd_kernel, num_heads, hd, per_head, compact,
                          bias is not None, causal, rate, L, S, block_l),
        grid=(B, Lp // block_l),
        in_specs=in_specs,
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((B, Lp, inner), q.dtype),
        interpret=interpret,
    )(*args)
    return out[:, :L]


def _lt_bwd_kernel(num_heads, head_dim, per_head, compact, has_bias, causal,
                   rate, L, S, block_l, *refs):
    """dk/dv accumulate into f32 (1, S, inner) blocks whose index depends
    only on the batch grid dim — the row sweep is the INNER grid dimension,
    so the blocks stay grid-resident across the whole accumulation (TPU
    grids are sequential); init on the first row block."""
    if rate > 0.0:
        seed_ref, *refs = refs
    else:
        seed_ref = None
    q_ref, k_ref, v_ref, mask_ref, *rest = refs
    if has_bias:
        bias_ref, do_ref, dq_ref, dk_ref, dv_ref = rest
    else:
        bias_ref = None
        do_ref, dq_ref, dk_ref, dv_ref = rest

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        p, keep = _lt_head(head_dim, per_head, compact, has_bias, causal,
                           rate, L, S, block_l, seed_ref, q_ref, k_ref,
                           mask_ref, bias_ref, h)
        if keep is not None:
            inv = 1.0 / (1.0 - rate)
            pd = jnp.where(keep, p * inv, 0.0)
        else:
            pd = p
        do = do_ref[0, :, sl].astype(jnp.float32)   # (block_l, Dh)
        kk = k_ref[0, :, sl].astype(jnp.float32)    # (S, Dh)
        vv = v_ref[0, :, sl].astype(jnp.float32)
        qq = q_ref[0, :, sl].astype(jnp.float32)
        dv = jax.lax.dot_general(pd, do, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, vv, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if keep is not None:
            dp = jnp.where(keep, dp * inv, 0.0)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = jax.lax.dot_general(ds, kk, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, qq, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, sl] = dk_ref[0, :, sl] + dk
        dv_ref[0, :, sl] = dv_ref[0, :, sl] + dv


def _pallas_attention_ltiled_bwd(q, k, v, mask, do, num_heads, causal=False,
                                 bias=None, rate=0.0, seed=None,
                                 *, block_l=None, interpret=False):
    B, L, inner = q.shape
    S = k.shape[1]
    hd = inner // num_heads
    if block_l is None:
        block_l = _ltiled_block(L, S, inner, num_heads, bias is not None,
                                rate, jnp.dtype(q.dtype).itemsize,
                                need_bwd=True)
    assert block_l > 0
    q, mask, bias, do, Lp = _lt_prepare(q, mask, bias, do, num_heads,
                                        block_l)
    ms = pl.ANY if interpret else pltpu.VMEM
    spec_q, spec_kv, spec_m, mask, compact = _lt_specs(
        B, S, inner, mask, num_heads, block_l, ms)
    per_head = mask.shape[1] == num_heads and num_heads > 1
    pre_specs, pre_args = [], []
    if rate > 0.0:
        pre_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        pre_args = [seed]
    in_specs = pre_specs + [spec_q, spec_kv, spec_kv, spec_m]
    args = pre_args + [q, k, v, mask]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, num_heads, block_l, S),
                                     lambda b, l: (0, 0, l, 0),
                                     memory_space=ms))
        args.append(bias)
    in_specs.append(spec_q)
    args.append(do)
    spec_dkv = pl.BlockSpec((1, S, inner), lambda b, l: (b, 0, 0),
                            memory_space=ms)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_lt_bwd_kernel, num_heads, hd, per_head, compact,
                          bias is not None, causal, rate, L, S, block_l),
        grid=(B, Lp // block_l),
        in_specs=in_specs,
        out_specs=(spec_q, spec_dkv, spec_dkv),
        out_shape=(jax.ShapeDtypeStruct((B, Lp, inner), q.dtype),
                   jax.ShapeDtypeStruct((B, S, inner), jnp.float32),
                   jax.ShapeDtypeStruct((B, S, inner), jnp.float32)),
        interpret=interpret,
    )(*args)
    return dq[:, :L], dk.astype(k.dtype), dv.astype(v.dtype)


def _xla_attention_bwd(q, k, v, mask, do, num_heads, causal=False,
                       bias=None, rate=0.0, seed=None, bias_grad=False):
    """Differentiate the jnp reference — the safety-net backward for
    shapes beyond every kernel's VMEM ceiling (correct, HBM-heavy)."""
    if bias is None:
        _, vjp = jax.vjp(
            lambda q_, k_, v_: fused_attention_reference(
                q_, k_, v_, mask, num_heads, causal, None, rate, seed),
            q, k, v)
        return vjp(do)
    _, vjp = jax.vjp(
        lambda q_, k_, v_, b_: fused_attention_reference(
            q_, k_, v_, mask, num_heads, causal, b_, rate, seed),
        q, k, v, bias)
    dq, dk, dv, dbias = vjp(do)
    if bias_grad:
        return dq, dk, dv, dbias.astype(jnp.float32)
    return dq, dk, dv


def fused_attention_reference(q, k, v, mask, num_heads, causal=False,
                              bias=None, rate=0.0, seed=None):
    B, L, inner = q.shape
    S = k.shape[1]
    hd = inner // num_heads
    qh = q.reshape(B, L, num_heads, hd)
    kh = k.reshape(B, S, num_heads, hd)
    vh = v.reshape(B, S, num_heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32)
    s = s + mask.astype(jnp.float32)  # (B|1, 1|H, 1|L, S) broadcasts
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    if causal:
        s = jnp.where(_causal_allowed(L, S)[None, None], s,
                      jnp.float32(-1e9))
    p = jax.nn.softmax(s, axis=-1)
    if rate > 0.0:
        # the kernel's exact hash mask, computed with plain jnp ops
        keep = jnp.stack([keep_mask((B, L, S), jnp.uint32(0),
                                    head_seed(seed[0], h), rate)
                          for h in range(num_heads)], axis=1)
        p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
    p = p.astype(q.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, vh)
    return o.reshape(B, L, inner)


def _bwd_kernel(num_heads: int, head_dim: int, per_head_mask: bool,
                causal: bool, compact: bool, has_bias: bool, rate: float,
                bias_grad: bool, *refs):
    """Recomputes p in VMEM and emits dq/dk/dv — no HBM round trips for the
    (TB, L, S) intermediates. With ``rate`` > 0 the forward's dropout mask
    is regenerated from (seed, head, element index) — nothing was saved.
    With ``bias_grad`` the batch-shared bias's cotangent dbias[h] =
    Σ_batch ds[b, h] accumulates into a grid-resident (1, H, L, S) fp32
    output block (constant index_map — TPU grids are sequential)."""
    if rate > 0.0:
        seed_ref, *refs = refs
    else:
        seed_ref = None
    q_ref, k_ref, v_ref, mask_ref, *rest = refs
    dbias_ref = None
    if bias_grad:
        *rest, dbias_ref = rest
    if has_bias:
        bias_ref, do_ref, dq_ref, dk_ref, dv_ref = rest
    else:
        bias_ref = None
        do_ref, dq_ref, dk_ref, dv_ref = rest
    if bias_grad:
        @pl.when(pl.program_id(0) == 0)
        def _init():
            dbias_ref[...] = jnp.zeros_like(dbias_ref)
    shared, allowed = _shared_terms(per_head_mask, causal, compact,
                                    q_ref, k_ref, mask_ref)
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        do = do_ref[:, :, sl].astype(jnp.float32)
        s = _head_logits(head_dim, per_head_mask, q_ref, k_ref, mask_ref,
                         bias_ref, shared, allowed, h)
        p = jax.nn.softmax(s, axis=-1)
        if rate > 0.0:
            row_base = pl.program_id(0) * q_ref.shape[0]
            keep = keep_mask(p.shape, row_base, head_seed(seed_ref[0], h),
                             rate)
            inv = 1.0 / (1.0 - rate)
            pd = jnp.where(keep, p * inv, 0.0)  # the forward's dropped probs
        else:
            keep = None
            pd = p
        # dv = pd^T @ do   (contract L)
        dv = jax.lax.dot_general(pd, do, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        # dp = do @ v^T (grad wrt dropped probs) ; route through the mask ;
        # ds = p * (dp - rowsum(dp*p))  (softmax bwd uses UNdropped p)
        dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                                 (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        if keep is not None:
            dp = jnp.where(keep, dp * inv, 0.0)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        if bias_grad:
            dbias_ref[0, h] = dbias_ref[0, h] + jnp.sum(ds, axis=0)
        dq = jax.lax.dot_general(ds, k.astype(jnp.float32),
                                 (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q.astype(jnp.float32),
                                 (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dq_ref[:, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[:, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, sl] = dv.astype(dv_ref.dtype)


def _pallas_attention_bwd(q, k, v, mask, do, num_heads, causal=False,
                          bias=None, rate=0.0, seed=None, bias_grad=False,
                          *, interpret=False):
    B, L, inner = q.shape
    S = k.shape[1]
    head_dim = inner // num_heads
    mode = _select_attention_mode(B, L, S, inner, num_heads,
                                  bias is not None, rate,
                                  jnp.dtype(q.dtype).itemsize,
                                  need_bwd=True, bias_grad=bias_grad)
    if mode != "full":
        # the forward ran a long-sequence path — pick the matching backward
        if mode == "perhead":
            return _pallas_attention_perhead_bwd(
                q, k, v, mask, do, num_heads, causal, bias, rate, seed,
                bias_grad=bias_grad, interpret=interpret)
        if mode == "ltiled" and not bias_grad:
            # (no dbias entry — fused_attention's _bwd zero-fills when
            # bias_grad is False, matching the perhead contract)
            return _pallas_attention_ltiled_bwd(
                q, k, v, mask, do, num_heads, causal, bias, rate, seed,
                interpret=interpret)
        return _xla_attention_bwd(q, k, v, mask, do, num_heads, causal,
                                  bias, rate, seed, bias_grad=bias_grad)
    Hm, Lm = mask.shape[1], mask.shape[2]
    per_head = Hm == num_heads and num_heads > 1
    compact = Lm == 1 and Hm == 1
    if compact:
        mask = jnp.broadcast_to(mask.reshape(mask.shape[0], 1, S),
                                (mask.shape[0], 8, S))
    # dropout adds keep + dropped-probs score-space buffers to the already
    # p/dp/ds-resident backward: tb=15 at flagship T5 encoder shapes blows
    # the 16 MB scoped-vmem stack by ~0.7 MB — halve the block.
    tb = _block_rows(B, cap=8 if rate > 0.0 else 16)
    ms = pl.ANY if interpret else pltpu.VMEM
    spec_q, spec_kv, spec_m = _specs(B, L, S, inner, Hm, mask.shape[0], Lm,
                                     tb, ms)
    pre_specs, pre_args = [], []
    if rate > 0.0:
        pre_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        pre_args = [seed]
    in_specs = pre_specs + [spec_q, spec_kv, spec_kv, spec_m]
    args = pre_args + [q, k, v, mask]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, num_heads, L, S),
                                     lambda b: (0, 0, 0, 0), memory_space=ms))
        args.append(bias)
    in_specs.append(spec_q)
    args.append(do)
    bias_grad = bias_grad and bias is not None
    out_specs = (spec_q, spec_kv, spec_kv)
    out_shape = (jax.ShapeDtypeStruct((B, L, inner), q.dtype),
                 jax.ShapeDtypeStruct((B, S, inner), k.dtype),
                 jax.ShapeDtypeStruct((B, S, inner), v.dtype))
    if bias_grad:
        # fp32 accumulator (cast to bias.dtype by the caller): the block is
        # grid-resident via the constant index_map, so partial sums never
        # round through a low-precision store
        out_specs = out_specs + (pl.BlockSpec((1, num_heads, L, S),
                                              lambda b: (0, 0, 0, 0),
                                              memory_space=ms),)
        out_shape = out_shape + (jax.ShapeDtypeStruct((1, num_heads, L, S),
                                                      jnp.float32),)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads, head_dim, per_head, causal,
                          compact, bias is not None, rate, bias_grad),
        grid=(B // tb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 7, 9))
def fused_attention(q: Array, k: Array, v: Array, mask: Array,
                    num_heads: int, causal: bool = False,
                    bias: Optional[Array] = None, rate: float = 0.0,
                    seed: Optional[Array] = None,
                    bias_grad: bool = False) -> Array:
    """q (B, L, H·Dh) pre-scaled; k, v (B, S, H·Dh); mask additive
    (B|1, 1|H, 1|L, S) — a length-collapsed (.., 1, S) padding mask
    broadcasts inside the kernel, saving the (TB, L, S) fp32 mask load.
    ``causal`` applies the decoder triangular mask in-kernel via iota
    (offset S-L for prefix slots) — no mask tensor materializes in HBM.
    ``bias`` is an optional batch-shared per-head additive (1, H, L, S)
    (T5 relative positions), kept separate from the per-batch mask so the
    (B, H, L, S) sum never materializes. ``rate`` > 0 applies dropout to
    the softmax probabilities in-kernel (T5 training semantics; ``seed``
    is a (1,) int32 driving the hash mask — ops/hashdrop.py — regenerated
    in the backward). Returns (B, L, H·Dh).

    NOTE: the mask is treated as non-differentiable (zero cotangent —
    true always: it only ever carries padding/causal terms). ``bias`` gets
    a zero cotangent by default (frozen in every PET recipe); pass
    ``bias_grad=True`` when the relative bias is trainable (T5 under
    unfreeze_language_model / use_lora / unfreeze_*bias — the freezing
    engine's 'bias' substring rule matches relative_attention_bias, as the
    reference's does) and the backward kernel accumulates the true
    dbias[h] = Σ_batch ds[b, h]."""
    return _pallas_attention(q, k, v, mask, num_heads, causal, bias, rate,
                             seed)


def _fwd(q, k, v, mask, num_heads, causal, bias, rate, seed, bias_grad):
    return (_pallas_attention(q, k, v, mask, num_heads, causal, bias, rate,
                              seed),
            (q, k, v, mask, bias, seed))


def _bwd(num_heads, causal, rate, bias_grad, res, do):
    q, k, v, mask, bias, seed = res
    grads = _pallas_attention_bwd(q, k, v, mask, do, num_heads, causal,
                                  bias, rate, seed,
                                  bias_grad=bias_grad)
    if bias_grad and bias is not None:
        dq, dk, dv, dbias = grads
        dbias = dbias.astype(bias.dtype)
    else:
        dq, dk, dv = grads
        dbias = None if bias is None else jnp.zeros_like(bias)
    return dq, dk, dv, jnp.zeros_like(mask), dbias, None


fused_attention.defvjp(_fwd, _bwd)
