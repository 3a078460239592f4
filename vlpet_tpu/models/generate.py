"""Greedy and beam-search decoding for VLBart/VLT5 — XLA-native.

Replaces the reference's HF GenerationMixin path (reference:
src/modeling_bart.py:1622-1681 prepare/expand overrides + transformers-4.2.1
beam search). Design for TPU:

* ``encode`` runs once; per-layer cross-attention K/V (incl. the VPA) are
  precomputed once — mirroring the reference where the VPA executes only on
  the first decode step and is cached (my_transformers/modeling_bart.py:419-422).
* the decode loop is a ``lax.while_loop`` over a fixed-shape state: static
  max_length, preallocated self-attention KV cache, no host round-trips.
* beam search follows the standard alive/finished formulation with HF
  semantics: finished score = logprob_sum / len**length_penalty
  (length_penalty=1.0, early_stopping=False defaults).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
NEG_INF = -1.0e7


#: Vocab-scale top-k strategy on TPU — bench/test hook
#: (scripts/bench_beam.py --topk). All e2e numbers: flagship B=500,
#: paired same-session A/Bs 2026-08-20 (PERF.md "Beam top-k exactness"):
#:   'exact_hier' (default): hierarchical Pallas sweep + XLA extraction
#:     (ops/topk.py topk_lse_hier) — EXACT torch.topk/lax.top_k
#:     semantics, and since the vocab pad was hoisted into the logits
#:     GEMM (padded_vocab_for_topk) also the FASTEST mode: beam-5
#:     1197 vs approx's 1148 ex/s, greedy 12223 vs 11625. Bit-exact
#:     reference beam parity costs nothing anymore, so it is the default.
#:   'approx': approx_max_k(recall_target=0.99). On jax 0.9.0 only
#:     96.4% of beam rows recover the exact top-10 (greedy: 99.6% the
#:     exact top-2) at the flagship shape — and it measured SLOWER than
#:     exact_hier once the pad was hoisted. Kept as the A/B reference
#:     and for toolchains where the sort custom-call beats the sweep;
#:     its 0.99 recall contract stays regression-guarded on hardware
#:     (tests/test_tpu_hardware.py, bench_beam recall print).
#:   'exact_fused': the iterative k-pass kernel — exact, 920 ex/s.
#:   'exact_xla': lax.top_k + separate logsumexp — exact, 884 ex/s.
TOPK_MODE: str = "exact_hier"


def padded_vocab_for_topk(V: int, k: int):
    """Vocab width the decode-step logits GEMM should emit (or None for the
    natural V) so the exact top-k kernel's per-step HBM pad becomes dead code.

    topk_lse_hier pads a non-128-multiple vocab in HBM every decode step
    (BART 50265->50304: a full (R, V) f32 read+write, ~1.3 ms/step at the
    flagship beam shape — PERF.md "Beam top-k exactness"). The models can
    instead emit the aligned width straight out of the vocab GEMM by padding
    the TIED WEIGHT (and bias) once — loop-invariant, so XLA hoists it out
    of the decode while_loop, where the logits pad could not be. Pad columns
    come out exactly `ops.topk._PAD` (zero weight rows contribute 0.0, the
    bias column is _PAD), bit-identical to the kernel's own pad.

    Returns a width only when the hier kernel would actually pad: mode
    'exact_hier', k routed to the hierarchical sweep (2 < k <= 16, V >= 4k),
    misaligned V, and the vocab-scale non-CPU route where topk_lse runs the
    kernel at all (so the CPU suite's tiny-vocab lax.top_k paths stay
    byte-identical across modes; _FORCE_PAD lets tests exercise the pad).
    T5-base (32128 = 251*128) never pads."""
    if (TOPK_MODE == "exact_hier" and 2 < k <= 16 and V % 128 and V >= 4 * k
            and (_FORCE_PAD or (V >= 4096
                                and jax.default_backend() not in ("cpu",)))):
        return -(-V // 128) * 128
    return None


#: Test hook: exercise the pad-at-GEMM path on the CPU/tiny-vocab routes
#: padded_vocab_for_topk normally exempts (tests/test_generation.py).
_FORCE_PAD: bool = False


def topk_lse(logits: Array, k: int) -> Tuple[Array, Array, Array]:
    """(top_vals (B,k) f32, top_toks (B,k) i32, lse (B,) f32) from raw
    last-token logits — the shared beam/greedy scoring policy for BOTH
    backbones (VLBart/VLT5.decode_step_topk). Exact lax.top_k semantics
    on CPU and in every exact_* TOPK_MODE — including the default
    'exact_hier', which since the pad hoist (padded_vocab_for_topk) is
    also the fastest mode measured (see TOPK_MODE above). (A fused
    projection+lse+exact-topk Pallas kernel over the PROJECTION was
    built r3 and measured slower — PERF.md "What was tried"; ops/topk.py
    fuses only the reduction, reading the logits once.)"""
    if logits.shape[-1] >= 4096 and jax.default_backend() not in ("cpu",):
        if TOPK_MODE == "approx":
            logits = logits.astype(jnp.float32)
            lse = jax.scipy.special.logsumexp(logits, axis=-1)
            vals, toks = jax.lax.approx_max_k(
                logits, k, recall_target=0.99, aggregate_to_topk=True)
            return vals, toks.astype(jnp.int32), lse
        if TOPK_MODE == "exact_hier":
            from vlpet_tpu.ops.topk import topk_lse_hier
            return topk_lse_hier(logits, k)
        if TOPK_MODE == "exact_fused":
            from vlpet_tpu.ops.topk import topk_lse_exact
            return topk_lse_exact(logits, k)
    logits = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    vals, toks = jax.lax.top_k(logits, k)
    return vals, toks.astype(jnp.int32), lse


def init_self_cache(cfg, batch_size: int, max_len: int, dtype=jnp.float32):
    """Preallocated per-layer self-attention KV cache.

    TIME-MAJOR RANK-3 layout (L, B, H*Dh): the per-step write is a
    leading-dim dynamic_update_slice, which XLA performs in place. The
    batch-major layout made XLA copy the whole multi-GB buffer every decode
    step (~6 ms/step at flagship shapes — PERF.md), and TPU tiling forbids
    sub-tile time slices for surgical DMA writes in that layout. The cache
    is rank-3 (heads folded) so the (1, B, H*Dh) update row is a free
    bitcast of the KV projection GEMM's output in the DEFAULT layout — the
    rank-4 (L, B, H, Dh) carry made XLA layout assignment pick a
    batch-minor layout and pay a FULL-cache relayout copy before the Pallas
    beam attend every step (12 layers x 0.48 ms — r3 profile)."""
    b = cfg.backbone
    n_layers = b.decoder_layers if not cfg.is_t5 else b.num_decoder_layers
    if cfg.is_t5:
        heads, head_dim = b.num_heads, b.d_kv
    else:
        heads, head_dim = b.decoder_attention_heads, b.d_model // b.decoder_attention_heads
    layer = lambda: {"k": jnp.zeros((max_len, batch_size, heads * head_dim), dtype),
                     "v": jnp.zeros((max_len, batch_size, heads * head_dim), dtype)}
    return tuple(layer() for _ in range(n_layers))


def _gather_beams(tree, idx: Array, batch: int, beams: int):
    """Select beams: idx (B, K_out) indexes into the beam axis of every leaf
    with leading dims (B, K_in, ...). Only small integer trees (sequences,
    ancestry) pass through here — the KV cache is never physically
    reordered (see ops/decode.py)."""

    def take(x):
        return jnp.take_along_axis(
            x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1)

    return jax.tree_util.tree_map(take, tree)


def greedy_generate(decode_topk: Callable, cache, batch_size: int,
                    max_length: int, decoder_start_token_id: int,
                    eos_token_id: int, pad_token_id: int,
                    bos_token_id: Optional[int] = None) -> Array:
    """decode_topk(token_ids (B,1), pos, cache, beam_anc, k) ->
    (top_vals (B,k), top_toks (B,k), lse (B,), cache) — greedy needs only
    the k=1 argmax token; the top-k reduction happens inside the decode
    step (models decode_step_topk) so the (B, V) logits never cross it.

    Returns sequences (B, max_length) including the start token at position 0.
    """
    seqs = jnp.full((batch_size, max_length), pad_token_id, jnp.int32)
    seqs = seqs.at[:, 0].set(decoder_start_token_id)
    finished = jnp.zeros((batch_size,), jnp.bool_)

    def cond(state):
        i, _, finished, _ = state
        return (i < max_length - 1) & ~jnp.all(finished)

    def body(state):
        i, seqs, finished, cache = state
        tok = jax.lax.dynamic_slice(seqs, (0, i), (batch_size, 1))
        _, toks, _, cache = decode_topk(tok, i, cache, None, 1)
        next_tok = toks[:, 0].astype(jnp.int32)
        next_tok = jnp.where(finished, pad_token_id, next_tok)
        seqs = jax.lax.dynamic_update_slice(seqs, next_tok[:, None], (0, i + 1))
        finished = finished | (next_tok == eos_token_id)
        return (i + 1, seqs, finished, cache)

    _, seqs, _, _ = jax.lax.while_loop(cond, body, (0, seqs, finished, cache))
    return seqs


def beam_generate(decode_topk: Callable, cache, batch_size: int, num_beams: int,
                  max_length: int, decoder_start_token_id: int,
                  eos_token_id: int, pad_token_id: int,
                  length_penalty: float = 1.0,
                  pos_offset: int = 0) -> Tuple[Array, Array]:
    """Reorder-free beam search (ops/decode.py design).

    ``cache`` has B*K physical rows that are NEVER reordered; each beam
    carries an ancestry vector anc[b, k, t] = physical row of its KV at
    position t, and decode attention reads through that index. This removes
    the per-step full-cache gather (the dominant decode cost on TPU) that
    classic HF-style beam search pays (reference: modeling_bart.py:1646-1681
    beam-expands + _reorder_cache).

    decode_topk(token_ids (B*K, 1), pos, cache, beam_anc, k) ->
    (top_vals (B*K, k), top_toks (B*K, k), lse (B*K,), cache) — per-beam
    top-k + row logsumexp computed inside the decode step
    (models decode_step_topk), so the (B*K, V) logits never leave it.

    ``pos_offset``: first writable cache slot (e.g. a P-length attention
    prefix occupies slots [0, P)).

    Returns (best_sequences (B, max_length), best_scores (B,)).
    """
    B, K = batch_size, num_beams
    cache_len = jax.tree_util.tree_leaves(cache)[0].shape[0]  # time-major

    alive_seqs = jnp.full((B, K, max_length), pad_token_id, jnp.int32)
    alive_seqs = alive_seqs.at[:, :, 0].set(decoder_start_token_id)
    # only beam 0 live at step 0 so identical beams don't duplicate
    alive_logp = jnp.tile(jnp.array([0.0] + [NEG_INF] * (K - 1)), (B, 1))
    fin_seqs = jnp.full((B, K, max_length), pad_token_id, jnp.int32)
    fin_scores = jnp.full((B, K), NEG_INF)
    # each row starts as its own ancestor (prefix slots < pos_offset are
    # per-row copies, so the identity index is correct there too)
    anc = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :, None],
                           (B, K, cache_len))

    def cond(state):
        i, _, alive_logp, _, _, fin_scores, _ = state
        if_done = i >= max_length - 1
        # early_stopping=False HF semantics: stop when the best alive score
        # at the CURRENT length can no longer beat the worst finished score
        # (BeamHypotheses.is_done uses cur_len, not max_length)
        gen_len = jnp.asarray(i + 1, jnp.float32)
        best_alive = jnp.max(alive_logp, axis=1) / (
            gen_len ** length_penalty if length_penalty > 0 else 1.0)
        worst_fin = jnp.min(fin_scores, axis=1)
        done = jnp.all(worst_fin >= best_alive)
        return ~(if_done | done)

    def body(state):
        i, alive_seqs, alive_logp, cache, anc, fin_scores, fin_seqs = state
        tok = jax.lax.dynamic_slice(alive_seqs, (0, 0, i), (B, K, 1))
        # this step's KV lands in each beam's own physical row
        own_row = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :, None],
                                   (B, K, 1))
        anc = jax.lax.dynamic_update_slice(anc, own_row, (0, 0, pos_offset + i))
        # Per-beam top-2K + logsumexp come straight from the fused head
        # (exact top-k; the union of per-beam top-2K is a superset of the
        # joint top-2K over (K*V), so the two-stage reduction is exact).
        top_vals, top_tok, lse, cache = decode_topk(
            tok.reshape(B * K, 1), i, cache, anc, 2 * K)
        top_lp = top_vals - lse[:, None]
        top_lp = top_lp.reshape(B, K, 2 * K) + alive_logp[..., None]
        top_logp, flat_idx = jax.lax.top_k(top_lp.reshape(B, K * 2 * K), 2 * K)
        beam_idx = flat_idx // (2 * K)
        tok_idx = jnp.take_along_axis(
            top_tok.reshape(B, K * 2 * K), flat_idx, axis=1).astype(jnp.int32)

        cand_seqs = _gather_beams(alive_seqs, beam_idx, B, K)  # (B, 2K, L)
        cand_seqs = jax.lax.dynamic_update_slice(
            cand_seqs, tok_idx[..., None].astype(jnp.int32), (0, 0, i + 1))
        is_eos = tok_idx == eos_token_id

        # finished candidates: length-penalized score (HF BeamHypotheses)
        gen_len = jnp.asarray(i + 1, jnp.float32)
        fin_cand_scores = jnp.where(is_eos, top_logp / (gen_len ** length_penalty),
                                    NEG_INF)
        all_fin_scores = jnp.concatenate([fin_scores, fin_cand_scores], axis=1)
        all_fin_seqs = jnp.concatenate([fin_seqs, cand_seqs], axis=1)
        top_fin_scores, top_fin_idx = jax.lax.top_k(all_fin_scores, K)
        fin_seqs = _gather_beams(all_fin_seqs, top_fin_idx, B, K)
        fin_scores = top_fin_scores

        # alive candidates: non-eos, take top K
        alive_cand_logp = jnp.where(is_eos, NEG_INF, top_logp)
        new_alive_logp, alive_idx = jax.lax.top_k(alive_cand_logp, K)
        alive_seqs = _gather_beams(cand_seqs, alive_idx, B, K)
        alive_logp = new_alive_logp

        # inherit the chosen parents' ancestry — an int gather over (B, K, L)
        # instead of reordering the multi-GB KV cache
        chosen_beam = jnp.take_along_axis(beam_idx, alive_idx, axis=1)  # (B, K)
        anc = _gather_beams(anc, chosen_beam, B, K)
        return (i + 1, alive_seqs, alive_logp, cache, anc, fin_scores, fin_seqs)

    state = (0, alive_seqs, alive_logp, cache, anc, fin_scores, fin_seqs)
    _, alive_seqs, alive_logp, _, _, fin_scores, fin_seqs = jax.lax.while_loop(
        cond, body, state)

    # HF early_stopping=False semantics: hypotheses still alive at max
    # length join the pool (scored over their generated length, with eos
    # appended) and compete with the finished ones
    alive_final = alive_logp / ((max_length - 1) ** length_penalty
                                if length_penalty > 0 else 1.0)
    best_fin = fin_seqs[:, 0]
    best_fin_score = fin_scores[:, 0]
    best_alive_idx = jnp.argmax(alive_final, axis=1)
    best_alive = jnp.take_along_axis(
        alive_seqs, best_alive_idx[:, None, None], axis=1)[:, 0]
    best_alive = best_alive.at[:, -1].set(eos_token_id)
    best_alive_score = jnp.take_along_axis(alive_final, best_alive_idx[:, None],
                                           axis=1)[:, 0]
    pick_alive = best_alive_score > best_fin_score
    seqs = jnp.where(pick_alive[:, None], best_alive, best_fin)
    scores = jnp.where(pick_alive, best_alive_score, best_fin_score)
    return seqs, scores


def expand_to_beams(x: Array, num_beams: int) -> Array:
    """(B, ...) → (B*K, ...) with interleaved repeat (HF index_select order,
    reference: modeling_bart.py:1652-1658)."""
    return jnp.repeat(x, num_beams, axis=0)


def seq2seq_generate(model, variables, *, input_ids, attention_mask,
                     vis_feats=None, boxes=None, img_order_ids=None,
                     obj_order_ids=None, vis_attention_mask=None, ctx=None,
                     num_beams: int = 1, max_length: int = 20,
                     length_penalty: float = 1.0,
                     decoder_prefill_ids: Optional[Array] = None):
    """End-to-end generation for a VLBart/VLT5-style model. Jittable with
    static (num_beams, max_length). Returns token ids (B, max_length) with
    the start token at position 0 (strip it for decoding, as HF does).

    decoder_prefill_ids: optional (B, P) tokens fed through the decoder before
    free-running generation (used by decoder prompt tuning / forced prefixes).
    """
    cfg = model.cfg
    bk = cfg.backbone
    B = input_ids.shape[0]
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32

    enc_out, joint_mask = model.apply(
        variables, input_ids, attention_mask, vis_feats, boxes, img_order_ids,
        obj_order_ids, vis_attention_mask, ctx, method=type(model).encode)
    cross_kvs = model.apply(variables, enc_out, ctx,
                            method=type(model).init_decode)

    # beam mode: joint_mask and cross_kvs stay UN-expanded at B rows — the
    # K beams of a batch element share one encoder-KV copy (ops/decode.py
    # beam_cross_attend), cutting cross-attention read traffic by K.
    # B pads to a multiple of 8 so the pallas beam-self-attend kernel's
    # (tb*J)-row cache blocks stay sublane-aligned; padded rows generate
    # garbage that is sliced off at the end.
    B_true = B
    if num_beams > 1:
        B = -(-B // 8) * 8
        if B != B_true:
            pad = B - B_true
            joint_mask = jnp.pad(joint_mask, ((0, pad), (0, 0)))
            cross_kvs = jax.tree_util.tree_map(
                lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)),
                cross_kvs)
        # flatten (B, S, H, Dh) -> (B, S, H*Dh) ONCE, outside the decode
        # loop: the rank-4 view's (H, Dh) tile padding makes the flat view
        # a genuine relayout, and the Pallas cross-attend's layout
        # constraint re-ran that copy inside the while body every step
        # (12 x 0.13 ms at flagship beam shapes — r3 profile)
        cross_kvs = jax.tree_util.tree_map(
            lambda x: x.reshape(x.shape[0], x.shape[1], -1)
            if x.ndim == 4 else x, cross_kvs)
    n = B * num_beams if num_beams > 1 else B

    # decoder attention-prefix: prefill the first P cache slots once and
    # start decoding at position P (prefix-tuning semantics)
    P = 0
    prefix_kvs = None
    if (getattr(cfg.pet, "use_attn_prefix", False)
            and cfg.pet.decoder_prompt_len > 0 and not cfg.is_t5):
        P = cfg.pet.decoder_prompt_len
        prefix_kvs = model.apply(variables, n,
                                 method=type(model).init_decoder_prefix)
    elif cfg.pet.decoder_prompt_len > 0:
        # decoder INPUT-prompt tuning: the reference's first decode step
        # materializes the prompt as past_key_values via a dry decoder run
        # (modeling_bart.py:1421-1424); here the dry-run KV prefill the
        # cache once and decoding starts at position P
        P = cfg.pet.decoder_prompt_len
        prefix_kvs = model.apply(variables, n, ctx,
                                 method=type(model).init_decoder_prompt)
    cache = init_self_cache(cfg, n, max_length + P, dtype)
    if prefix_kvs is not None:
        # prefix kvs come (B, P, H, Dh); cache is time-major (L, B, H*Dh)
        def _tm(x):
            return x.swapaxes(0, 1).reshape(x.shape[1], x.shape[0], -1).astype(dtype)
        cache = tuple(
            {"k": layer["k"].at[:P].set(_tm(pk)),
             "v": layer["v"].at[:P].set(_tm(pv))}
            for layer, (pk, pv) in zip(cache, prefix_kvs))

    def decode_topk(tok, pos, cache, beam_anc, k):
        return model.apply(variables, tok, joint_mask, cross_kvs, cache,
                           pos + P, k, ctx, beam_anc,
                           method=type(model).decode_step_topk)

    eos = bk.eos_token_id
    pad = bk.pad_token_id
    start = bk.decoder_start_token_id
    if num_beams > 1:
        seqs, _ = beam_generate(decode_topk, cache, B, num_beams, max_length,
                                start, eos, pad, length_penalty, pos_offset=P)
        return seqs[:B_true]
    return greedy_generate(decode_topk, cache, B, max_length, start, eos, pad)
