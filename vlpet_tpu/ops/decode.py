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

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array
NEG_INF = -1.0e9


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


def decode_attend(q: Array, k: Array, v: Array,
                  mask: Optional[Array] = None,
                  bias_row: Optional[Array] = None) -> Array:
    """Single-step decode self-attention over a TIME-MAJOR cache.

    q: (B, 1, H, Dh); k, v: (L, B, H, Dh); mask: additive with trailing
    L axis (e.g. (1, 1, 1, L) position mask); bias_row: optional
    (1, H, 1, L) T5 relative bias. Returns (B, 1, H*Dh)."""
    L, B, H, Dh = k.shape
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


def beam_decode_attend(q: Array, k: Array, v: Array, sel_mask: Array,
                       bias_row: Optional[Array] = None) -> Array:
    """Ancestry-masked self-attention for one decode step.

    q: (B*K, 1, H, Dh) — current-step queries, beam-major rows
    k, v: (L, B*J, H, Dh) — TIME-MAJOR physical KV cache (J == K), never
        reordered (rows) and never copied (time: leading-dim updates)
    sel_mask: (B, K, J, L) additive (from beam_selection_mask)
    bias_row: optional (1, H, 1, L) additive position bias (T5) — position-
        dependent only, so it broadcasts over beams and physical rows.
    Returns (B*K, 1, H*Dh).

    Shape strategy: the K beams act as a query *sequence* of length K and
    the flattened (J, L) cache as the memory — the canonical
    (B, H, Lq, S) attention layout XLA already tiles well. (A 5-d
    (B,K,H,J,L) formulation measured 30x slower: XLA assigned layouts with
    5-wide minor dims, leaving the VPU lanes ~96% idle.)
    """
    B, K, J, L = sel_mask.shape
    H, Dh = q.shape[-2:]
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

    q: (B*K, 1, H, Dh); k, v: (B, S, H, Dh) — one copy per batch element,
    shared by its K beams (beams = a K-long query sequence; no causal
    structure in cross-attention, so this is exact). mask: optional
    (B, 1, 1, S) additive. Returns (B*K, 1, H*Dh).
    """
    B, S, H, Dh = k.shape
    K = q.shape[0] // B
    qb = q.reshape(B, K, H, Dh)
    Kp = max(8, K)  # sublane-pad the beam/query axis (see beam_decode_attend)
    if Kp != K:
        qb = jnp.pad(qb, ((0, 0), (0, Kp - K), (0, 0), (0, 0)))
    logits = jnp.einsum("bqhd,bshd->bhqs", qb, k,
                        preferred_element_type=jnp.float32)  # (B,H,Kp,S)
    if mask is not None:
        logits = logits + mask.astype(jnp.float32).reshape(B, 1, 1, S)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqs,bshd->bqhd", probs, v)
    return out[:, :K].reshape(B * K, 1, H * Dh)
