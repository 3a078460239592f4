"""Prefix tuning: per-layer attention K/V prefixes.

Reference: src/modeling_prefix_bart.py:50-120 (encoder) and :236-300
(decoder) — Embedding(P, d) → Linear(d, mid) → Tanh → Linear(mid, L·d·2),
reshaped to per-layer (k, v) prefix states; and src/modeling_bart.py:442-555
(ResidualVisualEmbedding — projects visual features into per-encoder-layer
KV prompts for the PrefixJointEncoder, :1024-1031).

TPU note: prefixes are position-independent K/V context, so for generation
they are written once into the first P slots of the self-attention cache and
decoding starts at position P — no per-step recompute.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vlpet_tpu.pet.modules import TaskDense, normal_init

Array = jax.Array


class AttnPrefixController(nn.Module):
    """Reparameterized per-layer KV prefixes. Returns a tuple over layers of
    (k, v) with shape (B, P, H, Dh)."""

    preseqlen: int
    n_layers: int
    n_heads: int
    d_model: int
    mid_dim: int = 768
    init_std: Optional[float] = 0.02
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, bsz: int) -> Tuple[Tuple[Array, Array], ...]:
        P, L, H, d = self.preseqlen, self.n_layers, self.n_heads, self.d_model
        head_dim = d // H
        emb_init = normal_init(self.init_std) if self.init_std else nn.initializers.normal(1.0)
        table = self.param("prefix_embedding", emb_init, (P, d))
        z = TaskDense(d, self.mid_dim, init_std=self.init_std, dtype=self.dtype,
                      name="mlp_in")(table.astype(self.dtype))
        z = jnp.tanh(z)
        flat = TaskDense(self.mid_dim, L * d * 2, init_std=self.init_std,
                         dtype=self.dtype, name="mlp_out")(z)  # (P, L*d*2)
        # (P, 2L, H, Dh) -> per-layer (k, v)
        per = flat.reshape(P, 2 * L, H, head_dim)
        per = jnp.broadcast_to(per[None], (bsz,) + per.shape)
        out = []
        for i in range(L):
            k = per[:, :, 2 * i]      # (B, P, H, Dh)
            v = per[:, :, 2 * i + 1]
            out.append((k, v))
        return tuple(out)


class ResidualVisualPrefix(nn.Module):
    """Visual features → per-encoder-layer KV prompts
    (reference: modeling_bart.py:442-555 ResidualVisualEmbedding). Each of the
    N visual tokens contributes one prefix slot per layer."""

    feat_dim: int
    n_layers: int
    n_heads: int
    d_model: int
    init_std: Optional[float] = 0.02
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Array) -> Tuple[Tuple[Array, Array], ...]:
        B, N, _ = feats.shape
        H = self.n_heads
        head_dim = self.d_model // H
        L = self.n_layers
        flat = TaskDense(self.feat_dim, L * self.d_model * 2,
                         init_std=self.init_std, dtype=self.dtype,
                         name="feat_prefix_projection")(feats.astype(self.dtype))
        per = flat.reshape(B, N, 2 * L, H, head_dim)
        out = []
        for i in range(L):
            out.append((per[:, :, 2 * i], per[:, :, 2 * i + 1]))
        return tuple(out)
