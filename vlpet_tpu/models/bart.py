"""Flax BART encoder/decoder with the full VL-PET hook surface.

This reimplements the behavior of the reference's forked HF-4.2.1 BART
(reference: src/my_transformers/modeling_bart.py) as idiomatic Flax:

* post-LN layers, learned positions with offset 2 (:122-140)
* encoder sublayer hook chain — serial adapters, four multihead-adapter
  variants, granularity gates, standalone gating, hyperformer, scaling
  (:882-1388)
* decoder self/cross attention with value-parallel (VPA), key-parallel (KPA),
  sequential value adapters and IA³ hooks (:283-737, :1391-1788)
* functional KV-cache for incremental decoding: the cross-attention K/V
  (including the VPA) are computed ONCE per sequence via ``compute_cross_kv``
  and reused every step, matching the reference's cached-KV behavior
  (:419-422).

Known reference quirks replicated or documented:
* value-adapter hooks fire only on the cross-attention path (the reference's
  self-attention branches never apply them, :486-497) — replicated;
* the multihead-VPA branch in the reference assigns its result to
  ``hidden_states`` instead of ``value_states`` (:439-457), discarding it.
  Here the *intended* math is implemented (value gets the delta) since the
  flag is not part of any published recipe.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vlpet_tpu.ops.hashdrop import module_hash_dropout
from vlpet_tpu.config import (BartConfig, HyperformerSpec, PetConfig, PromptSpec,
                              VisConfig, VLModelConfig)
from vlpet_tpu.pet.hypernet import (
    AdapterLayersHyperNetController,
    AdapterLayersOneHyperNetController,
    MetaLayersAdapterController,
)
from vlpet_tpu.pet.modules import (
    AdapterController,
    GateLargeX,
    GateLargeXLowRank,
    GateMiddleXYAdd,
    GateSmallXYCat,
    IA3Vector,
    LoRADense,
    MultiheadDownAdapter,
    MultiheadDownUpAdapter,
    MultiheadPairAdapter,
    MultiheadUpAdapter,
    PetContext,
    TaskDense,
    get_activation,
    normal_init,
)
from vlpet_tpu.ops.ffn import ffn_supported, fused_ffn
from vlpet_tpu.pet.prompts import PromptController
from vlpet_tpu.models.visual import (
    LowRankVisualEmbedding,
    VisualEmbedding,
    downsample_vis,
)

Array = jax.Array

NEG_INF = -1e9  # large negative for additive masks (finfo.min overflows in bf16 sums)


def remat_policy(kind: str):
    """jax.checkpoint policy for cfg.remat: 'dots' saves matmul outputs and
    recomputes the elementwise chains in the backward (HBM-traffic trade,
    PERF.md); 'full' saves only layer boundaries."""
    if kind == "dots":
        return jax.checkpoint_policies.dots_saveable
    if kind == "full":
        return None
    raise ValueError(f"unknown remat policy: {kind!r}")


def expand_mask(mask: Array, tgt_len: int, dtype) -> Array:
    """[B, S] → additive [B, 1, T, S] (reference: modeling_bart.py:109-120)."""
    B, S = mask.shape
    m = jnp.broadcast_to(mask[:, None, None, :], (B, 1, tgt_len, S)).astype(dtype)
    return (1.0 - m) * NEG_INF


def causal_mask(tgt_len: int, dtype, offset: int = 0) -> Array:
    """[1, 1, T, T+offset] additive causal mask; ``offset`` = past length."""
    i = jnp.arange(tgt_len)[:, None]
    j = jnp.arange(tgt_len + offset)[None, :]
    allowed = j <= (i + offset)
    return jnp.where(allowed, 0.0, NEG_INF).astype(dtype)[None, None]


class ResidualDropoutLayerNorm(nn.Module):
    """LayerNorm(residual + dropout(h)) — the post-LN sublayer epilogue.

    Params are ``scale``/``bias`` under this module's name, so the tree is
    identical to the nn.LayerNorm it replaces (freezing/import parity).
    On TPU in training the whole chain runs as one Pallas kernel
    (ops/fused_ln.py: no rng tensor, no saved mask, no extra copies);
    otherwise the flax-equivalent ops run inline (bit-matching
    nn.Dropout + nn.LayerNorm with fp32 fast-variance stats)."""

    rate: float
    dtype: Any = jnp.float32
    epsilon: float = 1e-5  # torch nn.LayerNorm default (HF BART)

    @nn.compact
    def __call__(self, h: Array, residual: Array,
                 deterministic: bool = True) -> Array:
        D = h.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (D,))
        bias = self.param("bias", nn.initializers.zeros, (D,))
        dropping = self.rate > 0.0 and not deterministic
        from vlpet_tpu.ops.fused_ln import fused_dropout_add_ln, fused_ln_fits

        if (dropping and h.ndim == 3
                and jax.default_backend() not in ("cpu",)
                # long sequences (video QA: L≈604) route onto the flat-row
                # kernels inside fused_dropout_add_ln; only shapes with no
                # legal row blocking (odd B·L) fall back to the jnp chain
                and fused_ln_fits(h.shape[0], h.shape[1], D)):
            seed = jax.random.randint(self.make_rng("dropout"), (1,), 0,
                                      jnp.iinfo(jnp.int32).max,
                                      dtype=jnp.int32)
            return fused_dropout_add_ln(h, residual, scale, bias, seed,
                                        float(self.rate), self.epsilon)
        if dropping:
            keep = jax.random.bernoulli(self.make_rng("dropout"),
                                        1.0 - self.rate, h.shape)
            h = jax.lax.select(keep, h / (1.0 - self.rate),
                               jnp.zeros_like(h))
        x = (residual + h).astype(jnp.float32)
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.maximum(0.0, jnp.mean(x * x, axis=-1, keepdims=True)
                          - mu * mu)
        y = (x - mu) * (jax.lax.rsqrt(var + self.epsilon) * scale) + bias
        return y.astype(self.dtype)


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------


class BartAttention(nn.Module):
    """Multi-head attention with optional value/key hooks.

    ``role`` picks the hook set: 'enc_self' | 'dec_self' | 'cross'.
    Value hooks (VPA/sequential/IA3/multihead-VPA) follow the reference's
    BartAttentionWithValueAdapter (:283-566); the key hook follows
    BartAttentionWithKeyAdapter (:568-737). Per the reference, these fire
    only when key_value_states are given (the cross-attention path).
    """

    cfg: VLModelConfig
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    is_decoder: bool = False
    role: str = "enc_self"

    def setup(self):
        c = self.cfg
        p = c.pet
        d = self.embed_dim
        init_std = c.backbone.init_std
        self.head_dim = d // self.num_heads
        self.scaling = self.head_dim ** -0.5
        dense = lambda name: TaskDense(d, d, init_std=init_std, dtype=self._dtype,
                                       name=name)
        if p.use_lora:
            lora = p.lora_spec()
            self.q_proj = LoRADense(d, d, lora, init_std=init_std, dtype=self._dtype,
                                    name="q_proj")
            self.v_proj = LoRADense(d, d, lora, init_std=init_std, dtype=self._dtype,
                                    name="v_proj")
        else:
            self.q_proj = dense("q_proj")
            self.v_proj = dense("v_proj")
        self.k_proj = dense("k_proj")
        self.out_proj = dense("out_proj")
        self.attn_dropout = nn.Dropout(rate=self.dropout)

        # --- value/key hooks -------------------------------------------------
        self.vpa = None
        self.seq_va = None
        self.value_ia3 = None
        self.mh_vpa = None
        self.kpa = None
        self.vpa_gate = None
        self.seq_gate = None
        if self.role == "cross":
            if p.use_decoder_enc_attn_value_parallel_adapter_down_dim:
                scaling = (p.decoder_enc_attn_value_parallel_adapter_scaling_factor
                           if p.use_decoder_enc_attn_value_parallel_adapter_scaling else None)
                spec = p.down_dim_spec(d, p.decoder_enc_attn_value_parallel_adapter_down_dim,
                                       parallel=True, scaling=scaling)
                self.vpa = AdapterController(spec, init_std=init_std, dtype=self._dtype,
                                             name="attn_value_parallel_adapter")
            elif p.use_decoder_enc_attn_value_sequential_adapter_down_dim:
                spec = p.down_dim_spec(d, p.decoder_enc_attn_value_sequential_adapter_down_dim)
                self.seq_va = AdapterController(spec, init_std=init_std, dtype=self._dtype,
                                                name="enc_attn_value_sequential_adapter")
            elif p.use_decoder_enc_attn_value_ia3:
                self.value_ia3 = IA3Vector(d, param_name="attn_value_ia3",
                                           name="value_ia3")
            elif p.use_decoder_enc_attn_value_parallel_adapter_down_multihead:
                self.mh_vpa = MultiheadDownAdapter(
                    d, p.decoder_enc_attn_value_parallel_adapter_down_dim,
                    p.decoder_enc_attn_value_parallel_adapter_multihead_num_head,
                    init_std=init_std, dtype=self._dtype,
                    name="attn_value_parallel_adapter_multihead")
            elif p.use_decoder_enc_attn_value_parallel_adapter_down_up_pair_multihead:
                self.mh_vpa = MultiheadPairAdapter(
                    d, p.decoder_enc_attn_value_parallel_adapter_down_dim,
                    p.decoder_enc_attn_value_parallel_adapter_multihead_num_head,
                    init_std=init_std, dtype=self._dtype,
                    name="attn_value_parallel_adapter_multihead")
            if p.use_decoder_enc_attn_key_parallel_adapter_down_dim:
                spec = p.down_dim_spec(d, p.decoder_enc_attn_key_parallel_adapter_down_dim,
                                       parallel=True)
                self.kpa = AdapterController(spec, init_std=init_std, dtype=self._dtype,
                                             name="attn_key_parallel_adapter")
            if (p.use_decoder_enc_attn_value_parallel_adapter_gating_large_x_lowrank
                    and p.use_decoder_enc_attn_value_residual_connection):
                self.vpa_gate = GateLargeXLowRank(
                    d, p.decoder_enc_attn_value_parallel_adapter_gating_large_x_lowrank_down_dim,
                    init_std=init_std, dtype=self._dtype,
                    name="enc_attn_value_parallel_adapter_gating_large_x")
            if (p.use_decoder_enc_attn_value_sequential_adapter_gating_large_x_lowrank
                    and p.use_decoder_enc_attn_value_residual_connection):
                self.seq_gate = GateLargeXLowRank(
                    d, p.decoder_enc_attn_value_sequential_adapter_gating_large_x_lowrank_down_dim,
                    init_std=init_std, dtype=self._dtype,
                    name="enc_attn_value_sequential_adapter_gating_large_x")
        elif self.role == "enc_self" and p.use_encoder_attn_value_ia3:
            # quirk: params exist but the reference never applies them on the
            # self-attention path; kept for trainable-param parity
            self.value_ia3 = IA3Vector(d, param_name="attn_value_ia3", name="value_ia3")
        elif self.role == "dec_self" and p.use_decoder_self_attn_value_ia3:
            self.value_ia3 = IA3Vector(d, param_name="attn_value_ia3", name="value_ia3")
        elif self.role == "dec_self" and p.use_decoder_self_attn_value_parallel_adapter_down_dim:
            spec = p.down_dim_spec(d, p.decoder_self_attn_value_parallel_adapter_down_dim,
                                   parallel=True)
            self.vpa = AdapterController(spec, init_std=init_std, dtype=self._dtype,
                                         name="attn_value_parallel_adapter")
        elif self.role == "enc_self" and p.use_encoder_attn_value_parallel_adapter_down_dim:
            spec = p.down_dim_spec(d, p.encoder_attn_value_parallel_adapter_down_dim,
                                   parallel=True)
            self.vpa = AdapterController(spec, init_std=init_std, dtype=self._dtype,
                                         name="attn_value_parallel_adapter")

    @property
    def _dtype(self):
        return jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32

    def _shape(self, x: Array) -> Array:
        B, L, _ = x.shape
        return x.reshape(B, L, self.num_heads, self.head_dim)

    def _qkv_fused(self, hidden_states: Array):
        """q/k/v in ONE (d, 3d) GEMM — one read of the activations instead
        of three; params keep their q_proj/k_proj/v_proj names (freezing +
        HF-import parity), the kernels are concatenated at apply time
        (loop-invariant, fused by XLA)."""
        qk, qb = self.q_proj.kb()
        kk, kb = self.k_proj.kb()
        vk, vb = self.v_proj.kb()
        dt = self._dtype
        W = jnp.concatenate([qk, kk, vk], axis=1).astype(dt)
        bias = jnp.concatenate([qb, kb, vb]).astype(dt)
        lead = hidden_states.shape[:-1]
        y = hidden_states.reshape(-1, self.embed_dim).astype(dt) @ W + bias
        q, k, v = jnp.split(y.reshape(lead + (3 * self.embed_dim,)), 3, axis=-1)
        return self._shape(q * self.scaling), self._shape(k), self._shape(v)

    def _proj(self, mod, h: Array, ctx: PetContext,
              deterministic: bool = True) -> Array:
        """Apply a q/v projection, routing LoRA by task. The reference's
        LoRALinearController takes the task at every call
        (src/lora/controller.py:56); without this, a multi-task per-task
        LoRA config (reference scripts/image-text/lora.sh — no
        --use_single_lora) would silently use task 0's A/B everywhere."""
        if isinstance(mod, LoRADense):
            return mod(h, ctx.task_idx, deterministic=deterministic)
        return mod(h)

    def compute_self_kv(self, hidden_states: Array,
                        ctx: PetContext) -> Tuple[Array, Array]:
        """Teacher-forcing-path self-attention K/V in (B, S, H, Dh) — value
        hooks never fire on self-attention (reference quirk, see class
        docstring). Used by the decoder-prompt cache prefill."""
        k = self._shape(self.k_proj(hidden_states))
        v = self._shape(self._proj(self.v_proj, hidden_states, ctx))
        return k, v

    def compute_cross_kv(self, kv_states: Array, ctx: PetContext,
                         deterministic: bool = True) -> Tuple[Array, Array]:
        """Projection + hooks for cross-attention K/V, in (B, S, H, Dh).

        Hook math per the reference (:419-479): VPA is a parallel adapter on
        v_proj's output with the raw encoder states as input; the optional
        residual-connection block gates then adds the raw encoder states.
        """
        p = self.cfg.pet
        k = self.k_proj(kv_states)
        if self.kpa is not None:
            k = self.kpa(kv_states, ctx, y=k)
        v = self._proj(self.v_proj, kv_states, ctx, deterministic)
        if self.vpa is not None:
            v = self.vpa(kv_states, ctx, y=v)
        elif self.seq_va is not None:
            v = self.seq_va(kv_states, ctx)
        elif self.value_ia3 is not None:
            g = self.value_ia3()
            if p.use_decoder_enc_attn_value_ia3_add:
                v = v + v * g
            else:
                v = v * g
        elif self.mh_vpa is not None:
            v = v + self.mh_vpa(kv_states)
        if self.role == "cross" and p.use_decoder_enc_attn_value_residual_connection:
            if self.seq_gate is not None:
                v = v * self.seq_gate(kv_states)
            elif self.vpa_gate is not None:
                v = v * self.vpa_gate(kv_states)
            v = kv_states.astype(v.dtype) + v
        return self._shape(k), self._shape(v)

    def _attend(self, q: Array, k: Array, v: Array, mask: Optional[Array],
                deterministic: bool, causal: bool = False) -> Array:
        # q,k,v: (B, L, H, Dh); attention logits accumulate in fp32.
        # ``mask`` is additive (B|1, 1, 1|L, S) — the length-collapsed
        # (.., 1, S) padding form avoids materializing (B, 1, L, S);
        # ``causal`` applies the decoder triangle (in-kernel iota on the
        # Pallas path, causal_mask add on the XLA path).
        B, L = q.shape[:2]
        S = k.shape[1]
        # Pallas fused attention is the default on TPU: it keeps the fp32
        # logits in VMEM and reads q/k/v in the projection-native
        # (B, L, H*Dh) layout, killing both the (B,H,L,S) HBM round trips
        # and the head-transpose copies (fwd+bwd 3.9 vs 6.3 ms at flagship
        # encoder shapes — PERF.md round 2). CPU keeps the XLA einsum path.
        flag = getattr(self.cfg, "use_pallas_attention", None)
        enabled = (jax.default_backend() not in ("cpu",) if flag is None
                   else flag)  # tri-state: None = auto-on for TPU
        from vlpet_tpu.ops.attention import fused_attention, fused_attention_fits

        # attention-probs dropout fuses in-kernel (hash mask). BART
        # recipes keep attention_dropout at 0.0 (HF default), so this
        # is a no-op for the published configs — it exists so nonzero
        # attention_dropout doesn't silently fall back to XLA attention
        # the way T5's dropout_rate did (PERF.md r3 T5 profile).
        rate = 0.0 if deterministic else float(self.dropout)
        use_pallas = (enabled
                      and (mask is not None or causal) and L > 1
                      # shapes beyond every kernel's 16 MB scoped-vmem
                      # ceiling fall back to XLA; video QA (S≈604) rides
                      # the per-head kernels (_select_attention_mode)
                      and fused_attention_fits(
                          B, L, S, q.shape[2] * q.shape[3], self.num_heads,
                          False, rate, jnp.dtype(q.dtype).itemsize,
                          need_bwd=not deterministic))
        if use_pallas:
            seed = (jax.random.randint(self.make_rng("dropout"), (1,), 0,
                                       jnp.iinfo(jnp.int32).max,
                                       dtype=jnp.int32)
                    if rate > 0.0 else None)
            m = (mask.astype(jnp.float32) if mask is not None
                 else jnp.zeros((1, 1, 1, S), jnp.float32))
            return fused_attention(q.reshape(B, L, -1), k.reshape(B, S, -1),
                                   v.reshape(B, S, -1), m, self.num_heads,
                                   causal, None, rate, seed)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        if mask is not None:
            logits = logits + mask.astype(jnp.float32)
        if causal:
            logits = logits + causal_mask(L, jnp.float32, offset=S - L)
        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        if self.dropout > 0.0:
            probs = self.attn_dropout(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return out.reshape(B, L, self.embed_dim)

    def __call__(self, hidden_states: Array, ctx: PetContext,
                 kv_states: Optional[Array] = None,
                 attention_mask: Optional[Array] = None,
                 cross_kv: Optional[Tuple[Array, Array]] = None,
                 cache: Optional[Dict[str, Array]] = None,
                 decode_pos: Optional[Array] = None,
                 prefix_kv: Optional[Tuple[Array, Array]] = None,
                 beam_sel: Optional[Array] = None,
                 beam_fused: bool = False,
                 deterministic: bool = True,
                 causal: bool = False):
        """Returns (attn_output, new_cache). ``prefix_kv`` (B, P, H, Dh)
        prepends learned prefix-tuning context to the keys/values (the
        reference's past_key_value-for-prefix path, modeling_prefix_bart.py);
        the caller extends the mask with P always-attendable columns.

        ``beam_sel`` — the (B, K, L) int32 beam ancestry — switches decode
        attention to the reorder-free beam path (ops/decode.py): the cache
        stays in physical row order and the ancestry-derived mask routes
        each beam to its ancestors' slots.
        In the same mode, a cross_kv whose batch is smaller than the hidden
        batch is treated as beam-shared (un-expanded encoder KV)."""
        fuse_qkv = self.role != "cross" and isinstance(self.q_proj, TaskDense)
        new_cache = cache
        if self.role == "cross":
            q = self._shape(self._proj(self.q_proj, hidden_states, ctx,
                                       deterministic) * self.scaling)
            if cross_kv is None:
                k, v = self.compute_cross_kv(kv_states, ctx, deterministic)
            else:
                k, v = cross_kv
            if k.shape[0] != q.shape[0]:
                from vlpet_tpu.ops.decode import beam_cross_attend

                out = beam_cross_attend(q, k, v, attention_mask)
                return self.out_proj(out), new_cache
        elif cache is not None:
            # incremental decode: write current k/v at time slot decode_pos.
            # Cache is TIME-MAJOR (L, B, H, Dh) so this is a leading-dim
            # dynamic_update_slice — the in-place pattern on TPU (the
            # batch-major form copied the whole buffer each step, PERF.md).
            if fuse_qkv:
                q, k_new, v_new = self._qkv_fused(hidden_states)
            else:
                q = self._shape(self._proj(self.q_proj, hidden_states, ctx,
                                           deterministic) * self.scaling)
                k_new = self._shape(self.k_proj(hidden_states))
                v_new = self._shape(self._proj(self.v_proj, hidden_states,
                                               ctx, deterministic))
            from vlpet_tpu.ops.decode import (beam_decode_attend,
                                              beam_decode_attend_update,
                                              decode_attend)

            if beam_sel is not None and beam_fused:
                # fused attend + in-place cache write: the XLA-level dus
                # paid a full k+v relayout copy per step against this
                # kernel's operand layout (PERF.md r3); beam_sel here is
                # built with l <= pos-1 — the current token rides as the
                # kernel's own-row term
                out, k, v = beam_decode_attend_update(
                    q, cache["k"], cache["v"], k_new, v_new, beam_sel,
                    decode_pos)
                return self.out_proj(out), {"k": k, "v": v}
            # cache is rank-3 (L, B, H*Dh) — the (1, B, H*Dh) update row is
            # a free bitcast of the KV projection GEMM output in the default
            # layout, so the while-carry settles on the layout the Pallas
            # beam attend demands (the rank-4 carry went batch-minor and
            # paid a full k+v relayout copy every step; PERF.md r3)
            B_ = k_new.shape[0]
            k_upd = k_new.reshape(1, B_, -1).astype(cache["k"].dtype)
            v_upd = v_new.reshape(1, B_, -1).astype(cache["v"].dtype)
            k = jax.lax.dynamic_update_slice(cache["k"], k_upd,
                                             (decode_pos, 0, 0))
            v = jax.lax.dynamic_update_slice(cache["v"], v_upd,
                                             (decode_pos, 0, 0))
            new_cache = {"k": k, "v": v}
            if beam_sel is not None:
                out = beam_decode_attend(q, k, v, beam_sel,
                                         decode_pos=decode_pos)
            else:
                out = decode_attend(q, k, v, attention_mask)
            return self.out_proj(out), new_cache
        else:
            if fuse_qkv:
                q, k, v = self._qkv_fused(hidden_states)
            else:
                q = self._shape(self._proj(self.q_proj, hidden_states, ctx,
                                           deterministic) * self.scaling)
                k = self._shape(self.k_proj(hidden_states))
                v = self._shape(self._proj(self.v_proj, hidden_states, ctx,
                                           deterministic))
            if prefix_kv is not None:
                k = jnp.concatenate([prefix_kv[0].astype(k.dtype), k], axis=1)
                v = jnp.concatenate([prefix_kv[1].astype(v.dtype), v], axis=1)
        out = self._attend(q, k, v, attention_mask, deterministic,
                           causal=causal)
        return self.out_proj(out), new_cache


# ---------------------------------------------------------------------------
# Encoder layer
# ---------------------------------------------------------------------------


class BartEncoderLayer(nn.Module):
    """Post-LN encoder layer with the full VL-PET hook chain
    (reference: my_transformers/modeling_bart.py:882-1388)."""

    cfg: VLModelConfig
    layer_idx: int = 0

    @property
    def _dtype(self):
        return jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32

    @nn.compact
    def __call__(self, hidden_states: Array, attention_mask: Array,
                 ctx: PetContext, prefix_kv=None,
                 deterministic: bool = True) -> Array:
        c = self.cfg
        p = c.pet
        b = c.backbone
        d = b.d_model
        init_std = b.init_std
        dt = self._dtype
        act_dropout = nn.Dropout(rate=b.activation_dropout)
        act = get_activation(b.activation_function)

        use_serial_adapters = ((p.use_adapter or p.use_compacter or p.use_lradapter)
                               and not p.no_encoder_adapter)
        meta_controller = (MetaLayersAdapterController(
            d_model=d, dtype=dt,
            add_layer_norm_before_adapter=p.add_layer_norm_before_adapter,
            add_layer_norm_after_adapter=p.add_layer_norm_after_adapter,
            name="adapter_hypernet") if p.use_hyperformer else None)

        def multihead(prefix: str):
            args = dict(d_model=d, down_dim=p.adapter_down_dim,
                        num_heads=p.encoder_adapter_multihead_num_head,
                        init_std=init_std, dtype=dt,
                        name=f"{prefix}_adapter_multihead")
            if p.use_encoder_adapter_down_multihead:
                return MultiheadDownAdapter(**args)
            if p.use_encoder_adapter_up_multihead:
                return MultiheadUpAdapter(**args)
            if p.use_encoder_adapter_down_up_multihead:
                return MultiheadDownUpAdapter(**args)
            if p.use_encoder_adapter_down_up_pair_multihead:
                return MultiheadPairAdapter(**args)
            return None

        def hooks(h: Array, residual: Array, prefix: str, block_w) -> Array:
            """The post-sublayer hook chain; ``residual`` is the sublayer
            input x1, ``h`` the sublayer output x2 (pre-residual)."""
            # 1. serial adapter or multihead adapter (with its own residual)
            if use_serial_adapters and not (prefix == "attn" and p.no_encoder_attn_adapter):
                scaling = None
                if prefix == "attn" and p.use_encoder_attn_adapter_scaling:
                    scaling = p.encoder_attn_adapter_scaling_factor
                if prefix == "ff" and p.use_encoder_ff_adapter_scaling:
                    scaling = p.encoder_ff_adapter_scaling_factor
                spec = p.adapter_spec(d)
                if scaling is not None:
                    spec = dataclasses.replace(spec, use_scaling_factor=True,
                                               scaling_factor=scaling)
                h = AdapterController(spec, init_std=init_std, dtype=dt,
                                      name=f"{prefix}_adapter")(h, ctx)
            else:
                mh = multihead(prefix)
                if mh is not None:
                    h = h + mh(h)
            # 2. adapter-gating chain (mutually exclusive, reference :1189-1236)
            gate = None
            if p.use_encoder_adapter_gating_large_x and not (prefix == "attn" and p.no_encoder_attn_adapter):
                gate = GateLargeX(d, init_std=init_std, dtype=dt,
                                  name=f"encoder_{prefix}_adapter_gating_large_x")(residual)
            elif p.use_encoder_adapter_gating_large_x_lowrank and not (prefix == "attn" and p.no_encoder_attn_adapter):
                gate = GateLargeXLowRank(d, p.adapter_gating_down_dim, init_std=init_std,
                                         dtype=dt,
                                         name=f"encoder_{prefix}_adapter_gating_large_x_lowrank")(residual)
            elif p.use_encoder_adapter_gating_small_xy_cat and not (prefix == "attn" and p.no_encoder_attn_adapter):
                gate = GateSmallXYCat(d, init_std=init_std, dtype=dt,
                                      name=f"encoder_{prefix}_adapter_gating_small_xy_cat")(residual, h)
            elif p.use_encoder_adapter_gating_middle_xy_add and not (prefix == "attn" and p.no_encoder_attn_adapter):
                gate = GateMiddleXYAdd(d, init_std=init_std, dtype=dt,
                                       name=f"encoder_{prefix}_adapter_gating_middle_xy_add")(residual, h)
            elif p.use_encoder_adapter_gating_middle_ia3_add and not (prefix == "attn" and p.no_encoder_attn_adapter):
                g = IA3Vector(d, name=f"encoder_{prefix}_adapter_gating_middle_ia3_add",
                              param_name="gating_middle_ia3")()
                if p.use_encoder_adapter_gating_add:
                    h = h + jnp.ones_like(h) + g
                else:
                    h = h + h * g.astype(h.dtype)
            elif p.use_encoder_adapter_gating_layernorm:
                h = nn.LayerNorm(epsilon=1e-5, dtype=dt, name=f"encoder_{prefix}_adapter_gating_layernorm")(h)
            elif p.use_encoder_adapter_gating_l2norm:
                h = h / jnp.clip(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
            if gate is not None:
                # expose gate activations for the heatmap dump
                # (reference: --use_store_gate_large, modeling_bart.py:1200-1205)
                self.sow("intermediates", f"encoder_{prefix}_gate", gate)
                h = (h + gate) if p.use_encoder_adapter_gating_add else h * gate
            # 3. standalone gating replacing the adapter (reference :1238-1251)
            if p.use_encoder_gating_large_x_lowrank and not (prefix == "attn" and p.no_encoder_attn_adapter):
                g, pre = GateLargeXLowRank(
                    d, p.gating_down_dim, init_std=init_std, dtype=dt,
                    name=f"encoder_{prefix}_gating_large_x_lowrank")(residual,
                                                                     return_pre_sigmoid=True)
                if p.use_encoder_gating_large_x_lowrank_add_x2_deltay:
                    h = (pre + h) * g
                else:
                    h = pre + h * g
            # 4. hyperformer
            if meta_controller is not None and block_w is not None:
                h = meta_controller(h, block_w)
            # 5. gating scaling
            if p.use_encoder_gating_scaling:
                h = h * p.encoder_gating_scaling_factor
            return h

        block = ctx.block_adapters

        # --- self-attention sublayer ----------------------------------------
        residual = hidden_states
        h, _ = BartAttention(c, d, b.encoder_attention_heads, b.attention_dropout,
                             role="enc_self", name="self_attn")(
            hidden_states, ctx, attention_mask=attention_mask,
            prefix_kv=prefix_kv, deterministic=deterministic)
        h = hooks(h, residual, "attn", block.self_attention if block else None)
        hidden_states = ResidualDropoutLayerNorm(
            rate=b.dropout, dtype=dt, name="self_attn_layer_norm")(
            h, residual, deterministic)

        # --- feed-forward sublayer -------------------------------------------
        residual = hidden_states
        fc1 = TaskDense(d, b.encoder_ffn_dim, init_std=init_std, dtype=dt,
                        name="fc1")
        fc2 = TaskDense(b.encoder_ffn_dim, d, init_std=init_std, dtype=dt,
                        name="fc2")
        if c.use_fused_ffn and ffn_supported(c, b.activation_function):
            # Pallas fused fc1→act→fc2: weights stay in VMEM, the (·, ffn)
            # hidden never touches HBM, backward recomputes fc1 (ops/ffn.py)
            k1, b1 = fc1.kb()
            k2, b2 = fc2.kb()
            rate = 0.0 if deterministic else b.activation_dropout
            seed = (jax.random.randint(self.make_rng("dropout"), (1,), 0,
                                       jnp.iinfo(jnp.int32).max,
                                       dtype=jnp.int32)
                    if rate > 0.0 else None)
            h = fused_ffn(hidden_states.reshape(-1, d), k1, b1, k2, b2,
                          b.activation_function, rate,
                          seed).reshape(hidden_states.shape)
        else:
            h = fc1(hidden_states)
            h = act(h)
            h = act_dropout(h, deterministic=deterministic)
            h = fc2(h)
        h = hooks(h, residual, "ff", block.feed_forward if block else None)
        hidden_states = ResidualDropoutLayerNorm(
            rate=b.dropout, dtype=dt, name="final_layer_norm")(
            h, residual, deterministic)

        if dt != jnp.float32:
            # float() keeps the bound weakly-typed: jnp.finfo's numpy scalar
            # would promote the whole residual stream to fp32
            clamp = float(jnp.finfo(dt).max - 1000)
            hidden_states = jnp.clip(hidden_states, -clamp, clamp)
        return hidden_states


# ---------------------------------------------------------------------------
# Decoder layer
# ---------------------------------------------------------------------------


class BartDecoderLayer(nn.Module):
    """Post-LN decoder layer with self-attn / cross-attn / FFN hooks
    (reference: my_transformers/modeling_bart.py:1391-1788).

    setup-style so ``self_attn``/``encoder_attn`` scopes are reachable from
    the stack's cross-KV precompute path.
    """

    cfg: VLModelConfig
    layer_idx: int = 0

    @property
    def _dtype(self):
        return jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32

    def setup(self):
        c = self.cfg
        p = c.pet
        b = c.backbone
        d = b.d_model
        init_std = b.init_std
        dt = self._dtype
        self.use_serial = ((p.use_adapter or p.use_compacter or p.use_lradapter)
                           and not p.no_decoder_adapter)
        self.self_attn = BartAttention(c, d, b.decoder_attention_heads,
                                       b.attention_dropout, is_decoder=True,
                                       role="dec_self", name="self_attn")
        self.encoder_attn = BartAttention(c, d, b.decoder_attention_heads,
                                          b.attention_dropout, is_decoder=True,
                                          role="cross", name="encoder_attn")
        self.self_attn_layer_norm = ResidualDropoutLayerNorm(
            rate=b.dropout, dtype=dt, name="self_attn_layer_norm")
        self.encoder_attn_layer_norm = ResidualDropoutLayerNorm(
            rate=b.dropout, dtype=dt, name="encoder_attn_layer_norm")
        self.final_layer_norm = ResidualDropoutLayerNorm(
            rate=b.dropout, dtype=dt, name="final_layer_norm")
        self.fc1 = TaskDense(d, b.decoder_ffn_dim, init_std=init_std, dtype=dt,
                             name="fc1")
        self.fc2 = TaskDense(b.decoder_ffn_dim, d, init_std=init_std, dtype=dt,
                             name="fc2")
        self.dropout = nn.Dropout(rate=b.dropout)
        self.act_dropout = nn.Dropout(rate=b.activation_dropout)

        mk_ac = lambda spec, name: AdapterController(spec, init_std=init_std,
                                                     dtype=dt, name=name)
        self.self_attn_adapter = None
        self.decoder_self_attn_adapter = None
        self.self_attn_adapter_multihead = None
        self.enc_attn_adapter = None
        self.decoder_enc_attn_adapter = None
        self.enc_attn_adapter_multihead = None
        self.ff_adapter = None
        self.decoder_ff_adapter = None
        self.ff_adapter_multihead = None
        self.decoder_enc_attn_key_value_adapter = None
        self.decoder_enc_attn_adapter_gating = None
        self.decoder_ff_ia3_mod = None
        if self.use_serial:
            self.self_attn_adapter = mk_ac(p.adapter_spec(d), "self_attn_adapter")
            if p.add_adapter_cross_attn:
                self.enc_attn_adapter = mk_ac(p.adapter_spec(d), "enc_attn_adapter")
            self.ff_adapter = mk_ac(p.adapter_spec(d), "ff_adapter")
        if p.use_decoder_self_attn_adapter_down_dim:
            self.decoder_self_attn_adapter = mk_ac(
                p.down_dim_spec(d, p.decoder_self_attn_adapter_down_dim),
                "decoder_self_attn_adapter")
        if p.use_decoder_enc_attn_adapter_down_dim:
            self.decoder_enc_attn_adapter = mk_ac(
                p.down_dim_spec(d, p.decoder_enc_attn_adapter_down_dim),
                "decoder_enc_attn_adapter")
            if p.use_decoder_enc_attn_adapter_gating_large_x_lowrank:
                self.decoder_enc_attn_adapter_gating = GateLargeXLowRank(
                    d, p.decoder_enc_attn_adapter_gating_large_x_lowrank_down_dim,
                    init_std=init_std, dtype=dt,
                    name="decoder_enc_attn_adapter_gating_large_x")
        if p.use_decoder_ff_adapter_down_dim:
            self.decoder_ff_adapter = mk_ac(
                p.down_dim_spec(d, p.decoder_ff_adapter_down_dim),
                "decoder_ff_adapter")
        if p.use_decoder_adapter_down_multihead and not self.use_serial:
            mk_mh = lambda name: MultiheadDownAdapter(
                d, p.adapter_down_dim, p.decoder_adapter_multihead_num_head,
                init_std=init_std, dtype=dt, name=name)
            self.self_attn_adapter_multihead = mk_mh("self_attn_adapter_multihead")
            self.enc_attn_adapter_multihead = mk_mh("enc_attn_adapter_multihead")
            self.ff_adapter_multihead = mk_mh("ff_adapter_multihead")
        if p.use_decoder_enc_attn_key_value_adapter_down_dim:
            self.decoder_enc_attn_key_value_adapter = mk_ac(
                p.down_dim_spec(d, p.decoder_enc_attn_key_value_adapter_down_dim),
                "decoder_enc_attn_key_value_adapter")
        if p.use_decoder_ff_ia3:
            self.decoder_ff_ia3_mod = IA3Vector(b.decoder_ffn_dim,
                                                name="decoder_ff_ia3_mod",
                                                param_name="decoder_ff_ia3")
        self.adapter_hypernet = (MetaLayersAdapterController(
            d_model=d, dtype=dt,
            add_layer_norm_before_adapter=p.add_layer_norm_before_adapter,
            add_layer_norm_after_adapter=p.add_layer_norm_after_adapter,
            name="adapter_hypernet") if p.use_hyperformer else None)

    def __call__(self, hidden_states: Array, ctx: PetContext,
                 encoder_hidden_states: Optional[Array] = None,
                 attention_mask: Optional[Array] = None,
                 encoder_attention_mask: Optional[Array] = None,
                 cross_kv: Optional[Tuple[Array, Array]] = None,
                 cache: Optional[Dict[str, Array]] = None,
                 decode_pos: Optional[Array] = None,
                 prefix_kv: Optional[Tuple[Array, Array]] = None,
                 beam_sel: Optional[Array] = None,
                 beam_fused: bool = False,
                 deterministic: bool = True,
                 prompt_len: int = 0):
        c = self.cfg
        p = c.pet
        b = c.backbone
        act = get_activation(b.activation_function)
        block = ctx.block_adapters

        # --- self-attention ---------------------------------------------------
        residual = hidden_states
        # causal only reaches _attend on the teacher-forcing path (the
        # decode paths return before it); the triangle is applied in-kernel
        h, new_cache = self.self_attn(hidden_states, ctx,
                                      attention_mask=attention_mask, cache=cache,
                                      decode_pos=decode_pos, prefix_kv=prefix_kv,
                                      beam_sel=beam_sel, beam_fused=beam_fused,
                                      deterministic=deterministic,
                                      causal=True)
        if self.self_attn_adapter is not None:
            h = self.self_attn_adapter(h, ctx)
        elif self.decoder_self_attn_adapter is not None:
            h = self.decoder_self_attn_adapter(h, ctx)
        elif self.self_attn_adapter_multihead is not None:
            h = h + self.self_attn_adapter_multihead(h)
        if self.adapter_hypernet is not None and block is not None:
            h = self.adapter_hypernet(h, block.self_attention)
        hidden_states = self.self_attn_layer_norm(h, residual,
                                                  deterministic)

        # --- cross-attention ----------------------------------------------------
        if encoder_hidden_states is not None or cross_kv is not None:
            residual = hidden_states
            enc_h = encoder_hidden_states
            if self.decoder_enc_attn_key_value_adapter is not None and enc_h is not None:
                enc_h = self.decoder_enc_attn_key_value_adapter(enc_h, ctx)
            h, _ = self.encoder_attn(hidden_states, ctx, kv_states=enc_h,
                                     attention_mask=encoder_attention_mask,
                                     cross_kv=cross_kv,
                                     deterministic=deterministic)
            if self.enc_attn_adapter is not None:
                h = self.enc_attn_adapter(h, ctx)
            elif self.decoder_enc_attn_adapter is not None:
                h = self.decoder_enc_attn_adapter(h, ctx)
                if self.decoder_enc_attn_adapter_gating is not None:
                    h = h * self.decoder_enc_attn_adapter_gating(residual)
            elif self.enc_attn_adapter_multihead is not None:
                h = h + self.enc_attn_adapter_multihead(h)
            if (self.adapter_hypernet is not None and block is not None
                    and p.add_adapter_cross_attn):
                h = self.adapter_hypernet(h, block.cross_attention)
            crossed = self.encoder_attn_layer_norm(h, residual,
                                                   deterministic)
            if prompt_len > 0 and decode_pos is None:
                # decoder input-prompt rows come from the reference's dry
                # decoder run WITHOUT encoder states (modeling_bart.py:
                # 1421-1424): the whole cross block — including its
                # LayerNorm — never touches them. Restore the pre-cross
                # hidden states on those rows so the single-pass concat
                # matches the dry-run semantics exactly.
                row = jnp.arange(crossed.shape[1])[None, :, None]
                crossed = jnp.where(row < prompt_len, residual, crossed)
            hidden_states = crossed

        # --- feed-forward ----------------------------------------------------------
        residual = hidden_states
        if (self.decoder_ff_ia3_mod is None and c.use_fused_ffn
                and ffn_supported(c, b.activation_function)):
            k1, b1 = self.fc1.kb()
            k2, b2 = self.fc2.kb()
            d = b.d_model
            rate = 0.0 if deterministic else b.activation_dropout
            seed = (jax.random.randint(self.make_rng("dropout"), (1,), 0,
                                       jnp.iinfo(jnp.int32).max,
                                       dtype=jnp.int32)
                    if rate > 0.0 else None)
            h = fused_ffn(hidden_states.reshape(-1, d), k1, b1, k2, b2,
                          b.activation_function, rate,
                          seed).reshape(hidden_states.shape)
        else:
            h = act(self.fc1(hidden_states))
            if self.decoder_ff_ia3_mod is not None:
                g = self.decoder_ff_ia3_mod()
                h = h + h * g.astype(h.dtype) if p.use_decoder_ff_ia3_add else h * g.astype(h.dtype)
            h = self.act_dropout(h, deterministic=deterministic)
            h = self.fc2(h)
        if self.ff_adapter is not None:
            h = self.ff_adapter(h, ctx)
        elif self.decoder_ff_adapter is not None:
            h = self.decoder_ff_adapter(h, ctx)
        elif self.ff_adapter_multihead is not None:
            h = h + self.ff_adapter_multihead(h)
        if self.adapter_hypernet is not None and block is not None:
            h = self.adapter_hypernet(h, block.feed_forward)
        hidden_states = self.final_layer_norm(h, residual, deterministic)
        return hidden_states, new_cache

    def compute_cross_kv(self, encoder_hidden_states: Array, ctx: PetContext):
        enc_h = encoder_hidden_states
        if self.decoder_enc_attn_key_value_adapter is not None:
            enc_h = self.decoder_enc_attn_key_value_adapter(enc_h, ctx)
        return self.encoder_attn.compute_cross_kv(enc_h, ctx)


# ---------------------------------------------------------------------------
# Stacks
# ---------------------------------------------------------------------------


class JointEncoder(nn.Module):
    """BART encoder + visual concat (reference: src/modeling_bart.py:696-898).

    Sequence layout: [prompt_prefix?; text; vis]. Text embeddings get
    layernorm_embedding before the concat (share_vis_lang_layer_norm=False
    default); the joint mask is text-mask ++ vis-mask.
    """

    cfg: VLModelConfig

    @property
    def _dtype(self):
        return jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32

    def _stack_hypernet(self):
        p = self.cfg.pet
        if not p.use_hyperformer:
            return None
        spec_kw = dict(
            d_model=self.cfg.d_model, reduction_factor=p.reduction_factor,
            num_layers=self.cfg.backbone.encoder_layers,
            add_layer_norm_before_adapter=p.add_layer_norm_before_adapter,
            add_layer_norm_after_adapter=p.add_layer_norm_after_adapter,
            dtype=self._dtype, name="adapter_layers_hyper_net")
        hspec = HyperformerSpec(
            projected_task_embedding_dim=(p.projected_task_embedding_dim
                                          if p.projected_task_embedding_dim > 0 else 64),
            unique_hyper_net=p.unique_hyper_net,
            efficient_unique_hyper_net=p.efficient_unique_hyper_net)
        if p.efficient_unique_hyper_net:
            return AdapterLayersOneHyperNetController(hspec, **spec_kw)
        return AdapterLayersHyperNetController(hspec, **spec_kw)

    @nn.compact
    def __call__(self, input_ids: Array, attention_mask: Array,
                 shared_embedding: Array,
                 vis_feats: Optional[Array] = None,
                 boxes: Optional[Array] = None,
                 img_order_ids: Optional[Array] = None,
                 obj_order_ids: Optional[Array] = None,
                 vis_attention_mask: Optional[Array] = None,
                 ctx: PetContext = None,
                 task_embedding: Optional[Array] = None,
                 deterministic: bool = True) -> Tuple[Array, Array]:
        """Returns (hidden_states, joint_attention_mask[B, L_joint])."""
        c = self.cfg
        b = c.backbone
        v = c.vis
        dt = self._dtype
        ctx = ctx or PetContext()
        B, L = input_ids.shape

        embed_scale = (b.d_model ** 0.5) if b.scale_embedding else 1.0
        inputs_embeds = jnp.take(shared_embedding, input_ids, axis=0).astype(dt) * embed_scale
        pos_table = self.param("embed_positions",
                               normal_init(b.init_std),
                               (b.max_position_embeddings + 2, b.d_model))
        positions = pos_table[2:2 + L].astype(dt)
        inputs_embeds = inputs_embeds + positions[None]

        # encoder prompt prefix (reference: :776-778); in attn-prefix mode the
        # prompt becomes per-layer KV context instead of input embeddings
        if c.pet.encoder_prompt_len > 0 and not c.pet.use_attn_prefix:
            spec = PromptSpec(prompt_len=c.pet.encoder_prompt_len,
                              mid_dim=c.pet.mid_dim,
                              use_single_prompt=c.pet.use_single_prompt,
                              tasks=c.pet.tasks)
            prefix = PromptController(spec, b.d_model, init_std=b.init_std, dtype=dt,
                                      name="prompt_modules")(B, ctx.task_idx)
            inputs_embeds = jnp.concatenate([prefix, inputs_embeds], axis=1)
            attention_mask = jnp.concatenate(
                [jnp.ones((B, prefix.shape[1]), attention_mask.dtype), attention_mask],
                axis=1)

        vis_prefix_kvs = None
        if not v.no_vis and vis_feats is not None and v.use_vis_prefix:
            # prefix variant: visual tokens become per-layer attention KV
            # context; nothing is concatenated to the sequence
            from vlpet_tpu.pet.prefix import ResidualVisualPrefix

            vis_inputs = (vis_feats, boxes)
            if v.oneddownsample:
                vis_inputs = downsample_vis(vis_inputs, v.n_boxes, oned=True)
            elif v.downsample:
                vis_inputs = downsample_vis(vis_inputs, v.n_boxes)
            vf = vis_inputs[0]
            vis_prefix_kvs = ResidualVisualPrefix(
                v.feat_dim, b.encoder_layers, b.encoder_attention_heads,
                b.d_model, init_std=b.init_std, dtype=dt,
                name="visual_embedding")(vf)
            if vis_attention_mask is None:
                vis_attention_mask = jnp.ones((B, vf.shape[1]),
                                              attention_mask.dtype)
            h = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="layernorm_embedding")(inputs_embeds)
            joint_mask = attention_mask
        elif not v.no_vis and vis_feats is not None:
            vis_inputs = (vis_feats, boxes)
            if img_order_ids is not None:
                vis_inputs = (vis_feats, boxes, img_order_ids, obj_order_ids)
            if v.oneddownsample:
                vis_inputs = downsample_vis(vis_inputs, v.n_boxes, oned=True)
            elif v.downsample:
                vis_inputs = downsample_vis(vis_inputs, v.n_boxes)
            vf, bx = vis_inputs[0], vis_inputs[1]
            io = vis_inputs[2] if len(vis_inputs) == 4 else img_order_ids
            oo = vis_inputs[3] if len(vis_inputs) == 4 else obj_order_ids
            if v.expand_vis_embedding:
                from vlpet_tpu.models.visual import ExpandVisualEmbedding

                ve_cls = ExpandVisualEmbedding
            elif v.use_lowrank_visual_projector:
                ve_cls = LowRankVisualEmbedding
            else:
                ve_cls = VisualEmbedding
            vis_embeds = ve_cls(v, b.d_model, init_std=b.init_std, dtype=dt,
                                name="visual_embedding")(vf, bx, shared_embedding,
                                                         img_order_ids=io,
                                                         obj_order_ids=oo)
            if v.sparse_sample and not deterministic:
                from vlpet_tpu.models.visual import sparse_sample

                vis_embeds = sparse_sample(vis_embeds, v.n_boxes,
                                           self.make_rng("dropout"))
            V_L = vis_embeds.shape[1]
            if v.share_vis_lang_layer_norm:
                h = jnp.concatenate([inputs_embeds, vis_embeds], axis=1)
                h = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="layernorm_embedding")(h)
            else:
                inputs_embeds = nn.LayerNorm(epsilon=1e-5, dtype=dt,
                                             name="layernorm_embedding")(inputs_embeds)
                h = jnp.concatenate([inputs_embeds, vis_embeds], axis=1)
            if vis_attention_mask is None:
                vis_attention_mask = jnp.ones((B, V_L), attention_mask.dtype)
            joint_mask = jnp.concatenate([attention_mask, vis_attention_mask], axis=1)
        else:
            h = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="layernorm_embedding")(inputs_embeds)
            joint_mask = attention_mask

        h = module_hash_dropout(self, h, b.dropout, deterministic)
        # length-collapsed (B, 1, 1, S) additive mask: broadcasts in both the
        # Pallas kernel and the XLA einsum path without ever materializing
        # the (B, 1, L, S) form in HBM
        attn_mask = expand_mask(joint_mask, 1, dt)

        prefix_kvs = None
        if vis_prefix_kvs is not None:
            prefix_kvs = vis_prefix_kvs
            P = vis_prefix_kvs[0][0].shape[1]
            vm = jnp.broadcast_to(
                vis_attention_mask[:, None, None, :].astype(dt),
                (B, 1, attn_mask.shape[2], P))
            attn_mask = jnp.concatenate([(1.0 - vm) * NEG_INF, attn_mask],
                                        axis=-1)
        elif c.pet.use_attn_prefix and c.pet.encoder_prompt_len > 0:
            from vlpet_tpu.pet.prefix import AttnPrefixController

            prefix_kvs = AttnPrefixController(
                c.pet.encoder_prompt_len, b.encoder_layers,
                b.encoder_attention_heads, b.d_model, mid_dim=c.pet.mid_dim,
                init_std=b.init_std, dtype=dt,
                name="encoder_prefix_embedding")(B)
            P = c.pet.encoder_prompt_len
            # prefix keys are always attendable: P zero columns on the left
            attn_mask = jnp.concatenate(
                [jnp.zeros(attn_mask.shape[:3] + (P,), attn_mask.dtype),
                 attn_mask], axis=-1)

        hypernet = self._stack_hypernet()
        layer_cls = BartEncoderLayer
        if c.remat != "none":
            # deterministic (positional idx 5, module at 0) is static
            layer_cls = nn.remat(BartEncoderLayer, policy=remat_policy(c.remat),
                                 static_argnums=(5,))
        if c.scan_layers and hypernet is None and prefix_kvs is None:
            # one traced/compiled layer body; params stacked (L, ...) under
            # 'layers'. attn_mask/ctx/deterministic are loop constants.
            def body(layer, carry, _):
                return layer(carry, attn_mask, ctx.for_layer(None), None,
                             deterministic), None

            scan = nn.scan(body, variable_axes={"params": 0},
                           split_rngs={"params": True, "dropout": True},
                           length=b.encoder_layers)
            h, _ = scan(layer_cls(c, 0, name="layers"), h, None)
            return h, joint_mask
        for i in range(b.encoder_layers):
            block = hypernet(task_embedding, i) if hypernet is not None else None
            h = layer_cls(c, i, name=f"layers_{i}")(
                h, attn_mask, ctx.for_layer(block),
                prefix_kvs[i] if prefix_kvs is not None else None,
                deterministic)
        return h, joint_mask


class BartDecoder(nn.Module):
    """BART decoder stack (reference: my_transformers/modeling_bart.py:2123-2363)."""

    cfg: VLModelConfig

    @property
    def _dtype(self):
        return jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32

    def setup(self):
        c = self.cfg
        b = c.backbone
        p = c.pet
        self.embed_positions = self.param("embed_positions", normal_init(b.init_std),
                                          (b.max_position_embeddings + 2, b.d_model))
        self.layernorm_embedding = nn.LayerNorm(epsilon=1e-5, dtype=self._dtype,
                                                name="layernorm_embedding")
        layer_cls = BartDecoderLayer
        if c.remat != "none":
            # deterministic (positional idx 11, module at 0) is static
            layer_cls = nn.remat(BartDecoderLayer, policy=remat_policy(c.remat),
                                 # beam_fused, deterministic, prompt_len
                                 static_argnums=(11, 12, 13))
        self.scan_ok = (c.scan_layers and not p.use_hyperformer
                        and not (p.use_attn_prefix and p.decoder_prompt_len > 0))
        if self.scan_ok:
            # single scanned layer; training/teacher-forcing path only —
            # decode (cache/cross_kvs) runs on a non-scan twin model with
            # unstacked params (models/scan_utils.py). Always the PLAIN
            # layer: the decoder's scan save-stack is 5.6x smaller than the
            # encoder's (L=10 vs 56) and remat'ing it trips a Mosaic
            # scoped-vmem limit in the fused-FFN backward at (5120, 768)
            # (PERF.md "scan + remat").
            self.scan_layer = BartDecoderLayer(c, 0, name="layers")
            self.layers = []
        else:
            self.layers = [layer_cls(c, i, name=f"layers_{i}")
                           for i in range(b.decoder_layers)]
        if p.use_attn_prefix and p.decoder_prompt_len > 0:
            from vlpet_tpu.pet.prefix import AttnPrefixController

            self.decoder_prefix_embedding = AttnPrefixController(
                p.decoder_prompt_len, b.decoder_layers,
                b.decoder_attention_heads, b.d_model, mid_dim=p.mid_dim,
                init_std=b.init_std, dtype=self._dtype,
                name="decoder_prefix_embedding")
            self.prompt_modules = None
        elif p.decoder_prompt_len > 0:
            # decoder input-prompt tuning: learned prompt embeddings run
            # through the decoder ahead of the real tokens. The reference
            # realizes this as a dry decoder run producing past_key_values
            # (modeling_bart.py:1421-1424); concatenating the prompt embeds
            # before the inputs (with positions offset accordingly) is
            # mathematically identical and single-pass.
            spec = PromptSpec(prompt_len=p.decoder_prompt_len,
                              mid_dim=p.mid_dim,
                              use_single_prompt=p.use_single_prompt,
                              tasks=p.tasks)
            self.prompt_modules = PromptController(
                spec, b.d_model, init_std=b.init_std, dtype=self._dtype,
                name="prompt_modules")
            self.decoder_prefix_embedding = None
        else:
            self.decoder_prefix_embedding = None
            self.prompt_modules = None
        self.adapter_layers_hyper_net = None
        if p.use_hyperformer:
            hspec = HyperformerSpec(
                projected_task_embedding_dim=(p.projected_task_embedding_dim
                                              if p.projected_task_embedding_dim > 0 else 64),
                unique_hyper_net=p.unique_hyper_net,
                efficient_unique_hyper_net=p.efficient_unique_hyper_net)
            spec_kw = dict(
                d_model=c.d_model, reduction_factor=p.reduction_factor,
                num_layers=b.decoder_layers,
                include_cross_attention=p.add_adapter_cross_attn,
                add_layer_norm_before_adapter=p.add_layer_norm_before_adapter,
                add_layer_norm_after_adapter=p.add_layer_norm_after_adapter,
                dtype=self._dtype, name="adapter_layers_hyper_net")
            cls = (AdapterLayersOneHyperNetController if p.efficient_unique_hyper_net
                   else AdapterLayersHyperNetController)
            self.adapter_layers_hyper_net = cls(hspec, **spec_kw)

    def __call__(self, input_ids: Array, shared_embedding: Array,
                 encoder_hidden_states: Optional[Array] = None,
                 encoder_attention_mask: Optional[Array] = None,
                 decoder_attention_mask: Optional[Array] = None,
                 ctx: PetContext = None,
                 task_embedding: Optional[Array] = None,
                 cross_kvs: Optional[Tuple] = None,
                 cache: Optional[Tuple] = None,
                 decode_pos: Optional[Array] = None,
                 beam_anc: Optional[Array] = None,
                 deterministic: bool = True):
        """Training: full teacher forcing (cache=None).
        Decoding: input_ids is (B, 1), cache holds (k, v) per layer, cross_kvs
        the precomputed cross-attention K/V per layer.
        ``beam_anc`` (B_true, K, L_cache) int32 enables reorder-free beam
        decode: input rows are beam-major (B_true*K), the cache is never
        reordered, and self-attention follows the ancestry mask
        (ops/decode.py). cross_kvs/encoder_attention_mask may then stay
        un-expanded at B_true rows.
        Returns (hidden, new_cache)."""
        c = self.cfg
        b = c.backbone
        dt = self._dtype
        ctx = ctx or PetContext()
        B, T = input_ids.shape

        embed_scale = (b.d_model ** 0.5) if b.scale_embedding else 1.0
        h = jnp.take(shared_embedding, input_ids, axis=0).astype(dt) * embed_scale
        P_in = 0
        if self.prompt_modules is not None and decode_pos is None:
            prompt = self.prompt_modules(B, ctx.task_idx)
            P_in = prompt.shape[1]
            h = jnp.concatenate([prompt, h], axis=1)
            T = T + P_in
        pos_table = self.embed_positions
        # with a P-length attention prefix in the past, decoder positions
        # start at P (past_key_values_length offset, HF 4.2.1 semantics)
        P_off = (c.pet.decoder_prompt_len
                 if (c.pet.use_attn_prefix and c.pet.decoder_prompt_len > 0)
                 else 0)
        beam_sel = None
        beam_fused = False
        if decode_pos is None:
            h = h + pos_table[2 + P_off:2 + P_off + T].astype(dt)[None]
            # the causal triangle is applied inside attention (causal=True
            # at the layer's self-attn call); only the padding mask — in its
            # length-collapsed (B, 1, 1, T) form — travels as a tensor
            self_mask = (expand_mask(decoder_attention_mask, 1, dt)
                         if decoder_attention_mask is not None else None)
        else:
            pos_emb = jax.lax.dynamic_slice(pos_table, (decode_pos + 2, 0),
                                            (1, b.d_model)).astype(dt)
            h = h + pos_emb[None]
            max_len = cache[0]["k"].shape[0]  # time-major cache
            if beam_anc is not None:
                from vlpet_tpu.ops.decode import _BEAM_TB, beam_blocks_fit

                # opt-in re-probe hatch; see the use_fused_beam config note.
                # beam_blocks_fit: the fused kernels' (L, tb·J, inner)
                # cache blocks blow the 16 MB scoped-vmem stack at f32
                # long-cache shapes (the tvc video-CLI eval, r4) — such
                # shapes take the XLA einsum fallback in beam_decode_attend
                K_ = beam_anc.shape[1]
                beam_fused = (jax.default_backend() not in ("cpu",)
                              and beam_anc.shape[0] % _BEAM_TB == 0
                              and c.use_fused_beam
                              and beam_blocks_fit(
                                  max_len, K_, K_, b.d_model,
                                  b.decoder_attention_heads,
                                  jnp.dtype(dt).itemsize))
                # the raw (B, K, L) ancestry travels to the attention, which
                # builds its flat kernel mask directly (ops/decode.py
                # beam_sel_big) — the 4-D additive form's tiny minor dims
                # forced pathological TPU layouts (1.2 ms/step, r3 profile)
                beam_sel = beam_anc
                self_mask = None
            else:
                j = jnp.arange(max_len)[None, None, None, :]
                self_mask = jnp.where(j <= decode_pos, 0.0, NEG_INF).astype(dt)

        h = self.layernorm_embedding(h)
        h = module_hash_dropout(self, h, b.dropout, deterministic)

        cross_mask = None
        if encoder_attention_mask is not None:
            cross_mask = expand_mask(encoder_attention_mask, 1, dt)

        prefix_kvs = None
        if (c.pet.use_attn_prefix and c.pet.decoder_prompt_len > 0
                and decode_pos is None):
            prefix_kvs = self.decoder_prefix_embedding(B)
            P = c.pet.decoder_prompt_len
            # prefix slots are always attendable: zero mask columns; the
            # in-attention causal offset (S-L = P) already opens them
            if self_mask is not None:
                self_mask = jnp.concatenate(
                    [jnp.zeros(self_mask.shape[:3] + (P,), self_mask.dtype),
                     self_mask], axis=-1)

        if self.scan_ok:
            assert cache is None and decode_pos is None and prefix_kvs is None, \
                "scan_layers decoder supports the teacher-forcing path only; " \
                "decode via a non-scan twin model (models/scan_utils.py)"

            def body(layer, carry, _):
                # full positional form (incl. beam_fused=False) so nn.remat's
                # static_argnums (11, 12, 13) line up with the loop path's
                out, _lc = layer(carry, ctx.for_layer(None),
                                 encoder_hidden_states, self_mask, cross_mask,
                                 None, None, None, None, None, False,
                                 deterministic, P_in)
                return out, None

            scan = nn.scan(body, variable_axes={"params": 0},
                           split_rngs={"params": True, "dropout": True},
                           length=b.decoder_layers)
            h, _ = scan(self.scan_layer, h, None)
            if P_in:
                h = h[:, P_in:]
            return h, None

        new_cache = []
        for i, layer in enumerate(self.layers):
            block = (self.adapter_layers_hyper_net(task_embedding, i)
                     if self.adapter_layers_hyper_net is not None else None)
            # positional form: nn.remat's static_argnums (deterministic)
            # indexes positional args only
            h, layer_cache = layer(
                h, ctx.for_layer(block),
                encoder_hidden_states,
                self_mask,
                cross_mask,
                cross_kvs[i] if cross_kvs is not None else None,
                cache[i] if cache is not None else None,
                decode_pos,
                prefix_kvs[i] if prefix_kvs is not None else None,
                beam_sel,
                beam_fused,
                deterministic,
                P_in)
            new_cache.append(layer_cache)
        if P_in:
            h = h[:, P_in:]
        return h, (tuple(new_cache) if cache is not None else None)

    def prefix_cache_init(self, batch_size: int, max_len: int):
        """Write decoder self-attn prefixes into the first P cache slots;
        generation then starts at position P (the past_key_values_length
        offset of the reference's prefix decoder)."""
        c = self.cfg
        if not (c.pet.use_attn_prefix and c.pet.decoder_prompt_len > 0):
            return None
        return self.decoder_prefix_embedding(batch_size)

    def compute_prompt_kvs(self, batch_size: int, ctx: PetContext,
                           task_embedding: Optional[Array] = None):
        """Per-layer self-attn K/V of the decoder INPUT-prompt rows —
        the reference's dry decoder run (modeling_bart.py:1421-1424)
        distilled to the past_key_values it produces: prompt embeds +
        positions 0..P-1 through every layer WITHOUT its cross block
        (no encoder states in the dry run). Returns ((k, v) per layer),
        each (B, P, H, Dh) — generation prefills cache[:P] with these and
        decodes from position P."""
        c = self.cfg
        b = c.backbone
        dt = self._dtype
        if self.prompt_modules is None:
            return None
        ctx = ctx or PetContext()
        prompt = self.prompt_modules(batch_size, ctx.task_idx).astype(dt)
        P = prompt.shape[1]
        h = prompt + self.embed_positions[2:2 + P].astype(dt)[None]
        h = self.layernorm_embedding(h)
        kvs = []
        for i, layer in enumerate(self.layers):
            block = (self.adapter_layers_hyper_net(task_embedding, i)
                     if (self.adapter_layers_hyper_net is not None
                         and task_embedding is not None) else None)
            lctx = ctx.for_layer(block)
            kvs.append(layer.self_attn.compute_self_kv(h, lctx))
            # run the layer body (no encoder states → cross block skipped,
            # exactly like the dry run) to produce the next layer's input
            h, _ = layer(h, lctx, None, None, None, None, None, None, None,
                         None, False, True, 0)
        return tuple(kvs)

    def compute_cross_kvs(self, encoder_hidden_states: Array, ctx: PetContext):
        """Precompute per-layer cross-attention K/V (VPA included) once per
        sequence — the reference caches these after the first decode step
        (my_transformers/modeling_bart.py:419-422)."""
        return tuple(layer.compute_cross_kv(encoder_hidden_states, ctx)
                     for layer in self.layers)
