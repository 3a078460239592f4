"""Flax T5 encoder/decoder with the VL-PET hook surface + VLT5 glue.

Reference: src/my_transformers/modeling_t5.py (T5 fork) and src/modeling_t5.py
(VL layer). Key semantics preserved:

* pre-LN blocks: y = sublayer(RMSNorm(x)); hooks act on y; gate inputs are
  the PRE-norm block input x (reference: :779-824, :359-408);
* no query scaling (Mesh-TF init absorbs 1/sqrt(d));
* relative position bias lives in layer 0 of each stack and is shared
  across layers (reference: :509-524, :1192);
* the VL joint encoder builds a block-diagonal bias: text↔text gets the T5
  bias, anything involving vision gets 0 (reference: src/modeling_t5.py:304-327);
* cross-attention VPA is applied inside the V projection on the raw encoder
  states (project_vpa, reference: :588-613); as in the reference, value
  adapters never fire on the self-attention branch;
* T5's PET surface has no LoRA/IA3/standalone-gating (grep: no use_lora in
  the T5 fork) — encoder hooks are serial adapter | multihead-down, one of
  four gates, hyperformer, scaling;
* tied lm head with the d_model**-0.5 rescale (reference:
  src/modeling_t5.py:672-675).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vlpet_tpu.ops.hashdrop import module_hash_dropout
from vlpet_tpu.config import HyperformerSpec, PromptSpec, T5Config, VLModelConfig
from vlpet_tpu.models.bart import NEG_INF, expand_mask
from vlpet_tpu.models.generate import padded_vocab_for_topk, topk_lse
from vlpet_tpu.models.visual import VisualEmbedding, LowRankVisualEmbedding, downsample_vis
from vlpet_tpu.models.vlbart import cross_entropy_with_ignore
from vlpet_tpu.pet.hypernet import (
    AdapterLayersHyperNetController,
    AdapterLayersOneHyperNetController,
    MetaLayersAdapterController,
    TaskEmbeddingController,
)
from vlpet_tpu.pet.modules import (
    AdapterController,
    GateLargeXLowRank,
    GateMiddleXYAdd,
    GateSmallXYCat,
    IA3Vector,
    MultiheadDownAdapter,
    PetContext,
    TaskDense,
    get_activation,
    make_shared_phm_W,
    normal_init,
)
from vlpet_tpu.pet.prompts import PromptController
from vlpet_tpu.train.freezing import path_is_trainable

Array = jax.Array


def relative_position_bucket(relative_position: Array, bidirectional: bool,
                             num_buckets: int = 32,
                             max_distance: int = 128) -> Array:
    """Mesh-TF bucketing (reference: my_transformers/modeling_t5.py:465-509)."""
    ret = jnp.zeros_like(relative_position)
    if bidirectional:
        num_buckets //= 2
        ret = ret + (relative_position > 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(relative_position)
    else:
        n = -jnp.minimum(relative_position, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5Attention(nn.Module):
    """T5 attention; ``role`` ∈ enc_self | dec_self | cross."""

    cfg: VLModelConfig
    role: str = "enc_self"
    has_relative_attention_bias: bool = False

    @property
    def _dtype(self):
        return jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32

    def setup(self):
        c = self.cfg
        b: T5Config = c.backbone
        p = c.pet
        inner = b.num_heads * b.d_kv
        dense = lambda name, i, o, std: nn.Dense(
            o, use_bias=False, kernel_init=normal_init(std), dtype=self._dtype,
            name=name)
        f = b.initializer_factor
        self.q = dense("q", b.d_model, inner, f * (b.d_model * b.d_kv) ** -0.5)
        self.k = dense("k", b.d_model, inner, f * b.d_model ** -0.5)
        self.v = dense("v", b.d_model, inner, f * b.d_model ** -0.5)
        self.o = dense("o", inner, b.d_model, f * inner ** -0.5)
        self.vpa = None
        if self.role == "cross" and p.use_decoder_enc_attn_value_parallel_adapter_down_dim:
            spec = p.down_dim_spec(b.d_model,
                                   p.decoder_enc_attn_value_parallel_adapter_down_dim,
                                   parallel=True)
            self.vpa = AdapterController(spec, init_std=None, dtype=self._dtype,
                                         name="attn_value_parallel_adapter")
        elif self.role == "dec_self" and p.use_decoder_self_attn_value_parallel_adapter_down_dim:
            # quirk preserved: params exist, hook never fires on self-attn
            spec = p.down_dim_spec(b.d_model,
                                   p.decoder_self_attn_value_parallel_adapter_down_dim,
                                   parallel=True)
            self.vpa = AdapterController(spec, init_std=None, dtype=self._dtype,
                                         name="attn_value_parallel_adapter")
        self.attn_dropout = nn.Dropout(rate=b.dropout_rate)
        if self.has_relative_attention_bias:
            self.relative_attention_bias = self.param(
                "relative_attention_bias",
                normal_init(b.initializer_factor * b.d_model ** -0.5),
                (b.relative_attention_num_buckets, b.num_heads))

    def compute_bias(self, q_len: int, k_len: int) -> Array:
        """(1, H, q_len, k_len) relative bias."""
        b: T5Config = self.cfg.backbone
        ctx_pos = jnp.arange(q_len)[:, None]
        mem_pos = jnp.arange(k_len)[None, :]
        buckets = relative_position_bucket(
            mem_pos - ctx_pos, bidirectional=(self.role != "dec_self"),
            num_buckets=b.relative_attention_num_buckets,
            max_distance=b.relative_attention_max_distance)
        values = jnp.take(self.relative_attention_bias, buckets, axis=0)
        return jnp.transpose(values, (2, 0, 1))[None].astype(self._dtype)

    def compute_bias_row(self, pos: Array, k_len: int) -> Array:
        """(1, H, 1, k_len) decoder bias for one query position (decode)."""
        b: T5Config = self.cfg.backbone
        mem_pos = jnp.arange(k_len)[None, :]
        buckets = relative_position_bucket(
            mem_pos - pos, bidirectional=False,
            num_buckets=b.relative_attention_num_buckets,
            max_distance=b.relative_attention_max_distance)
        values = jnp.take(self.relative_attention_bias, buckets, axis=0)
        return jnp.transpose(values, (2, 0, 1))[None].astype(self._dtype)

    def _shape(self, x: Array) -> Array:
        b: T5Config = self.cfg.backbone
        B, L, _ = x.shape
        return x.reshape(B, L, b.num_heads, b.d_kv)

    def compute_cross_kv(self, kv_states: Array, ctx: PetContext):
        k = self.k(kv_states)
        v = self.v(kv_states)
        if self.role == "cross" and self.vpa is not None:
            v = self.vpa(kv_states, ctx, y=v)
        return self._shape(k), self._shape(v)

    def __call__(self, hidden_states: Array, ctx: PetContext,
                 kv_states: Optional[Array] = None,
                 position_bias: Optional[Array] = None,
                 cross_kv: Optional[Tuple[Array, Array]] = None,
                 cache: Optional[Dict[str, Array]] = None,
                 decode_pos: Optional[Array] = None,
                 beam_sel: Optional[Array] = None,
                 beam_fused: bool = False,
                 deterministic: bool = True,
                 pad_mask: Optional[Array] = None):
        b: T5Config = self.cfg.backbone
        q = self._shape(self.q(hidden_states))  # no scaling (T5)
        new_cache = cache
        if self.role == "cross":
            if cross_kv is None:
                k, v = self.compute_cross_kv(kv_states, ctx)
            else:
                k, v = cross_kv
            if k.shape[0] != q.shape[0]:
                # beam-shared (un-expanded) encoder KV; position_bias here is
                # the (B, 1, 1, S) additive cross mask
                from vlpet_tpu.ops.decode import beam_cross_attend

                out = beam_cross_attend(q, k, v, mask=position_bias)
                B, L = q.shape[:2]
                return self.o(out.reshape(B, L, b.num_heads * b.d_kv)), new_cache
        elif cache is not None:
            # time-major (L, B, H, Dh) cache; leading-dim dus is in place
            k_new = self._shape(self.k(hidden_states))
            v_new = self._shape(self.v(hidden_states))
            from vlpet_tpu.ops.decode import (beam_decode_attend,
                                              beam_decode_attend_update,
                                              decode_attend)

            if beam_sel is not None and beam_fused:
                # fused attend + in-place cache write (see models/bart.py);
                # the own-row term gets the distance-0 relative bias
                own_bias = jax.lax.dynamic_slice(
                    position_bias.astype(jnp.float32),
                    (0, 0, 0, decode_pos),
                    (1, b.num_heads, 1, 1)).reshape(b.num_heads)
                out, k, v = beam_decode_attend_update(
                    q, cache["k"], cache["v"], k_new, v_new, beam_sel,
                    decode_pos, own_bias=own_bias, bias_row=position_bias)
                B, L = q.shape[:2]
                return (self.o(out.reshape(B, L, b.num_heads * b.d_kv)),
                        {"k": k, "v": v})
            # rank-3 (L, B, H*Dh) cache — see models/bart.py decode write
            B_ = k_new.shape[0]
            k_upd = k_new.reshape(1, B_, -1).astype(cache["k"].dtype)
            v_upd = v_new.reshape(1, B_, -1).astype(cache["v"].dtype)
            k = jax.lax.dynamic_update_slice(cache["k"], k_upd,
                                             (decode_pos, 0, 0))
            v = jax.lax.dynamic_update_slice(cache["v"], v_upd,
                                             (decode_pos, 0, 0))
            new_cache = {"k": k, "v": v}
            if beam_sel is not None:
                # position_bias here is the per-position relative-bias row
                # (1, H, 1, L) — position-dependent only, beam-broadcastable
                out = beam_decode_attend(q, k, v, beam_sel,
                                         bias_row=position_bias,
                                         decode_pos=decode_pos)
            else:
                # position_bias carries the causal mask + bias row
                out = decode_attend(q, k, v, bias_row=position_bias)
            B, L = q.shape[:2]
            return self.o(out.reshape(B, L, b.num_heads * b.d_kv)), new_cache
        else:
            k = self._shape(self.k(hidden_states))
            v = self._shape(self.v(hidden_states))
        B, L = q.shape[:2]
        S = k.shape[1]
        flag = getattr(self.cfg, "use_pallas_attention", None)
        # tri-state: None = auto — on for TPU. True/False force.
        enabled = (flag if flag is not None
                   else jax.default_backend() not in ("cpu",))
        from vlpet_tpu.ops.attention import fused_attention_fits

        rate = 0.0 if deterministic else float(b.dropout_rate)
        per_head_bias = (position_bias is not None
                         and position_bias.shape[1] > 1)
        # Is the relative bias trainable? Ask the freezing engine with this
        # module's param path (the 'bias' substring rule matches
        # relative_attention_bias under use_lora / unfreeze_*bias, and
        # unfreeze_language_model unfreezes the whole stack — advisor r2
        # #2 / r3 review #1). All blocks share block 0's bias tensor and
        # the rules are block-index-invariant, so self's own path decides
        # correctly even when the param lives in block 0.
        bias_grad = per_head_bias and path_is_trainable(
            ".".join(self.path) + ".relative_attention_bias", self.cfg.pet)
        use_pallas = (enabled
                      and (position_bias is not None or pad_mask is not None)
                      and L > 1
                      # shapes beyond every kernel's 16 MB scoped-vmem
                      # ceiling (see _select_attention_mode) fall back to
                      # XLA; video QA (S≈604) rides the per-head kernels
                      and fused_attention_fits(
                          B, L, S, b.num_heads * b.d_kv, b.num_heads,
                          per_head_bias, rate,
                          jnp.dtype(self._dtype).itemsize,
                          need_bwd=not deterministic, bias_grad=bias_grad))
        if use_pallas:
            # fused VMEM attention in projection-native layout (see
            # models/bart.py _attend). A batch-shared per-head bias
            # (T5 relative positions, (1,H,L,S)) rides as the kernel's
            # separate bias input; the per-batch padding mask rides in its
            # length-collapsed (B,1,1,S) form — their (B,H,L,S) sum never
            # materializes (it cost ~200 MB/step at flagship T5 shapes).
            # Attention-probs dropout (reference T5 applies dropout_rate to
            # the softmax weights) is fused IN-KERNEL via the hash mask —
            # before this, every training step fell back to the XLA einsum
            # path (~41 ms/step of layout copies + u32 rng at flagship
            # shapes; PERF.md r3 T5 profile).
            from vlpet_tpu.ops.attention import fused_attention

            seed = (jax.random.randint(self.make_rng("dropout"), (1,), 0,
                                       jnp.iinfo(jnp.int32).max,
                                       dtype=jnp.int32)
                    if rate > 0.0 else None)
            bias = None
            m = pad_mask
            if per_head_bias:
                bias = jnp.broadcast_to(
                    position_bias, (1,) + position_bias.shape[1:2] + (L, S))
            elif position_bias is not None:
                m = (position_bias if m is None
                     else m + position_bias)  # both (B|1, 1, 1|L, S)
            if m is None:
                m = jnp.zeros((1, 1, 1, S), jnp.float32)
            out = fused_attention(q.reshape(B, L, -1), k.reshape(B, S, -1),
                                  v.reshape(B, S, -1),
                                  m.astype(jnp.float32), b.num_heads,
                                  False, bias, rate, seed, bias_grad)
            return self.o(out), new_cache
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        if position_bias is not None:
            scores = scores + position_bias.astype(jnp.float32)
        if pad_mask is not None:
            scores = scores + pad_mask.astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        if b.dropout_rate > 0:
            probs = self.attn_dropout(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return self.o(out.reshape(B, L, b.num_heads * b.d_kv)), new_cache


class T5EncoderHooks(nn.Module):
    """Shared encoder hook chain applied to sublayer output y
    (reference: T5LayerSelfAttention/T5LayerFF forward hooks)."""

    cfg: VLModelConfig
    prefix: str  # 'attn' | 'ff'

    @property
    def _dtype(self):
        return jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32

    def setup(self):
        c = self.cfg
        p = c.pet
        d = c.d_model
        dt = self._dtype
        self.serial = None
        self.multihead = None
        self.gate_large = None
        self.gate_small = None
        self.gate_middle = None
        self.gate_ia3 = None
        if (p.use_adapter or p.use_compacter or p.use_lradapter) and not p.no_encoder_adapter:
            self.serial = AdapterController(p.adapter_spec(d), init_std=None,
                                            dtype=dt, name=f"{self.prefix}_adapter")
        elif p.use_encoder_adapter_down_multihead:
            self.multihead = MultiheadDownAdapter(
                d, p.adapter_down_dim, p.encoder_adapter_multihead_num_head,
                init_std=None, dtype=dt, name=f"{self.prefix}_adapter_multihead")
        if p.use_encoder_adapter_gating_large_x_lowrank:
            self.gate_large = GateLargeXLowRank(
                d, p.adapter_gating_down_dim, init_std=None, dtype=dt,
                name=f"encoder_{self.prefix}_adapter_gating_large_x_lowrank")
        elif p.use_encoder_adapter_gating_small_xy_cat:
            self.gate_small = GateSmallXYCat(
                d, init_std=None, dtype=dt,
                name=f"encoder_{self.prefix}_adapter_gating_small_xy_cat")
        elif p.use_encoder_adapter_gating_middle_xy_add:
            self.gate_middle = GateMiddleXYAdd(
                d, init_std=None, dtype=dt,
                name=f"encoder_{self.prefix}_adapter_gating_middle_xy_add")
        elif p.use_encoder_adapter_gating_middle_ia3_add:
            self.gate_ia3 = IA3Vector(
                d, name=f"encoder_{self.prefix}_adapter_gating_middle_ia3_add",
                param_name="gating_middle_ia3")
        self.hypernet = (MetaLayersAdapterController(
            d_model=d, dtype=dt,
            add_layer_norm_before_adapter=p.add_layer_norm_before_adapter,
            add_layer_norm_after_adapter=p.add_layer_norm_after_adapter,
            name="adapter_hypernet") if p.use_hyperformer else None)

    def __call__(self, y: Array, x_pre_norm: Array, ctx: PetContext,
                 block_w) -> Array:
        p = self.cfg.pet
        if self.serial is not None:
            y = self.serial(y, ctx)
        elif self.multihead is not None:
            delta = self.multihead(y)
            if p.use_encoder_adapter_scaling:
                delta = delta * p.encoder_adapter_scaling_factor
            if p.use_encoder_x2_scaling:
                y = y * p.encoder_x2_scaling_factor
            y = y + delta
        if self.hypernet is not None and block_w is not None:
            y = self.hypernet(y, block_w)
        if self.gate_large is not None:
            y = y * self.gate_large(x_pre_norm)
        elif self.gate_small is not None:
            y = y * self.gate_small(x_pre_norm, y)
        elif self.gate_middle is not None:
            y = y * self.gate_middle(x_pre_norm, y)
        elif self.gate_ia3 is not None:
            g = self.gate_ia3()
            y = y + y * g.astype(y.dtype)
        if p.use_encoder_gating_scaling:
            y = y * p.encoder_gating_scaling_factor
        return y


class T5Block(nn.Module):
    """Pre-LN block: self-attn [+ cross-attn] + ff
    (reference: my_transformers/modeling_t5.py:896-1088)."""

    cfg: VLModelConfig
    is_decoder: bool = False
    has_relative_attention_bias: bool = False

    @property
    def _dtype(self):
        return jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32

    def setup(self):
        c = self.cfg
        b: T5Config = c.backbone
        p = c.pet
        dt = self._dtype
        f = b.initializer_factor
        role = "dec_self" if self.is_decoder else "enc_self"
        self.self_attn = T5Attention(c, role=role,
                                     has_relative_attention_bias=self.has_relative_attention_bias,
                                     name="self_attn")
        self.self_attn_layer_norm = nn.RMSNorm(epsilon=b.layer_norm_epsilon,
                                               dtype=dt, name="self_attn_layer_norm")
        if self.is_decoder:
            self.cross_attn = T5Attention(c, role="cross", name="cross_attn")
            self.cross_attn_layer_norm = nn.RMSNorm(epsilon=b.layer_norm_epsilon,
                                                    dtype=dt,
                                                    name="cross_attn_layer_norm")
        self.ff_layer_norm = nn.RMSNorm(epsilon=b.layer_norm_epsilon, dtype=dt,
                                        name="ff_layer_norm")
        # TaskDense (shared) has the same 'kernel' param layout as nn.Dense
        # and exposes .kb() so the fused-FFN kernel can read the weights
        mk = lambda name, i, o, std: TaskDense(
            i, o, use_bias=False, kernel_init=normal_init(std), dtype=dt,
            name=name)
        if b.feed_forward_proj == "gated-gelu":
            self.wi_0 = mk("wi_0", b.d_model, b.d_ff, f * b.d_model ** -0.5)
            self.wi_1 = mk("wi_1", b.d_model, b.d_ff, f * b.d_model ** -0.5)
        else:
            self.wi = mk("wi", b.d_model, b.d_ff, f * b.d_model ** -0.5)
        self.wo = mk("wo", b.d_ff, b.d_model, f * b.d_ff ** -0.5)
        self.dropout = nn.Dropout(rate=b.dropout_rate)

        if not self.is_decoder:
            self.attn_hooks = T5EncoderHooks(c, "attn", name="attn_hooks")
            self.ff_hooks = T5EncoderHooks(c, "ff", name="ff_hooks")
        else:
            use_serial = ((p.use_adapter or p.use_compacter or p.use_lradapter)
                          and not p.no_decoder_adapter)
            self.attn_adapter = (AdapterController(p.adapter_spec(b.d_model),
                                                   init_std=None, dtype=dt,
                                                   name="attn_adapter")
                                 if use_serial else None)
            self.enc_attn_adapter = (AdapterController(p.adapter_spec(b.d_model),
                                                       init_std=None, dtype=dt,
                                                       name="enc_attn_adapter")
                                     if use_serial and p.add_adapter_cross_attn
                                     else None)
            self.ff_adapter = (AdapterController(p.adapter_spec(b.d_model),
                                                 init_std=None, dtype=dt,
                                                 name="ff_adapter")
                               if use_serial else None)
            self.adapter_hypernet = (MetaLayersAdapterController(
                d_model=b.d_model, dtype=dt,
                add_layer_norm_before_adapter=p.add_layer_norm_before_adapter,
                add_layer_norm_after_adapter=p.add_layer_norm_after_adapter,
                name="adapter_hypernet") if p.use_hyperformer else None)

    def _res_drop(self, y: Array, deterministic: bool) -> Array:
        """Residual-path dropout via the hash mask (ops/hashdrop.py): the
        integer hash fuses into XLA's add fusion, so no (B, L, D)
        rng-bit-generator tensor materializes (~2 ms/step across the 72
        residual sites at flagship T5 shapes — PERF.md r3 T5 profile)."""
        return module_hash_dropout(self, y, self.cfg.backbone.dropout_rate,
                                   deterministic)

    def _ff(self, x: Array, deterministic: bool) -> Array:
        b: T5Config = self.cfg.backbone
        gated = b.feed_forward_proj == "gated-gelu"
        if self.cfg.use_fused_ffn:
            from vlpet_tpu.ops.ffn import (ffn_supported, fused_ffn,
                                           fused_gated_ffn)

            act = "gelu_new" if gated else "relu"
            if ffn_supported(self.cfg, act):
                # Pallas fused FFN: the (·, d_ff) hidden(s) and the dropout
                # mask never touch HBM (ops/ffn.py); the gated t5-1.1 form
                # keeps all three weight matrices VMEM-resident
                d, F = b.d_model, b.d_ff
                rate = 0.0 if deterministic else b.dropout_rate
                seed = (jax.random.randint(self.make_rng("dropout"), (1,), 0,
                                           jnp.iinfo(jnp.int32).max,
                                           dtype=jnp.int32)
                        if rate > 0.0 else None)
                if gated:
                    k0, _ = self.wi_0.kb()
                    k1g, _ = self.wi_1.kb()
                    ko, _ = self.wo.kb()
                    return fused_gated_ffn(x.reshape(-1, d), k0, k1g, ko,
                                           "gelu_new", rate,
                                           seed).reshape(x.shape)
                k1, _ = self.wi.kb()
                k2, _ = self.wo.kb()
                zf = jnp.zeros((F,), jnp.float32)
                zd = jnp.zeros((d,), jnp.float32)
                return fused_ffn(x.reshape(-1, d), k1, zf, k2, zd, "relu",
                                 rate, seed).reshape(x.shape)
        if gated:
            h = get_activation("gelu_new")(self.wi_0(x)) * self.wi_1(x)
        else:
            h = jax.nn.relu(self.wi(x))
        h = self.dropout(h, deterministic=deterministic)
        return self.wo(h)

    def __call__(self, hidden_states: Array, ctx: PetContext,
                 position_bias: Optional[Array] = None,
                 encoder_hidden_states: Optional[Array] = None,
                 encoder_attention_mask: Optional[Array] = None,
                 cross_kv: Optional[Tuple[Array, Array]] = None,
                 cache: Optional[Dict[str, Array]] = None,
                 decode_pos: Optional[Array] = None,
                 beam_sel: Optional[Array] = None,
                 beam_fused: bool = False,
                 deterministic: bool = True,
                 pad_mask: Optional[Array] = None,
                 prompt_len: int = 0):
        block = ctx.block_adapters
        # --- self-attention ------------------------------------------------
        x = hidden_states
        y, new_cache = self.self_attn(self.self_attn_layer_norm(x), ctx,
                                      position_bias=position_bias, cache=cache,
                                      decode_pos=decode_pos, beam_sel=beam_sel,
                                      beam_fused=beam_fused,
                                      deterministic=deterministic,
                                      pad_mask=pad_mask)
        if not self.is_decoder:
            y = self.attn_hooks(y, x, ctx,
                                block.self_attention if block else None)
        else:
            if self.attn_adapter is not None:
                y = self.attn_adapter(y, ctx)
            if self.adapter_hypernet is not None and block is not None:
                y = self.adapter_hypernet(y, block.self_attention)
        hidden_states = x + self._res_drop(y, deterministic)

        # --- cross-attention -------------------------------------------------
        if self.is_decoder and (encoder_hidden_states is not None
                                or cross_kv is not None):
            x = hidden_states
            y, _ = self.cross_attn(self.cross_attn_layer_norm(x), ctx,
                                   kv_states=encoder_hidden_states,
                                   position_bias=encoder_attention_mask,
                                   cross_kv=cross_kv,
                                   deterministic=deterministic)
            if self.enc_attn_adapter is not None:
                y = self.enc_attn_adapter(y, ctx)
            if (self.adapter_hypernet is not None and block is not None
                    and self.cfg.pet.add_adapter_cross_attn):
                y = self.adapter_hypernet(y, block.cross_attention)
            crossed = x + self._res_drop(y, deterministic)
            if prompt_len > 0 and decode_pos is None:
                # decoder input-prompt rows come from the reference's dry
                # decoder run WITHOUT encoder states (modeling_t5.py:
                # 642-645): the cross block never touches them — restore
                # the pre-cross hidden states on those rows
                row = jnp.arange(crossed.shape[1])[None, :, None]
                crossed = jnp.where(row < prompt_len, x, crossed)
            hidden_states = crossed

        # --- feed-forward ----------------------------------------------------
        x = hidden_states
        y = self._ff(self.ff_layer_norm(x), deterministic)
        if not self.is_decoder:
            y = self.ff_hooks(y, x, ctx, block.feed_forward if block else None)
        else:
            if self.ff_adapter is not None:
                y = self.ff_adapter(y, ctx)
            if self.adapter_hypernet is not None and block is not None:
                y = self.adapter_hypernet(y, block.feed_forward)
        hidden_states = x + self._res_drop(y, deterministic)
        if self._dtype != jnp.float32:
            # float() keeps the bound weakly-typed: jnp.finfo's numpy scalar
            # would promote the whole residual stream to fp32
            clamp = float(jnp.finfo(self._dtype).max - 1000)
            hidden_states = jnp.clip(hidden_states, -clamp, clamp)
        return hidden_states, new_cache


class T5JointEncoder(nn.Module):
    """T5 encoder + visual concat + block-diagonal relative bias
    (reference: src/modeling_t5.py:177-404)."""

    cfg: VLModelConfig

    @property
    def _dtype(self):
        return jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32

    def setup(self):
        c = self.cfg
        b: T5Config = c.backbone
        self.blocks = [T5Block(c, is_decoder=False,
                               has_relative_attention_bias=(i == 0),
                               name=f"blocks_{i}")
                       for i in range(b.num_layers)]
        self.final_layer_norm = nn.RMSNorm(epsilon=b.layer_norm_epsilon,
                                           dtype=self._dtype,
                                           name="final_layer_norm")
        if not c.vis.no_vis:
            ve_cls = (LowRankVisualEmbedding if c.vis.use_lowrank_visual_projector
                      else VisualEmbedding)
            self.visual_embedding = ve_cls(c.vis, b.d_model, init_std=None,
                                           t5_style_ln=True, dtype=self._dtype,
                                           name="visual_embedding")
        if c.pet.encoder_prompt_len > 0:
            spec = PromptSpec(prompt_len=c.pet.encoder_prompt_len,
                              mid_dim=c.pet.mid_dim,
                              use_single_prompt=c.pet.use_single_prompt,
                              tasks=c.pet.tasks)
            self.prompt_modules = PromptController(spec, b.d_model,
                                                   init_std=None,
                                                   dtype=self._dtype,
                                                   name="prompt_modules")
        else:
            self.prompt_modules = None
        p = c.pet
        self.adapter_layers_hyper_net = None
        if p.use_hyperformer:
            hspec = HyperformerSpec(
                projected_task_embedding_dim=(p.projected_task_embedding_dim
                                              if p.projected_task_embedding_dim > 0 else 64))
            cls = (AdapterLayersOneHyperNetController if p.efficient_unique_hyper_net
                   else AdapterLayersHyperNetController)
            self.adapter_layers_hyper_net = cls(
                hspec, d_model=c.d_model, reduction_factor=p.reduction_factor,
                num_layers=b.num_layers,
                add_layer_norm_before_adapter=p.add_layer_norm_before_adapter,
                add_layer_norm_after_adapter=p.add_layer_norm_after_adapter,
                dtype=self._dtype, name="adapter_layers_hyper_net")

    def __call__(self, input_ids, attention_mask, shared_embedding,
                 vis_feats=None, boxes=None, img_order_ids=None,
                 obj_order_ids=None, vis_attention_mask=None,
                 ctx: PetContext = None, task_embedding=None,
                 deterministic: bool = True):
        c = self.cfg
        b: T5Config = c.backbone
        v = c.vis
        dt = self._dtype
        ctx = ctx or PetContext()
        B, L = input_ids.shape
        h = jnp.take(shared_embedding, input_ids, axis=0).astype(dt)

        if self.prompt_modules is not None:
            prefix = self.prompt_modules(B, ctx.task_idx)
            h = jnp.concatenate([prefix, h], axis=1)
            attention_mask = jnp.concatenate(
                [jnp.ones((B, prefix.shape[1]), attention_mask.dtype),
                 attention_mask], axis=1)
            L = h.shape[1]

        V_L = 0
        if not v.no_vis and vis_feats is not None:
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
            vis_embeds = self.visual_embedding(vf, bx, shared_embedding,
                                               img_order_ids=io, obj_order_ids=oo)
            if v.sparse_sample and not deterministic:
                from vlpet_tpu.models.visual import sparse_sample

                vis_embeds = sparse_sample(vis_embeds, v.n_boxes,
                                           self.make_rng("dropout"))
            V_L = vis_embeds.shape[1]
            h = jnp.concatenate([h, vis_embeds], axis=1)
            if vis_attention_mask is None:
                vis_attention_mask = jnp.ones((B, V_L), attention_mask.dtype)
            joint_mask = jnp.concatenate([attention_mask, vis_attention_mask],
                                         axis=1)
        else:
            joint_mask = attention_mask

        h = module_hash_dropout(self, h, self.cfg.backbone.dropout_rate,
                                deterministic)
        # length-collapsed (B,1,1,S) padding mask — kept SEPARATE from the
        # (1,H,S,S) relative bias so their per-batch-per-head sum
        # (B,H,S,S — ~200 MB/step at flagship shapes) never materializes;
        # the attention adds both (in-kernel on TPU, fused adds on CPU)
        ext_mask = expand_mask(joint_mask, 1, dt)

        # block-diagonal bias: text↔text T5 bias, vision rows/cols 0
        text_bias = self.blocks[0].self_attn.compute_bias(L, L)
        n_heads = text_bias.shape[1]
        position_bias = jnp.zeros((1, n_heads, L + V_L, L + V_L), dt)
        position_bias = position_bias.at[:, :, :L, :L].set(text_bias)

        for i, blk in enumerate(self.blocks):
            block_w = (self.adapter_layers_hyper_net(task_embedding, i)
                       if self.adapter_layers_hyper_net is not None else None)
            h, _ = blk(h, ctx.for_layer(block_w), position_bias=position_bias,
                       deterministic=deterministic, pad_mask=ext_mask)
        h = self.final_layer_norm(h)
        h = module_hash_dropout(self, h, self.cfg.backbone.dropout_rate,
                                deterministic)
        return h, joint_mask


class T5Decoder(nn.Module):
    """T5 decoder stack (standard T5Stack, reference: modeling_t5.py:1090-1460)."""

    cfg: VLModelConfig

    @property
    def _dtype(self):
        return jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32

    def setup(self):
        c = self.cfg
        b: T5Config = c.backbone
        p = c.pet
        self.blocks = [T5Block(c, is_decoder=True,
                               has_relative_attention_bias=(i == 0),
                               name=f"blocks_{i}")
                       for i in range(b.num_decoder_layers)]
        self.final_layer_norm = nn.RMSNorm(epsilon=b.layer_norm_epsilon,
                                           dtype=self._dtype,
                                           name="final_layer_norm")
        # decoder input-prompt tuning (reference: VLT5's dry decoder run at
        # src/modeling_t5.py:642-645 → past_key_values); realized here as a
        # single-pass concat whose prompt rows skip the cross block
        self.prompt_modules = None
        if c.pet.decoder_prompt_len > 0:
            spec = PromptSpec(prompt_len=c.pet.decoder_prompt_len,
                              mid_dim=c.pet.mid_dim,
                              use_single_prompt=c.pet.use_single_prompt,
                              tasks=c.pet.tasks)
            self.prompt_modules = PromptController(
                spec, b.d_model, init_std=None, dtype=self._dtype,
                name="prompt_modules")
        self.adapter_layers_hyper_net = None
        if p.use_hyperformer:
            hspec = HyperformerSpec(
                projected_task_embedding_dim=(p.projected_task_embedding_dim
                                              if p.projected_task_embedding_dim > 0 else 64))
            cls = (AdapterLayersOneHyperNetController if p.efficient_unique_hyper_net
                   else AdapterLayersHyperNetController)
            self.adapter_layers_hyper_net = cls(
                hspec, d_model=c.d_model, reduction_factor=p.reduction_factor,
                num_layers=b.num_decoder_layers,
                include_cross_attention=p.add_adapter_cross_attn,
                add_layer_norm_before_adapter=p.add_layer_norm_before_adapter,
                add_layer_norm_after_adapter=p.add_layer_norm_after_adapter,
                dtype=self._dtype, name="adapter_layers_hyper_net")

    def __call__(self, input_ids, shared_embedding,
                 encoder_hidden_states=None, encoder_attention_mask=None,
                 ctx: PetContext = None, task_embedding=None,
                 cross_kvs=None, cache=None, decode_pos=None, beam_anc=None,
                 deterministic: bool = True):
        c = self.cfg
        b: T5Config = c.backbone
        dt = self._dtype
        ctx = ctx or PetContext()
        B, T = input_ids.shape
        h = jnp.take(shared_embedding, input_ids, axis=0).astype(dt)
        P_in = 0
        if self.prompt_modules is not None and decode_pos is None:
            # prompt rows ride positions 0..P-1 of the concat sequence —
            # T5's relative bias over the concat length reproduces the
            # reference's dry-run(0..P-1) + real-run(P..) positions exactly
            prompt = self.prompt_modules(B, ctx.task_idx).astype(dt)
            P_in = prompt.shape[1]
            h = jnp.concatenate([prompt, h], axis=1)
            T = T + P_in
        h = module_hash_dropout(self, h, self.cfg.backbone.dropout_rate,
                                deterministic)

        beam_sel = None
        beam_fused = False
        if decode_pos is None:
            causal = jnp.where(
                jnp.arange(T)[None, :] <= jnp.arange(T)[:, None], 0.0,
                NEG_INF).astype(dt)[None, None]
            self_bias = self.blocks[0].self_attn.compute_bias(T, T) + causal
        else:
            max_len = cache[0]["k"].shape[0]  # time-major cache
            row = self.blocks[0].self_attn.compute_bias_row(decode_pos, max_len)
            if beam_anc is not None:
                # reorder-free beam decode: the ancestry-derived mask carries
                # the causal constraint; the bias row rides through attention
                from vlpet_tpu.ops.decode import _BEAM_TB, beam_blocks_fit

                # opt-in re-probe hatch; see the use_fused_beam config
                # note. beam_blocks_fit: f32 long-cache shapes blow the
                # fused kernels' scoped vmem (see bart.py) → XLA fallback
                K_ = beam_anc.shape[1]
                b_ = self.cfg.backbone
                beam_fused = (jax.default_backend() not in ("cpu",)
                              and beam_anc.shape[0] % _BEAM_TB == 0
                              and self.cfg.use_fused_beam
                              and beam_blocks_fit(
                                  max_len, K_, K_,
                                  b_.num_heads * b_.d_kv, b_.num_heads,
                                  jnp.dtype(dt).itemsize))
                # raw (B, K, L) ancestry; attention builds the flat kernel
                # mask directly (ops/decode.py beam_sel_big — see bart.py)
                beam_sel = beam_anc
                self_bias = row
            else:
                causal = jnp.where(jnp.arange(max_len)[None, None, None, :] <= decode_pos,
                                   0.0, NEG_INF).astype(dt)
                self_bias = row + causal

        cross_mask = None
        if encoder_attention_mask is not None:
            # length-collapsed (B,1,1,S); broadcasts in-kernel / in-fusion
            cross_mask = expand_mask(encoder_attention_mask, 1, dt)

        new_cache = []
        for i, blk in enumerate(self.blocks):
            block_w = (self.adapter_layers_hyper_net(task_embedding, i)
                       if self.adapter_layers_hyper_net is not None else None)
            h, layer_cache = blk(h, ctx.for_layer(block_w),
                                 position_bias=self_bias,
                                 encoder_hidden_states=encoder_hidden_states,
                                 encoder_attention_mask=cross_mask,
                                 cross_kv=cross_kvs[i] if cross_kvs is not None else None,
                                 cache=cache[i] if cache is not None else None,
                                 decode_pos=decode_pos, beam_sel=beam_sel,
                                 beam_fused=beam_fused,
                                 deterministic=deterministic,
                                 prompt_len=P_in)
            new_cache.append(layer_cache)
        if P_in:
            h = h[:, P_in:]
        h = self.final_layer_norm(h)
        h = module_hash_dropout(self, h, self.cfg.backbone.dropout_rate,
                                deterministic)
        return h, (tuple(new_cache) if cache is not None else None)

    def compute_cross_kvs(self, encoder_hidden_states, ctx: PetContext):
        return tuple(blk.cross_attn.compute_cross_kv(encoder_hidden_states, ctx)
                     for blk in self.blocks)

    def compute_prompt_kvs(self, batch_size: int, ctx: PetContext,
                           task_embedding=None):
        """Per-layer self-attn K/V of the decoder INPUT-prompt rows — the
        intended semantics of the reference's dry decoder run
        (modeling_t5.py:642-645; dead code there, see
        test_t5_prompt_tuning_model_parity): prompt embeds through every
        block WITHOUT its cross section. Returns ((k, v) per layer), each
        (B, P, H, Dh); generation prefills cache[:P] and decodes from P."""
        c = self.cfg
        dt = self._dtype
        if self.prompt_modules is None:
            return None
        ctx = ctx or PetContext()
        prompt = self.prompt_modules(batch_size, ctx.task_idx).astype(dt)
        P = prompt.shape[1]
        h = prompt
        causal = jnp.where(
            jnp.arange(P)[None, :] <= jnp.arange(P)[:, None], 0.0,
            NEG_INF).astype(dt)[None, None]
        self_bias = self.blocks[0].self_attn.compute_bias(P, P) + causal
        kvs = []
        for i, blk in enumerate(self.blocks):
            block_w = (self.adapter_layers_hyper_net(task_embedding, i)
                       if (self.adapter_layers_hyper_net is not None
                           and task_embedding is not None) else None)
            lctx = ctx.for_layer(block_w)
            # T5 self-attn projects the PRE-normed block input
            kvs.append(blk.self_attn.compute_cross_kv(
                blk.self_attn_layer_norm(h), lctx))
            h, _ = blk(h, lctx, position_bias=self_bias, deterministic=True)
        return tuple(kvs)


class VLT5Model(nn.Module):
    cfg: VLModelConfig

    def setup(self):
        c = self.cfg
        b: T5Config = c.backbone
        self.shared = self.param("shared",
                                 normal_init(b.initializer_factor * 1.0),
                                 (b.vocab_size, b.d_model))
        self.encoder = T5JointEncoder(c, name="encoder")
        self.decoder = T5Decoder(c, name="decoder")
        if c.pet.use_hyperformer:
            hspec = HyperformerSpec(
                projected_task_embedding_dim=(c.pet.projected_task_embedding_dim
                                              if c.pet.projected_task_embedding_dim > 0
                                              else 64))
            self.shared_task_embed = TaskEmbeddingController(
                hspec, tasks=c.pet.tasks, name="shared_task_embed")
        else:
            self.shared_task_embed = None

    def _task_embedding(self, ctx: PetContext):
        if self.shared_task_embed is None:
            return None
        return self.shared_task_embed(ctx.task_idx)

    def encode(self, input_ids, attention_mask, vis_feats=None, boxes=None,
               img_order_ids=None, obj_order_ids=None, vis_attention_mask=None,
               ctx: PetContext = None, deterministic: bool = True):
        ctx = ctx or PetContext()
        return self.encoder(input_ids, attention_mask, self.shared,
                            vis_feats=vis_feats, boxes=boxes,
                            img_order_ids=img_order_ids,
                            obj_order_ids=obj_order_ids,
                            vis_attention_mask=vis_attention_mask, ctx=ctx,
                            task_embedding=self._task_embedding(ctx),
                            deterministic=deterministic)

    def decode(self, decoder_input_ids, encoder_hidden_states, joint_mask,
               ctx: PetContext = None, cross_kvs=None, cache=None,
               decode_pos=None, beam_anc=None, deterministic: bool = True):
        ctx = ctx or PetContext()
        return self.decoder(decoder_input_ids, self.shared,
                            encoder_hidden_states=encoder_hidden_states,
                            encoder_attention_mask=joint_mask, ctx=ctx,
                            task_embedding=self._task_embedding(ctx),
                            cross_kvs=cross_kvs, cache=cache,
                            decode_pos=decode_pos, beam_anc=beam_anc,
                            deterministic=deterministic)

    def compute_cross_kvs(self, encoder_hidden_states, ctx: PetContext):
        return self.decoder.compute_cross_kvs(encoder_hidden_states, ctx)


class VLT5(nn.Module):
    """Seq2seq head over VLT5Model (reference: src/modeling_t5.py:404-860).

    T5 shift: decoder input = labels shifted right with pad as start
    (decoder_start_token_id = pad = 0); tied lm head with the
    d_model**-0.5 rescale.
    """

    cfg: VLModelConfig

    def setup(self):
        self.model = VLT5Model(self.cfg, name="model")
        b: T5Config = self.cfg.backbone
        if not b.tie_word_embeddings:
            self.lm_head = nn.Dense(b.vocab_size, use_bias=False,
                                    kernel_init=normal_init(b.initializer_factor),
                                    name="lm_head")
        else:
            self.lm_head = None
        if (self.cfg.pet.use_compacter and self.cfg.pet.shared_phm_rule):
            pd = self.cfg.pet.hypercomplex_division
            self.phm_rule = self.param("phm_rule",
                                       normal_init(self.cfg.pet.phm_init_range),
                                       (pd, pd, pd))
        else:
            self.phm_rule = None
        # classifier head (reference: vqa_model.py:8-18 — VLT5VQA has the
        # same BCE answer head as the BART variant)
        if self.cfg.classifier:
            from vlpet_tpu.models.vlbart import AnswerHead

            self.answer_head = AnswerHead(
                b.d_model, self.cfg.num_answers,
                init_std=b.initializer_factor * 0.02, name="answer_head")
        else:
            self.answer_head = None
        # model-shared Compacter slow weights (shared_W_phm; the reference's
        # set_W path is dead code — see config.AdapterSpec.shared_W_phm)
        if self.cfg.pet.use_compacter and self.cfg.pet.shared_W_phm:
            self.phm_W = make_shared_phm_W(self, self.cfg.pet, b.d_model)
        else:
            self.phm_W = None

    def _ctx(self, ctx: Optional[PetContext]) -> PetContext:
        ctx = ctx or PetContext()
        if self.phm_rule is not None and ctx.phm_rule is None:
            ctx = dataclasses.replace(ctx, phm_rule=self.phm_rule)
        if self.phm_W is not None and ctx.phm_W is None:
            ctx = dataclasses.replace(ctx, phm_W=self.phm_W)
        return ctx

    def _logits(self, dec_out: Array, pad_vocab_to: int = None) -> Array:
        b: T5Config = self.cfg.backbone
        if b.tie_word_embeddings:
            dec_out = dec_out * (b.d_model ** -0.5)
            w = self.model.shared.astype(dec_out.dtype)
            V = w.shape[0]
            if pad_vocab_to is not None and pad_vocab_to > V:
                # Exact-top-k decode (see VLBart._logits): the weight pad is
                # loop-invariant (hoists out of the decode while_loop); T5
                # has no logits bias, so pad columns are forced to _PAD with
                # an iota-select that XLA fuses into the GEMM's output
                # fusion (no extra HBM pass). T5-base's 32128 vocab is
                # 251*128, so this only fires for grown, misaligned vocabs.
                w = jnp.pad(w, ((0, pad_vocab_to - V), (0, 0)))
            logits = jnp.einsum("btd,vd->btv", dec_out, w,
                                preferred_element_type=jnp.float32)
            if pad_vocab_to is not None and pad_vocab_to > V:
                from vlpet_tpu.ops.topk import _PAD
                col = jax.lax.broadcasted_iota(
                    jnp.int32, (1, 1, pad_vocab_to), 2)
                logits = jnp.where(col >= V, jnp.float32(_PAD), logits)
        else:
            logits = self.lm_head(dec_out)
        return logits.astype(jnp.float32)

    def __call__(self, input_ids, attention_mask, vis_feats=None, boxes=None,
                 img_order_ids=None, obj_order_ids=None,
                 vis_attention_mask=None, labels=None, decoder_input_ids=None,
                 decoder_attention_mask=None, ctx: PetContext = None,
                 deterministic: bool = True, reduce_loss: bool = False,
                 output_hidden_states: bool = False):
        c = self.cfg
        b: T5Config = c.backbone
        ctx = self._ctx(ctx)
        if decoder_input_ids is None and labels is not None:
            shifted = jnp.roll(labels, 1, axis=-1)
            shifted = shifted.at[:, 0].set(b.decoder_start_token_id)
            decoder_input_ids = jnp.where(shifted == -100, b.pad_token_id, shifted)
        enc_out, joint_mask = self.model.encode(
            input_ids, attention_mask, vis_feats, boxes, img_order_ids,
            obj_order_ids, vis_attention_mask, ctx, deterministic)
        dec_out, _ = self.model.decode(decoder_input_ids, enc_out, joint_mask,
                                       ctx, deterministic=deterministic)
        logits = self._logits(dec_out)
        out = {"logits": logits, "encoder_last_hidden_state": enc_out}
        if self.answer_head is not None:
            out["answer_logits"] = self.answer_head(dec_out[:, -1])
        if output_hidden_states:
            out["decoder_last_hidden_state"] = dec_out
        if labels is not None:
            from vlpet_tpu.ops.fused_ce import pick_row_tile

            p = c.pet
            head_frozen = (b.tie_word_embeddings
                           and not p.unfreeze_lm_head
                           and not p.unfreeze_language_model)
            fused_ok = (getattr(c, "use_fused_ce", False)
                        and jax.default_backend() not in ("cpu",)
                        and head_frozen
                        and pick_row_tile(labels.size) is not None)
            B, T = labels.shape
            if fused_ok:
                # fused linear+CE straight from dec_out (ops/fused_ce.py);
                # the tied-rescale rides on the activations
                from vlpet_tpu.ops.fused_ce import fused_linear_ce

                x2 = (dec_out * (b.d_model ** -0.5)).reshape(B * T, -1)
                zero_b = jnp.zeros((b.vocab_size,), jnp.float32)
                per_tok = fused_linear_ce(x2, self.model.shared, zero_b,
                                          labels.reshape(-1)).reshape(B, T)
            elif head_frozen and dec_out.dtype == jnp.bfloat16:
                # one bf16 logits materialization (ops/ce.py; see VLBart._ce)
                from vlpet_tpu.ops.ce import linear_ce

                x2 = (dec_out * (b.d_model ** -0.5)).reshape(B * T, -1)
                zero_b = jnp.zeros((b.vocab_size,), jnp.float32)
                per_tok = linear_ce(x2, self.model.shared, zero_b,
                                    labels.reshape(-1)).reshape(B, T)
            else:
                out["loss"] = cross_entropy_with_ignore(logits, labels,
                                                        reduce=reduce_loss)
                return out
            if reduce_loss:
                out["loss"] = per_tok.sum() / jnp.maximum(
                    (labels != -100).sum(), 1)
            else:
                out["loss"] = per_tok
        return out

    def classify(self, input_ids, attention_mask, vis_feats=None, boxes=None,
                 img_order_ids=None, obj_order_ids=None,
                 ctx: PetContext = None, deterministic: bool = True):
        """Classifier-head forward: single decoder_start (= pad) token,
        answer logits from the last decoder state (reference:
        vqa_model.py:25-56 — VLT5VQA classifier branch)."""
        b: T5Config = self.cfg.backbone
        ctx = self._ctx(ctx)
        B = input_ids.shape[0]
        dec = jnp.full((B, 1), b.decoder_start_token_id, jnp.int32)
        enc_out, joint_mask = self.model.encode(
            input_ids, attention_mask, vis_feats, boxes, img_order_ids,
            obj_order_ids, None, ctx, deterministic)
        dec_out, _ = self.model.decode(dec, enc_out, joint_mask, ctx,
                                       deterministic=deterministic)
        return self.answer_head(dec_out[:, -1])

    # generation-facing methods (same staged API as VLBart)
    def encode(self, input_ids, attention_mask, vis_feats=None, boxes=None,
               img_order_ids=None, obj_order_ids=None, vis_attention_mask=None,
               ctx: PetContext = None):
        ctx = self._ctx(ctx)
        return self.model.encode(input_ids, attention_mask, vis_feats, boxes,
                                 img_order_ids, obj_order_ids,
                                 vis_attention_mask, ctx, deterministic=True)

    def init_decode(self, encoder_hidden_states, ctx: PetContext = None):
        ctx = self._ctx(ctx)
        return self.model.compute_cross_kvs(encoder_hidden_states, ctx)

    def init_decoder_prompt(self, batch_size: int, ctx: PetContext = None):
        """Per-layer self-attn KV of the decoder INPUT-prompt rows for
        generation cache prefill (see T5Decoder.compute_prompt_kvs)."""
        ctx = self._ctx(ctx)
        return self.model.decoder.compute_prompt_kvs(
            batch_size, ctx, self.model._task_embedding(ctx))

    def decode_step(self, decoder_input_ids, joint_mask, cross_kvs, cache,
                    decode_pos, ctx: PetContext = None, beam_anc=None):
        ctx = self._ctx(ctx)
        dec_out, new_cache = self.model.decode(
            decoder_input_ids, None, joint_mask, ctx, cross_kvs=cross_kvs,
            cache=cache, decode_pos=decode_pos, beam_anc=beam_anc,
            deterministic=True)
        return self._logits(dec_out)[:, -1, :], new_cache

    def decode_step_topk(self, decoder_input_ids, joint_mask, cross_kvs, cache,
                         decode_pos, k: int, ctx: PetContext = None,
                         beam_anc=None):
        """See VLBart.decode_step_topk."""
        ctx = self._ctx(ctx)
        dec_out, new_cache = self.model.decode(
            decoder_input_ids, None, joint_mask, ctx, cross_kvs=cross_kvs,
            cache=cache, decode_pos=decode_pos, beam_anc=beam_anc,
            deterministic=True)
        x = dec_out[:, -1, :]
        logits = self._logits(x[:, None], pad_vocab_to=padded_vocab_for_topk(
            self.model.shared.shape[0], k))[:, -1]
        vals, toks, lse = topk_lse(logits, k)
        return vals, toks, lse, new_cache

    def decode_train(self, decoder_input_ids, encoder_hidden_states, joint_mask,
                     ctx: PetContext = None, deterministic: bool = True):
        ctx = self._ctx(ctx)
        dec_out, _ = self.model.decode(decoder_input_ids, encoder_hidden_states,
                                       joint_mask, ctx,
                                       deterministic=deterministic)
        return self._logits(dec_out)
