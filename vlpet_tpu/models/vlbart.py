"""VLBart: vision-augmented BART seq2seq with PET.

Reference: src/modeling_bart.py:1296-1681 (VLBartModel/VLBart) — joint
encoder, decoder with [text; vis] cross-attention mask, tied lm_head +
final_logits_bias, per-token (reduction='none') or reduced CE with -100
masking, optional lm-head output adapter, shared Compacter PHM rule.

Generation here is staged for XLA: ``encode`` runs once, ``init_decode``
precomputes per-layer cross-attention K/V (VPA included, matching the
reference's first-step caching, my_transformers/modeling_bart.py:419-422),
and ``decode_step`` is the per-token jittable body driven by
vlpet_tpu.models.generate.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vlpet_tpu.config import VLModelConfig
from vlpet_tpu.models.bart import BartDecoder, JointEncoder, expand_mask
from vlpet_tpu.models.generate import padded_vocab_for_topk, topk_lse
from vlpet_tpu.pet.hypernet import TaskEmbeddingController
from vlpet_tpu.pet.modules import (OutputParallelAdapterLayer, PetContext,
                                   make_shared_phm_W, normal_init)
from vlpet_tpu.config import HyperformerSpec

Array = jax.Array


def shift_tokens_right(labels: Array, pad_token_id: int,
                       decoder_start_token_id: int) -> Array:
    """Reference: my_transformers/modeling_bart.py:77-88 — shift right, put
    decoder_start first, replace -100 with pad."""
    shifted = jnp.roll(labels, 1, axis=-1)
    shifted = shifted.at[:, 0].set(decoder_start_token_id)
    return jnp.where(shifted == -100, pad_token_id, shifted)


class VLBartModel(nn.Module):
    """Encoder-decoder glue (reference: src/modeling_bart.py:1296-1455)."""

    cfg: VLModelConfig

    def setup(self):
        c = self.cfg
        b = c.backbone
        self.shared = self.param("shared", normal_init(b.init_std),
                                 (b.vocab_size, b.d_model))
        self.encoder = JointEncoder(c, name="encoder")
        self.decoder = BartDecoder(c, name="decoder")
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
        return self.encoder(
            input_ids, attention_mask, self.shared,
            vis_feats=vis_feats, boxes=boxes,
            img_order_ids=img_order_ids, obj_order_ids=obj_order_ids,
            vis_attention_mask=vis_attention_mask, ctx=ctx,
            task_embedding=self._task_embedding(ctx),
            deterministic=deterministic)

    def decode(self, decoder_input_ids, encoder_hidden_states, joint_mask,
               decoder_attention_mask=None, ctx: PetContext = None,
               cross_kvs=None, cache=None, decode_pos=None, beam_anc=None,
               deterministic: bool = True):
        ctx = ctx or PetContext()
        return self.decoder(
            decoder_input_ids, self.shared,
            encoder_hidden_states=encoder_hidden_states,
            encoder_attention_mask=joint_mask,
            decoder_attention_mask=decoder_attention_mask,
            ctx=ctx, task_embedding=self._task_embedding(ctx),
            cross_kvs=cross_kvs, cache=cache, decode_pos=decode_pos,
            beam_anc=beam_anc, deterministic=deterministic)

    def compute_cross_kvs(self, encoder_hidden_states, ctx: PetContext):
        return self.decoder.compute_cross_kvs(encoder_hidden_states, ctx)

    def __call__(self, input_ids, attention_mask, decoder_input_ids,
                 vis_feats=None, boxes=None, img_order_ids=None,
                 obj_order_ids=None, vis_attention_mask=None,
                 decoder_attention_mask=None, ctx: PetContext = None,
                 deterministic: bool = True):
        ctx = ctx or PetContext()
        enc_out, joint_mask = self.encode(
            input_ids, attention_mask, vis_feats, boxes, img_order_ids,
            obj_order_ids, vis_attention_mask, ctx, deterministic)
        dec_out, _ = self.decode(decoder_input_ids, enc_out, joint_mask,
                                 decoder_attention_mask, ctx,
                                 deterministic=deterministic)
        return dec_out, enc_out, joint_mask


class VLBart(nn.Module):
    """Seq2seq LM head over VLBartModel (reference: src/modeling_bart.py:1458-1681).

    lm_head is tied to the shared embedding (HF tie_word_embeddings);
    final_logits_bias is a frozen buffer-like parameter.
    """

    cfg: VLModelConfig

    def setup(self):
        c = self.cfg
        self.model = VLBartModel(c, name="model")
        self.final_logits_bias = self.param(
            "final_logits_bias", nn.initializers.zeros, (1, c.backbone.vocab_size))
        if c.pet.use_lm_head_adapter:
            self.output_adapter = OutputParallelAdapterLayer(
                c.d_model, c.backbone.vocab_size, init_std=c.backbone.init_std,
                name="output_adapter")
        else:
            self.output_adapter = None
        # classifier head: 2-layer MLP on the last decoder state, BCE over
        # topk answers (reference: vqa_model.py:156-205)
        if c.classifier:
            self.answer_head = AnswerHead(c.d_model, c.num_answers,
                                          init_std=c.backbone.init_std,
                                          name="answer_head")
        else:
            self.answer_head = None
        # shared Compacter PHM rule (reference: modeling_bart.py:1479-1520)
        if (c.pet.use_compacter and c.pet.shared_phm_rule):
            pd = c.pet.hypercomplex_division
            self.phm_rule = self.param("phm_rule",
                                       normal_init(c.pet.phm_init_range),
                                       (pd, pd, pd))
        else:
            self.phm_rule = None
        # model-shared Compacter slow weights (shared_W_phm; the reference's
        # set_W path is dead code — see config.AdapterSpec.shared_W_phm)
        if c.pet.use_compacter and c.pet.shared_W_phm:
            self.phm_W = make_shared_phm_W(self, c.pet, c.d_model)
        else:
            self.phm_W = None

    def _ctx(self, ctx: Optional[PetContext]) -> PetContext:
        ctx = ctx or PetContext()
        import dataclasses
        if self.phm_rule is not None and ctx.phm_rule is None:
            ctx = dataclasses.replace(ctx, phm_rule=self.phm_rule)
        if self.phm_W is not None and ctx.phm_W is None:
            ctx = dataclasses.replace(ctx, phm_W=self.phm_W)
        return ctx

    def _logits(self, dec_out: Array, pad_vocab_to: int = None) -> Array:
        # fp32 accumulation straight out of the MXU: avoids materializing a
        # bf16 (B, T, V) tensor plus a separate fp32 conversion pass
        w = self.model.shared.astype(dec_out.dtype)
        bias = self.final_logits_bias
        if pad_vocab_to is not None and pad_vocab_to > w.shape[0]:
            # Exact-top-k decode (generate.padded_vocab_for_topk): emit the
            # kernel's 128-aligned width straight out of the GEMM — zero
            # weight rows + _PAD bias columns make the pad columns exactly
            # _PAD, bit-identical to topk_lse_hier's own HBM pad, but the
            # weight pad is loop-invariant (hoists out of the decode
            # while_loop) where the per-step (R, V) logits pad was not.
            from vlpet_tpu.ops.topk import _PAD
            pv = pad_vocab_to - w.shape[0]
            w = jnp.pad(w, ((0, pv), (0, 0)))
            bias = jnp.pad(bias, ((0, 0), (0, pv)), constant_values=_PAD)
        logits = jnp.einsum("btd,vd->btv", dec_out, w,
                            preferred_element_type=jnp.float32)
        logits = logits + bias
        if self.output_adapter is not None:
            oa = self.output_adapter(dec_out).astype(jnp.float32)
            if oa.shape[-1] < logits.shape[-1]:  # pad cols stay ~_PAD
                oa = jnp.pad(oa, ((0, 0), (0, 0),
                                  (0, logits.shape[-1] - oa.shape[-1])))
            logits = logits + oa
        return logits

    def __call__(self, input_ids, attention_mask, vis_feats=None, boxes=None,
                 img_order_ids=None, obj_order_ids=None,
                 vis_attention_mask=None, labels=None, decoder_input_ids=None,
                 decoder_attention_mask=None, ctx: PetContext = None,
                 deterministic: bool = True, reduce_loss: bool = False,
                 output_hidden_states: bool = False) -> Dict[str, Any]:
        c = self.cfg
        ctx = self._ctx(ctx)
        if decoder_input_ids is None and labels is not None:
            decoder_input_ids = shift_tokens_right(
                labels, c.backbone.pad_token_id, c.backbone.decoder_start_token_id)
        dec_out, enc_out, joint_mask = self.model(
            input_ids, attention_mask, decoder_input_ids,
            vis_feats=vis_feats, boxes=boxes, img_order_ids=img_order_ids,
            obj_order_ids=obj_order_ids, vis_attention_mask=vis_attention_mask,
            decoder_attention_mask=decoder_attention_mask,
            ctx=ctx, deterministic=deterministic)
        logits = self._logits(dec_out)
        out = {"logits": logits, "encoder_last_hidden_state": enc_out}
        if self.answer_head is not None:
            out["answer_logits"] = self.answer_head(dec_out[:, -1])
        if output_hidden_states:
            out["decoder_last_hidden_state"] = dec_out
        if labels is not None:
            out["loss"] = self._ce(dec_out, logits, labels, reduce_loss)
        return out

    def _ce(self, dec_out: Array, logits: Array, labels: Array,
            reduce_loss: bool) -> Array:
        """CE loss; on TPU with a frozen lm head, the fused linear+CE kernel
        computes it straight from dec_out — the (B, T, V) logits are then
        dead code in the train step and never materialize (ops/fused_ce.py).
        Statically safe: freezing.py trains `shared` only under
        unfreeze_language_model / unfreeze_lm_head."""
        from vlpet_tpu.ops.fused_ce import pick_row_tile

        p = self.cfg.pet
        head_frozen = (self.output_adapter is None
                       and not p.unfreeze_lm_head
                       and not p.unfreeze_language_model)
        fused_ok = (getattr(self.cfg, "use_fused_ce", False)
                    and jax.default_backend() not in ("cpu",)
                    and head_frozen
                    and pick_row_tile(labels.size) is not None)
        B, T = labels.shape
        if fused_ok:
            from vlpet_tpu.ops.fused_ce import fused_linear_ce

            per_tok = fused_linear_ce(
                dec_out.reshape(B * T, -1), self.model.shared,
                self.final_logits_bias[0], labels.reshape(-1)).reshape(B, T)
        elif head_frozen and dec_out.dtype == jnp.bfloat16:
            # bf16-compute path: one bf16 logits materialization instead of
            # three fp32 ones (ops/ce.py; AMP-equivalent numerics). The
            # fp32 `logits` passed in are then dead code under jit in the
            # train step (only the loss is consumed) and never materialize.
            from vlpet_tpu.ops.ce import linear_ce

            per_tok = linear_ce(
                dec_out.reshape(B * T, -1), self.model.shared,
                self.final_logits_bias[0], labels.reshape(-1)).reshape(B, T)
        else:
            return cross_entropy_with_ignore(logits, labels,
                                             reduce=reduce_loss)
        if reduce_loss:
            valid = (labels != -100).sum()
            return per_tok.sum() / jnp.maximum(valid, 1)
        return per_tok

    # --- generation-facing methods (used via apply(..., method=...)) --------

    def encode(self, input_ids, attention_mask, vis_feats=None, boxes=None,
               img_order_ids=None, obj_order_ids=None, vis_attention_mask=None,
               ctx: PetContext = None):
        ctx = self._ctx(ctx)
        enc_out, joint_mask = self.model.encode(
            input_ids, attention_mask, vis_feats, boxes, img_order_ids,
            obj_order_ids, vis_attention_mask, ctx, deterministic=True)
        return enc_out, joint_mask

    def init_decode(self, encoder_hidden_states, ctx: PetContext = None):
        """Precompute cross-attention K/V for every decoder layer."""
        ctx = self._ctx(ctx)
        return self.model.compute_cross_kvs(encoder_hidden_states, ctx)

    def decode_step(self, decoder_input_ids, joint_mask, cross_kvs, cache,
                    decode_pos, ctx: PetContext = None, beam_anc=None):
        """One decode step: decoder_input_ids (B, 1) at position decode_pos.
        ``beam_anc`` (B_true, K, L_cache) enables reorder-free beam decode
        with un-expanded joint_mask/cross_kvs (see ops/decode.py).
        Returns (logits (B, vocab), new_cache)."""
        ctx = self._ctx(ctx)
        dec_out, new_cache = self.model.decode(
            decoder_input_ids, None, joint_mask, ctx=ctx,
            cross_kvs=cross_kvs, cache=cache, decode_pos=decode_pos,
            beam_anc=beam_anc, deterministic=True)
        return self._logits(dec_out)[:, -1, :], new_cache

    def decode_step_topk(self, decoder_input_ids, joint_mask, cross_kvs, cache,
                         decode_pos, k: int, ctx: PetContext = None,
                         beam_anc=None):
        """Decode step returning (top_vals (B,k) f32, top_toks (B,k) i32,
        lse (B,) f32, new_cache) — the beam/greedy scoring surface of the
        HF generation chain (per-beam top-k on raw logits + row logsumexp;
        the two-stage candidate select in generate.beam_generate is exact,
        see PERF.md)."""
        ctx = self._ctx(ctx)
        dec_out, new_cache = self.model.decode(
            decoder_input_ids, None, joint_mask, ctx=ctx,
            cross_kvs=cross_kvs, cache=cache, decode_pos=decode_pos,
            beam_anc=beam_anc, deterministic=True)
        x = dec_out[:, -1, :]
        logits = self._logits(x[:, None], pad_vocab_to=padded_vocab_for_topk(
            self.model.shared.shape[0], k))[:, -1]
        vals, toks, lse = topk_lse(logits, k)
        return vals, toks, lse, new_cache

    def decode_train(self, decoder_input_ids, encoder_hidden_states, joint_mask,
                     ctx: PetContext = None, deterministic: bool = True):
        """Full teacher-forced decode (used by NLVR scoring and prefill)."""
        ctx = self._ctx(ctx)
        dec_out, _ = self.model.decode(decoder_input_ids, encoder_hidden_states,
                                       joint_mask, ctx=ctx,
                                       deterministic=deterministic)
        return self._logits(dec_out)

    def init_decoder_prefix(self, batch_size: int):
        """Per-layer decoder self-attn KV prefixes for cache prefill."""
        return self.model.decoder.prefix_cache_init(batch_size, 0)

    def init_decoder_prompt(self, batch_size: int, ctx: PetContext = None):
        """Per-layer self-attn KV of the decoder INPUT-prompt rows (the
        reference's dry-run past_key_values, modeling_bart.py:1421-1424)
        for generation cache prefill."""
        ctx = ctx or PetContext()
        return self.model.decoder.compute_prompt_kvs(
            batch_size, ctx, self.model._task_embedding(ctx))

    def classify(self, input_ids, attention_mask, vis_feats=None, boxes=None,
                 img_order_ids=None, obj_order_ids=None, ctx: PetContext = None,
                 deterministic: bool = True):
        """Classifier-head forward: single decoder_start token, answer
        logits from the last decoder state (reference: vqa_model.py:34-56
        train / 100-125 test — both feed one start token)."""
        c = self.cfg
        ctx = self._ctx(ctx)
        B = input_ids.shape[0]
        dec = jnp.full((B, 1), c.backbone.decoder_start_token_id, jnp.int32)
        dec_out, _, _ = self.model(input_ids, attention_mask, dec,
                                   vis_feats=vis_feats, boxes=boxes,
                                   img_order_ids=img_order_ids,
                                   obj_order_ids=obj_order_ids, ctx=ctx,
                                   deterministic=deterministic)
        return self.answer_head(dec_out[:, -1])


class AnswerHead(nn.Module):
    """Linear(d→2d) → GELU → LayerNorm → Linear(2d→num_answers)
    (reference: vqa_model.py:156-162)."""

    d_model: int
    num_answers: int
    init_std: float = 0.02

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from vlpet_tpu.pet.modules import TaskDense, get_activation

        h = TaskDense(self.d_model, self.d_model * 2, init_std=self.init_std,
                      name="fc1")(x)
        h = get_activation("gelu")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="mlp_layer_norm")(h)
        return TaskDense(self.d_model * 2, self.num_answers,
                         init_std=self.init_std, name="fc2")(h)


def bce_with_logits(logits: Array, targets: Array) -> Array:
    """BCEWithLogitsLoss mean (reference: vqa_model.py:166, 205)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(targets * log_p + (1.0 - targets) * log_not_p).mean()


def cross_entropy_with_ignore(logits: Array, labels: Array,
                              reduce: bool = False) -> Array:
    """CE with ignore_index=-100 (reference: modeling_bart.py:1580-1586).

    reduce=False → per-token losses (B, T) with 0 at ignored positions
    (the reference returns flat per-token losses; task heads re-mask anyway).
    reduce=True  → mean over non-ignored tokens.
    """
    valid = labels != -100
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    if reduce:
        return nll.sum() / jnp.maximum(valid.sum(), 1)
    return nll
