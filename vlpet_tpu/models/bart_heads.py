"""BART sequence-classification and extractive-QA heads.

Reference: src/my_transformers/modeling_bart.py:1791-1812
(BartClassificationHead), :2651-2750 (BartForSequenceClassification,
last-EOS pooling), :2753-2840 (BartForQuestionAnswering, span logits with
clamped/ignored positions). The reference vendors but never instantiates
these classes; they are implemented here so the full forked-backbone
surface exists, over the same VLBartModel core (text-only use: pass no
visual inputs).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vlpet_tpu.config import VLModelConfig
from vlpet_tpu.models.vlbart import VLBartModel
from vlpet_tpu.pet.modules import PetContext, normal_init

Array = jax.Array


class BartClassificationHead(nn.Module):
    """dropout → dense → tanh → dropout → out_proj
    (reference: modeling_bart.py:1791-1812)."""

    inner_dim: int
    num_classes: int
    pooler_dropout: float = 0.0
    init_std: float = 0.02

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        drop = nn.Dropout(rate=self.pooler_dropout)
        x = drop(x, deterministic=deterministic)
        x = nn.Dense(self.inner_dim, kernel_init=normal_init(self.init_std),
                     name="dense")(x)
        x = jnp.tanh(x)
        x = drop(x, deterministic=deterministic)
        return nn.Dense(self.num_classes,
                        kernel_init=normal_init(self.init_std),
                        name="out_proj")(x)


class BartForSequenceClassification(nn.Module):
    """Pools the decoder state at the LAST <eos> of each row and classifies
    (reference: modeling_bart.py:2651-2750). ``decoder_input_ids`` defaults
    to the (shifted) input per HF semantics if not given — here the caller
    passes them explicitly, matching the reference's usage surface."""

    cfg: VLModelConfig
    num_labels: int = 3

    def setup(self):
        c = self.cfg
        self.model = VLBartModel(c, name="model")
        self.classification_head = BartClassificationHead(
            inner_dim=c.backbone.d_model, num_classes=self.num_labels,
            pooler_dropout=c.backbone.classifier_dropout
            if hasattr(c.backbone, "classifier_dropout") else 0.0,
            init_std=c.backbone.init_std, name="classification_head")

    def __call__(self, input_ids, attention_mask,
                 decoder_input_ids=None, labels: Optional[Array] = None,
                 ctx: Optional[PetContext] = None,
                 deterministic: bool = True):
        c = self.cfg
        if decoder_input_ids is None:
            decoder_input_ids = input_ids
        dec_out, _, _ = self.model(input_ids, attention_mask,
                                   decoder_input_ids, ctx=ctx,
                                   deterministic=deterministic)
        # last-EOS pooling over the sequence fed to the DECODER (the
        # classification input — equals HF's input_ids pooling whenever the
        # caller feeds the same sequence both ways, the reference's usage).
        # HF raises on rows without an eos; data-dependent raises don't
        # exist under jit, so rows with no eos pool to NaN instead of
        # silently pooling position 0 — the failure is loud downstream.
        is_eos = (decoder_input_ids == c.backbone.eos_token_id)
        T = decoder_input_ids.shape[1]
        pos = jnp.arange(T)[None, :]
        last_eos = jnp.max(jnp.where(is_eos, pos, -1), axis=1)  # (B,)
        pooled = jnp.take_along_axis(
            dec_out, last_eos[:, None, None].clip(0), axis=1)[:, 0]
        pooled = jnp.where((last_eos >= 0)[:, None], pooled,
                           jnp.float32(jnp.nan).astype(pooled.dtype))
        logits = self.classification_head(pooled, deterministic)
        out = {"logits": logits}
        if labels is not None:
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            out["loss"] = -jnp.mean(
                jnp.take_along_axis(logp, labels[:, None], axis=1))
        return out


class BartForQuestionAnswering(nn.Module):
    """Span-extraction head: start/end logits over decoder states
    (reference: modeling_bart.py:2753-2840). Positions outside [0, T] are
    clamped to the ignored index T; loss is the mean of start/end CE."""

    cfg: VLModelConfig

    def setup(self):
        self.model = VLBartModel(self.cfg, name="model")
        self.qa_outputs = nn.Dense(
            2, kernel_init=normal_init(self.cfg.backbone.init_std),
            name="qa_outputs")

    def __call__(self, input_ids, attention_mask,
                 decoder_input_ids=None,
                 start_positions: Optional[Array] = None,
                 end_positions: Optional[Array] = None,
                 ctx: Optional[PetContext] = None,
                 deterministic: bool = True):
        if decoder_input_ids is None:
            decoder_input_ids = input_ids
        dec_out, _, _ = self.model(input_ids, attention_mask,
                                   decoder_input_ids, ctx=ctx,
                                   deterministic=deterministic)
        logits = self.qa_outputs(dec_out)  # (B, T, 2)
        start_logits = logits[..., 0]
        end_logits = logits[..., 1]
        out = {"start_logits": start_logits, "end_logits": end_logits}
        if start_positions is not None and end_positions is not None:
            T = start_logits.shape[1]

            def ce(lg, pos):
                pos = jnp.clip(pos, 0, T)  # T = ignored index
                # pad logits with a column for the ignored index; rows
                # pointing at it get zero loss (CrossEntropyLoss ignore)
                lg = jnp.pad(lg.astype(jnp.float32), ((0, 0), (0, 1)))
                logp = jax.nn.log_softmax(lg[:, :T], axis=-1)
                valid = pos < T
                picked = jnp.take_along_axis(
                    logp, jnp.minimum(pos, T - 1)[:, None], axis=1)[:, 0]
                n = jnp.maximum(jnp.sum(valid), 1)
                return -jnp.sum(jnp.where(valid, picked, 0.0)) / n

            out["loss"] = 0.5 * (ce(start_logits, start_positions)
                                 + ce(end_logits, end_positions))
        return out
