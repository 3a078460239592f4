"""BartForSequenceClassification / BartForQuestionAnswering
(reference: my_transformers/modeling_bart.py:2651-2840 — vendored but never
instantiated upstream; implemented over the same VLBartModel core)."""

import jax
import jax.numpy as jnp
import numpy as np

from vlpet_tpu.config import BartConfig, PetConfig, VLModelConfig, VisConfig
from vlpet_tpu.models.bart_heads import (BartForQuestionAnswering,
                                         BartForSequenceClassification)
from vlpet_tpu.pet.modules import PetContext


def _cfg():
    return VLModelConfig(
        backbone=BartConfig(vocab_size=64, d_model=32, encoder_layers=2,
                            decoder_layers=2, encoder_attention_heads=4,
                            decoder_attention_heads=4, encoder_ffn_dim=64,
                            decoder_ffn_dim=64, max_position_embeddings=32,
                            dropout=0.0),
        vis=VisConfig(no_vis=True), pet=PetConfig())


def _batch(B=3, T=7):
    rng = np.random.default_rng(0)
    eos = 2
    ids = rng.integers(4, 64, (B, T)).astype(np.int32)
    ids[:, -1] = eos  # every row ends with <eos>
    ids[0, 3] = eos   # row 0 has an earlier eos too -> LAST one pools
    return jnp.asarray(ids), jnp.ones((B, T), jnp.int32)


def test_sequence_classification_pools_last_eos():
    cfg = _cfg()
    m = BartForSequenceClassification(cfg, num_labels=3)
    ids, mask = _batch()
    params = m.init(jax.random.PRNGKey(0), ids, mask, ctx=PetContext())
    out = m.apply(params, ids, mask, ctx=PetContext())
    assert out["logits"].shape == (3, 3)
    labels = jnp.asarray([0, 1, 2])
    out = m.apply(params, ids, mask, labels=labels, ctx=PetContext())
    assert np.isfinite(float(out["loss"]))
    # pooling position: changing a NON-last-eos token's logits path only
    # changes the row through attention; changing the last eos directly
    # must change the pooled logits of that row
    ids2 = np.asarray(ids).copy()
    ids2[1, 2] = 5  # row 1, non-pooled position
    out2 = m.apply(params, jnp.asarray(ids2), mask, ctx=PetContext())
    assert not np.allclose(out["logits"][1], out2["logits"][1])


def test_question_answering_span_loss():
    cfg = _cfg()
    m = BartForQuestionAnswering(cfg)
    ids, mask = _batch()
    params = m.init(jax.random.PRNGKey(0), ids, mask, ctx=PetContext())
    out = m.apply(params, ids, mask, ctx=PetContext())
    assert out["start_logits"].shape == (3, 7)
    assert out["end_logits"].shape == (3, 7)
    sp = jnp.asarray([1, 2, 3])
    ep = jnp.asarray([2, 3, 4])
    out = m.apply(params, ids, mask, start_positions=sp, end_positions=ep,
                  ctx=PetContext())
    loss = float(out["loss"])
    assert np.isfinite(loss)
    # manual CE check
    slg = np.asarray(out["start_logits"], np.float64)
    elg = np.asarray(out["end_logits"], np.float64)

    def ce(lg, pos):
        lp = lg - np.log(np.exp(lg).sum(-1, keepdims=True))
        return -np.mean([lp[i, p] for i, p in enumerate(pos)])

    want = 0.5 * (ce(slg, [1, 2, 3]) + ce(elg, [2, 3, 4]))
    np.testing.assert_allclose(loss, want, rtol=1e-4)
    # out-of-range positions are ignored (clamped to the ignore index)
    out_ign = m.apply(params, ids, mask,
                      start_positions=jnp.asarray([1, 50, 50]),
                      end_positions=jnp.asarray([2, 50, 50]),
                      ctx=PetContext())
    want_ign = 0.5 * (ce(slg[:1], [1]) + ce(elg[:1], [2]))
    np.testing.assert_allclose(float(out_ign["loss"]), want_ign, rtol=1e-4)
