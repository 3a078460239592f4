"""Per-layer rematerialization (cfg.remat): loss/grad parity with the
no-remat step, and the generation path through the remat'd decoder.

The remat modes trade HBM saved-activation traffic for recompute on TPU
(PERF.md); numerically they must be exactly the no-remat program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlpet_tpu.config import BartConfig, VisConfig, VLModelConfig, vlpet_recipe
from vlpet_tpu.models.generate import seq2seq_generate
from vlpet_tpu.models.vlbart import VLBart
from vlpet_tpu.pet.modules import PetContext

TASKS = ("vqa", "caption")


def _cfg(remat: str) -> VLModelConfig:
    pet = vlpet_recipe("large", r=8, num_heads=4, gate_dim=8, tasks=TASKS)
    backbone = BartConfig(vocab_size=128, d_model=32, encoder_layers=2,
                          decoder_layers=2, encoder_attention_heads=4,
                          decoder_attention_heads=4, encoder_ffn_dim=64,
                          decoder_ffn_dim=64, max_position_embeddings=64)
    return VLModelConfig(backbone=backbone, vis=VisConfig(feat_dim=16, n_boxes=4),
                         pet=pet, remat=remat)


def _batch(B=2):
    rng = np.random.default_rng(0)
    return dict(
        input_ids=jnp.asarray(rng.integers(3, 128, (B, 6)), jnp.int32),
        attention_mask=jnp.ones((B, 6), jnp.int32),
        vis_feats=jnp.asarray(rng.normal(size=(B, 4, 16)), jnp.float32),
        boxes=jnp.asarray(rng.uniform(size=(B, 4, 4)), jnp.float32),
        target_ids=jnp.asarray(rng.integers(3, 128, (B, 5)), jnp.int32))


def _loss_and_gradnorm(remat: str):
    cfg = _cfg(remat)
    m = VLBart(cfg)
    b = _batch()
    params = m.init(jax.random.PRNGKey(0), b["input_ids"], b["attention_mask"],
                    vis_feats=b["vis_feats"], boxes=b["boxes"],
                    labels=b["target_ids"], ctx=PetContext())["params"]

    def loss_fn(p):
        out = m.apply({"params": p}, b["input_ids"], b["attention_mask"],
                      vis_feats=b["vis_feats"], boxes=b["boxes"],
                      labels=b["target_ids"], ctx=PetContext(),
                      deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
        return out["loss"].mean()

    loss, grads = jax.value_and_grad(loss_fn)(params)
    gn = jax.tree_util.tree_reduce(lambda a, g: a + jnp.sum(jnp.abs(g)), grads, 0.0)
    return float(loss), float(gn)


@pytest.mark.parametrize("mode", ["dots", "full"])
def test_remat_matches_no_remat(mode):
    ref = _loss_and_gradnorm("none")
    got = _loss_and_gradnorm(mode)
    np.testing.assert_allclose(got[0], ref[0], rtol=1e-6)
    np.testing.assert_allclose(got[1], ref[1], rtol=1e-5)


def test_generation_through_remat_decoder():
    b = _batch()
    seqs = {}
    for mode in ("none", "dots"):
        cfg = _cfg(mode)
        m = VLBart(cfg)
        params = m.init(jax.random.PRNGKey(0), b["input_ids"],
                        b["attention_mask"], vis_feats=b["vis_feats"],
                        boxes=b["boxes"], labels=b["target_ids"],
                        ctx=PetContext())["params"]
        seqs[mode] = np.asarray(seq2seq_generate(
            m, {"params": params}, input_ids=b["input_ids"],
            attention_mask=b["attention_mask"], vis_feats=b["vis_feats"],
            boxes=b["boxes"], ctx=PetContext(), max_length=5, num_beams=2))
    np.testing.assert_array_equal(seqs["none"], seqs["dots"])
