"""scan_layers: lax.scan over transformer layers (stacked params).

Parity contract: a scan model fed stack_layer_params(loop_params) computes
exactly the loop model's outputs; freezing/param% are unchanged; the trainer
trains with scan on and generates through the non-scan twin.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vlpet_tpu.config import BartConfig, VisConfig, VLModelConfig, vlpet_recipe
from vlpet_tpu.models.scan_utils import stack_layer_params, unstack_layer_params
from vlpet_tpu.models.vlbart import VLBart
from vlpet_tpu.pet.modules import PetContext
from vlpet_tpu.train.freezing import trainable_mask, trainable_report

TASKS = ("vqa", "caption")


def _cfg(scan: bool) -> VLModelConfig:
    pet = vlpet_recipe("large", r=8, num_heads=4, gate_dim=8, tasks=TASKS)
    backbone = BartConfig(vocab_size=128, d_model=32, encoder_layers=3,
                          decoder_layers=2, encoder_attention_heads=4,
                          decoder_attention_heads=4, encoder_ffn_dim=64,
                          decoder_ffn_dim=64, max_position_embeddings=64)
    return VLModelConfig(backbone=backbone, vis=VisConfig(feat_dim=16, n_boxes=4),
                         pet=pet, scan_layers=scan)


def _batch(B=2):
    rng = np.random.default_rng(0)
    return dict(
        input_ids=jnp.asarray(rng.integers(3, 128, (B, 6)), jnp.int32),
        attention_mask=jnp.ones((B, 6), jnp.int32),
        vis_feats=jnp.asarray(rng.normal(size=(B, 4, 16)), jnp.float32),
        boxes=jnp.asarray(rng.uniform(size=(B, 4, 4)), jnp.float32),
        target_ids=jnp.asarray(rng.integers(3, 128, (B, 5)), jnp.int32))


def test_scan_matches_loop_and_roundtrip():
    b = _batch()
    loop = VLBart(_cfg(False))
    scan = VLBart(_cfg(True))
    p_loop = loop.init(jax.random.PRNGKey(0), b["input_ids"], b["attention_mask"],
                       vis_feats=b["vis_feats"], boxes=b["boxes"],
                       labels=b["target_ids"], ctx=PetContext())["params"]
    p_scan = stack_layer_params(p_loop)
    # structure agrees with a natively-initialized scan model
    p_init = scan.init(jax.random.PRNGKey(0), b["input_ids"], b["attention_mask"],
                       vis_feats=b["vis_feats"], boxes=b["boxes"],
                       labels=b["target_ids"], ctx=PetContext())["params"]
    assert (jax.tree_util.tree_structure(p_scan)
            == jax.tree_util.tree_structure(p_init))
    for a, c in zip(jax.tree_util.tree_leaves(p_scan),
                    jax.tree_util.tree_leaves(p_init)):
        assert a.shape == c.shape

    def run(m, p):
        out = m.apply({"params": p}, b["input_ids"], b["attention_mask"],
                      vis_feats=b["vis_feats"], boxes=b["boxes"],
                      labels=b["target_ids"], ctx=PetContext(task="vqa"),
                      deterministic=True)
        return out["loss"], out["logits"]

    l0, g0 = run(loop, p_loop)
    l1, g1 = run(scan, p_scan)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), rtol=2e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=2e-4,
                               atol=2e-5)
    # round trip back to per-layer layout
    back = unstack_layer_params(p_scan)
    for a, c in zip(jax.tree_util.tree_leaves(back),
                    jax.tree_util.tree_leaves(p_loop)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_scan_freezing_parity():
    b = _batch()
    loop = VLBart(_cfg(False))
    p_loop = loop.init(jax.random.PRNGKey(0), b["input_ids"], b["attention_mask"],
                       vis_feats=b["vis_feats"], boxes=b["boxes"],
                       labels=b["target_ids"], ctx=PetContext())["params"]
    pet = _cfg(False).pet
    r_loop = trainable_report(p_loop, trainable_mask(p_loop, pet))
    p_scan = stack_layer_params(p_loop)
    r_scan = trainable_report(p_scan, trainable_mask(p_scan, pet))
    assert r_loop["trainable"] == r_scan["trainable"]
    assert r_loop["total"] == r_scan["total"]


def test_trainer_trains_and_generates_with_scan(tmp_path):
    from vlpet_tpu.data.datasets import (DatasetConfig, Loader, TaskDataset,
                                         synthetic_task_data)
    from vlpet_tpu.data.tokenization import WhitespaceTokenizer
    from vlpet_tpu.train.trainer import Trainer

    tok = WhitespaceTokenizer(vocab_size=128)
    cfg = _cfg(True)
    trainer = Trainer(cfg, TASKS, lr=1e-3, total_steps=10, tokenizer=tok,
                      verbose=False)
    loaders = []
    for task in TASKS:
        examples, source = synthetic_task_data(task, 8, n_boxes=4, feat_dim=16)
        ds = TaskDataset(DatasetConfig(task=task, max_text_length=6,
                                       gen_max_length=5, n_boxes=4, feat_dim=16),
                         examples, source, tok)
        loaders.append(Loader(ds, 4))
    for loader in loaders:
        batch = next(iter(loader))
        m = trainer.do_train_step(batch)
        assert np.isfinite(float(m["loss"]))
    res = trainer.predict(loaders[1], num_beams=2, max_length=5)
    assert len(res["predictions"]) > 0
