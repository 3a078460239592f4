"""Freezing-engine parity: the published Params(%) numbers.

Reference: README Params(%) column — VL-PET-small/middleX/middleY = 2.98%,
VL-PET-large = 4.16% on BART-base (BASELINE.md). The mask is computed on the
real BART-base VL model via jax.eval_shape (no weights materialized).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlpet_tpu.config import BartConfig, VLModelConfig, VisConfig, vlpet_recipe
from vlpet_tpu.models.vlbart import VLBart
from vlpet_tpu.pet.modules import PetContext
from vlpet_tpu.train.freezing import (
    trainable_mask,
    trainable_report,
    weight_initialization,
    split_params,
    merge_params,
)

TASKS = ("vqa", "gqa", "nlvr", "caption")


def bart_base_cfg(pet):
    return VLModelConfig(backbone=BartConfig(), vis=VisConfig(feat_dim=2048),
                         pet=pet)


def shapes_for(cfg):
    m = VLBart(cfg)
    B, L, V = 2, 8, 36
    kw = dict(
        input_ids=jnp.ones((B, L), jnp.int32),
        attention_mask=jnp.ones((B, L), jnp.int32),
        vis_feats=jnp.ones((B, V, cfg.vis.feat_dim)),
        boxes=jnp.zeros((B, V, 4)),
        labels=jnp.ones((B, 4), jnp.int32),
        ctx=PetContext(task="vqa", task_idx=0),
    )
    variables = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), **kw))
    return variables["params"]


@pytest.mark.parametrize("variant,expected", [
    ("small", 2.98), ("middleX", 2.98), ("middleY", 2.98), ("large", 4.16),
])
def test_published_param_percentages(variant, expected):
    pet = vlpet_recipe(variant, r=96, num_heads=4, gate_dim=96, tasks=TASKS)
    cfg = bart_base_cfg(pet)
    params = shapes_for(cfg)
    mask = trainable_mask(params, pet)
    report = trainable_report(params, mask)
    assert abs(report["percentage"] - expected) < 0.05, (
        f"{variant}: {report['percentage']:.3f}% vs published {expected}% "
        f"({report['trainable']}/{report['total']})")


def test_everything_frozen_without_flags():
    pet = vlpet_recipe("none", tasks=TASKS)
    pet = pet.__class__(**{**pet.__dict__, "freeze_vis_emb": True,
                           "use_adapter": False})
    cfg = bart_base_cfg(pet)
    params = shapes_for(cfg)
    # keep only the structure; freeze_vis_emb + no PET flags → only the VL-PET
    # modules unfrozen via remaining flags
    mask = trainable_mask(params, pet)
    rep = trainable_report(params, mask)
    # multihead adapters + VPA + encoder LNs still on (flags in recipe)
    assert rep["percentage"] < 4.16


def test_final_logits_bias_never_trainable():
    pet = vlpet_recipe("large", tasks=TASKS)
    pet = pet.__class__(**{**pet.__dict__, "unfreeze_bias": True})
    cfg = bart_base_cfg(pet)
    params = shapes_for(cfg)
    mask = trainable_mask(params, pet)
    from vlpet_tpu.train.freezing import flatten_with_paths
    for name, m in flatten_with_paths(mask):
        if "final_logits_bias" in name:
            assert not m


def test_weight_initialization_overrides():
    pet = vlpet_recipe("large", r=16, num_heads=4, gate_dim=8, t5=False)
    pet = pet.__class__(**{**pet.__dict__,
                           "use_encoder_multihead_up_zero_init": True,
                           "use_decoder_enc_vpa_up_zero_init": True,
                           "use_encoder_gating_large_x_lowrank_up_zero_init": True})
    from vlpet_tpu.config import BartConfig
    cfg = VLModelConfig(
        backbone=BartConfig(vocab_size=64, d_model=32, encoder_layers=1,
                            decoder_layers=1, encoder_attention_heads=4,
                            decoder_attention_heads=4, encoder_ffn_dim=64,
                            decoder_ffn_dim=64, max_position_embeddings=32),
        vis=VisConfig(feat_dim=16, n_boxes=4), pet=pet)
    m = VLBart(cfg)
    kw = dict(input_ids=jnp.ones((1, 4), jnp.int32),
              attention_mask=jnp.ones((1, 4), jnp.int32),
              vis_feats=jnp.ones((1, 4, 16)), boxes=jnp.zeros((1, 4, 4)),
              labels=jnp.ones((1, 3), jnp.int32))
    params = m.init(jax.random.PRNGKey(0), **kw)["params"]
    params = weight_initialization(params, pet)
    from vlpet_tpu.train.freezing import flatten_with_paths
    import re
    for name, p in flatten_with_paths(params):
        if re.search(r"adapter_multihead.*(\.up\.|up_kernel|up_bias)", name):
            assert np.allclose(np.asarray(p), 0), name
        if re.search(r"encoder_attn\.attn_value_parallel_adapter.*up_sampler", name):
            assert np.allclose(np.asarray(p), 0), name
        if re.search(r"adapter_gating_large_x.*\.up\.", name):
            assert np.allclose(np.asarray(p), 0), name
    # zero-init up → forward at init must equal frozen-backbone forward with
    # gates at 0.5 — at minimum it must run and produce finite outputs
    out = m.apply({"params": params}, **kw)
    assert np.isfinite(np.asarray(out["loss"])).all()


def test_split_merge_roundtrip():
    pet = vlpet_recipe("large", r=16, num_heads=4, gate_dim=8)
    cfg = VLModelConfig(
        backbone=BartConfig(vocab_size=64, d_model=32, encoder_layers=1,
                            decoder_layers=1, encoder_attention_heads=4,
                            decoder_attention_heads=4, encoder_ffn_dim=64,
                            decoder_ffn_dim=64, max_position_embeddings=32),
        vis=VisConfig(feat_dim=16, n_boxes=4), pet=pet)
    m = VLBart(cfg)
    kw = dict(input_ids=jnp.ones((1, 4), jnp.int32),
              attention_mask=jnp.ones((1, 4), jnp.int32),
              vis_feats=jnp.ones((1, 4, 16)), boxes=jnp.zeros((1, 4, 4)),
              labels=jnp.ones((1, 3), jnp.int32))
    params = m.init(jax.random.PRNGKey(0), **kw)["params"]
    mask = trainable_mask(params, pet)
    tr, fr = split_params(params, mask)
    merged = merge_params(tr, fr)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(merged)):
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
