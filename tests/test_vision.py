"""CLIP visual encoders: shapes, adapters, pos-embed resize."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlpet_tpu.vision.clip import (
    CLIPVisualEncoder,
    VisualAdapter,
    resize_pos_embed,
)


def test_resnet_encoder_shapes():
    enc = CLIPVisualEncoder(backbone="RN50", image_size=64)
    x = jnp.ones((2, 64, 64, 3))
    vars_ = enc.init(jax.random.PRNGKey(0), x)
    grid, pooled = enc.apply(vars_, x)
    # 64/32 = 2 → 4 grid tokens, dim = width*32 = 2048
    assert grid.shape == (2, 4, 2048)
    assert pooled.shape == (2, 1, 1024)


def test_resnet_with_vis_adapter_params():
    enc = CLIPVisualEncoder(backbone="RN50", image_size=64,
                            adapter_type="middle-bottleneck",
                            reduction_factor=2)
    x = jnp.ones((1, 64, 64, 3))
    vars_ = enc.init(jax.random.PRNGKey(0), x)
    paths = ["/".join(str(getattr(k, "key", k)) for k in p)
             for p, _ in jax.tree_util.tree_flatten_with_path(vars_["params"])[0]]
    assert any("middle_adapter" in p for p in paths)
    grid, pooled = enc.apply(vars_, x)
    assert np.isfinite(np.asarray(grid)).all()


def test_vit_encoder_shapes():
    enc = CLIPVisualEncoder(backbone="ViT-B/32", image_size=64)
    x = jnp.ones((2, 64, 64, 3))
    vars_ = enc.init(jax.random.PRNGKey(0), x)
    grid, pooled = enc.apply(vars_, x)
    assert grid.shape == (2, 4, 768)
    assert pooled.shape == (2, 1, 768)


def test_pos_embed_resize_keeps_cls():
    pos = jnp.arange((7 * 7 + 1) * 4, dtype=jnp.float32).reshape(50, 4)
    new = resize_pos_embed(pos, 5 * 5 + 1)
    assert new.shape == (26, 4)
    np.testing.assert_array_equal(np.asarray(new[0]), np.asarray(pos[0]))


def test_visual_adapter_kinds():
    for kind in ("bottleneck", "basic"):
        m = VisualAdapter(16, 32, kind, reduction_factor=4)
        x = jnp.ones((1, 4, 4, 16))
        vars_ = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(vars_, x)
        assert out.shape == (1, 4, 4, 32)


def test_raw_input_wrapper_end_to_end():
    """Raw images → CLIP trunk → joint encoder → loss, in one module."""
    import dataclasses
    from vlpet_tpu.config import BartConfig, PetConfig, VLModelConfig, VisConfig
    from vlpet_tpu.vision.vis_encoder import RawInputVLModel
    from vlpet_tpu.pet.modules import PetContext
    from vlpet_tpu.train.freezing import trainable_mask, flatten_with_paths

    cfg = VLModelConfig(
        backbone=BartConfig(vocab_size=64, d_model=32, encoder_layers=1,
                            decoder_layers=1, encoder_attention_heads=4,
                            decoder_attention_heads=4, encoder_ffn_dim=64,
                            decoder_ffn_dim=64, max_position_embeddings=64,
                            dropout=0.0),
        vis=VisConfig(feat_dim=2048, n_boxes=4),
        pet=PetConfig(use_vis_adapter=True, unfreeze_vis_encoder=False))
    m = RawInputVLModel(cfg, vis_backbone="RN50", image_size=64,
                        vis_adapter_type="middle-bottleneck",
                        vis_reduction_factor=2)
    kw = dict(input_ids=jnp.ones((2, 4), jnp.int32),
              attention_mask=jnp.ones((2, 4), jnp.int32),
              images=jnp.ones((2, 64, 64, 3)),
              labels=jnp.ones((2, 3), jnp.int32))
    variables = m.init(jax.random.PRNGKey(0), **kw, ctx=PetContext())
    out = m.apply(variables, **kw, ctx=PetContext())
    assert np.isfinite(np.asarray(out["loss"])).all()
    # the conv VisualAdapters are trainable under --use_vis_adapter
    mask = trainable_mask(variables["params"], cfg.pet)
    names = [n for n, v in flatten_with_paths(mask)
             if v and "vis_encoder" in n]
    assert names and all("adapter" in n for n in names)
