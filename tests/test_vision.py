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
