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


def test_feature_extraction_tool(tmp_path):
    """images → packed features readable by PackedFeatureSource."""
    from vlpet_tpu.vision.extract import extract_features
    from vlpet_tpu.data.features import PackedFeatureSource

    rng = np.random.default_rng(0)
    images = {f"img{i}": (rng.uniform(0, 255, (80, 96, 3))).astype(np.uint8)
              for i in range(5)}
    prefix = str(tmp_path / "packed")
    extract_features(lambda i: images[i], list(images), prefix,
                     backbone="RN50", image_size=64, batch_size=2)
    src = PackedFeatureSource(prefix)
    f, b = src.get("img3")
    assert f.shape == (4, 2048)  # 64/32=2 → 4 grid tokens
    assert b.shape == (4, 4)
    assert np.isfinite(f).all()


def test_raw_end_to_end_training_step():
    """Raw path: gradients flow into the conv VisualAdapters while the CLIP
    trunk stays frozen."""
    from vlpet_tpu.config import BartConfig, PetConfig, VLModelConfig, VisConfig
    from vlpet_tpu.vision.vis_encoder import RawInputVLModel
    from vlpet_tpu.pet.modules import PetContext
    from vlpet_tpu.train.freezing import split_params, trainable_mask
    from vlpet_tpu.train.optim import build_optimizer
    from vlpet_tpu.train.steps import TrainState, make_raw_train_step

    pet = PetConfig(use_vis_adapter=True, use_adapter=True,
                    use_single_adapter=True)
    cfg = VLModelConfig(
        backbone=BartConfig(vocab_size=64, d_model=32, encoder_layers=1,
                            decoder_layers=1, encoder_attention_heads=4,
                            decoder_attention_heads=4, encoder_ffn_dim=64,
                            decoder_ffn_dim=64, max_position_embeddings=64,
                            dropout=0.0),
        vis=VisConfig(feat_dim=2048, n_boxes=4), pet=pet)
    m = RawInputVLModel(cfg, vis_backbone="RN50", image_size=64,
                        vis_adapter_type="middle-bottleneck",
                        vis_reduction_factor=2)
    rng = np.random.default_rng(0)
    batch = dict(
        input_ids=jnp.asarray(rng.integers(3, 64, (2, 4)), jnp.int32),
        attention_mask=jnp.ones((2, 4), jnp.int32),
        images=jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32),
        target_ids=jnp.asarray(rng.integers(3, 64, (2, 3)), jnp.int32),
        scores=jnp.ones((2,), jnp.float32))
    variables = m.init(jax.random.PRNGKey(0), batch["input_ids"],
                       batch["attention_mask"], batch["images"],
                       labels=batch["target_ids"], ctx=PetContext())
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    mask = trainable_mask(params, pet)
    trainable, frozen = split_params(params, mask)
    tx = build_optimizer(trainable, lr=1e-3, total_steps=5)
    state = TrainState.create(trainable, tx)
    step = make_raw_train_step(m, tx, ("vqa",))
    before = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(),
                                    state.params)
    state, metrics = step(state, frozen, batch_stats, batch,
                          jax.random.PRNGKey(1), 0)
    state, metrics = step(state, frozen, batch_stats, batch,
                          jax.random.PRNGKey(2), 0)
    assert np.isfinite(float(metrics["loss"]))
    from vlpet_tpu.train.freezing import flatten_with_paths
    moved = {n: not np.allclose(a, np.asarray(b))
             for (n, a), (_, b) in zip(flatten_with_paths(before),
                                       flatten_with_paths(state.params))}
    assert any(v for n, v in moved.items() if "vis_encoder" in n), \
        "vis adapters did not receive gradients"


class TestClipBPETokenizer:
    """Pure-Python CLIP byte-level BPE (vision/clip_tokenizer.py) against a
    tiny merges fixture (reference spec: src/clip/simple_tokenizer.py)."""

    def _tok(self, tmp_path):
        from vlpet_tpu.vision.clip_tokenizer import ClipBPETokenizer

        merges = tmp_path / "merges.txt"
        merges.write_text("#version: fixture\nc a\nca t</w>\nd o\ndo g</w>\n")
        return ClipBPETokenizer(str(merges))

    def test_merge_and_roundtrip(self, tmp_path):
        tok = self._tok(tmp_path)
        ids = tok.encode("Cat  DOG")  # cleaning lowercases + squeezes space
        assert ids == [tok.encoder["cat</w>"], tok.encoder["dog</w>"]]
        assert tok.decode(ids) == "cat dog"

    def test_unmerged_fallback_to_bytes(self, tmp_path):
        tok = self._tok(tmp_path)
        ids = tok.encode("ox")
        assert ids == [tok.encoder["o"], tok.encoder["x</w>"]]
        assert tok.decode(ids) == "ox"

    def test_vocab_layout(self, tmp_path):
        tok = self._tok(tmp_path)
        # 256 bytes + 256 byte</w> + 4 merges + 2 specials
        assert tok.vocab_size == 256 + 256 + 4 + 2
        assert tok.eot_id == tok.vocab_size - 1
        assert tok.sot_id == tok.vocab_size - 2

    def test_tokenize_context_padding(self, tmp_path):
        import numpy as np
        import pytest

        tok = self._tok(tmp_path)
        arr = tok(["cat dog"], context_length=8)
        assert arr.shape == (1, 8)
        assert arr[0, 0] == tok.sot_id and arr[0, 3] == tok.eot_id
        assert (arr[0, 4:] == 0).all()
        with pytest.raises(RuntimeError):
            tok(["cat " * 20], context_length=8)
        t = tok(["cat " * 20], context_length=8, truncate=True)
        assert t[0, -1] == tok.eot_id
