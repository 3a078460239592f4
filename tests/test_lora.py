"""LoRA layer family parity (reference: src/lora/layers.py) + merge/unmerge."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlpet_tpu.pet.lora import (
    LoRAConv2d,
    LoRAEmbedding,
    LoRAMergedLinear,
    merge_lora,
    strip_lora,
    unmerge_lora,
)


class TestLoRAEmbedding:
    def test_zero_delta_at_init(self):
        """A is zeros at init (layers.py:55-60) -> output == base embedding."""
        m = LoRAEmbedding(num_embeddings=20, features=8, r=4)
        ids = jnp.asarray([[1, 2, 3], [4, 5, 6]])
        params = m.init(jax.random.PRNGKey(0), ids)["params"]
        base = np.asarray(params["embedding"])[np.asarray(ids)]
        np.testing.assert_allclose(np.asarray(m.apply({"params": params}, ids)),
                                   base, rtol=1e-6)

    def test_delta_formula(self):
        m = LoRAEmbedding(num_embeddings=20, features=8, r=4, lora_alpha=8)
        ids = jnp.asarray([[0, 7]])
        params = m.init(jax.random.PRNGKey(0), ids)["params"]
        rng = np.random.default_rng(0)
        params = dict(params)
        params["lora_A"] = jnp.asarray(rng.normal(size=(4, 20)), jnp.float32)
        out = np.asarray(m.apply({"params": params}, ids))
        a, b, e = [np.asarray(params[k]) for k in ("lora_A", "lora_B", "embedding")]
        want = e[np.asarray(ids)] + (a.T[np.asarray(ids)] @ b.T) * (8 / 4)
        np.testing.assert_allclose(out, want, rtol=1e-5)


class TestLoRAMergedLinear:
    def test_identity_at_init_and_gating(self):
        """B zeros at init -> base linear; only enabled blocks ever change
        (layers.py:208-215 zero_pad)."""
        m = LoRAMergedLinear(in_dim=16, out_dim=24, r=2, lora_alpha=4,
                             enable_lora=(True, False, True))
        x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 16)),
                        jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        base = np.asarray(x) @ np.asarray(params["kernel"]) + np.asarray(params["bias"])
        np.testing.assert_allclose(np.asarray(m.apply({"params": params}, x)),
                                   base, rtol=1e-5)
        # nonzero B: disabled middle block must stay at base
        params = dict(params)
        rng = np.random.default_rng(1)
        params["lora_B"] = jnp.asarray(rng.normal(size=(16, 2)), jnp.float32)
        out = np.asarray(m.apply({"params": params}, x))
        np.testing.assert_allclose(out[:, 8:16], base[:, 8:16], rtol=1e-5)
        assert not np.allclose(out[:, :8], base[:, :8])
        assert not np.allclose(out[:, 16:], base[:, 16:])
        # grouped-matmul formula
        a = np.asarray(params["lora_A"])   # (r*2, in)
        b = np.asarray(params["lora_B"])   # (block*2, r)
        after = np.asarray(x) @ a.T
        d0 = after[:, :2] @ b[:8].T
        d1 = after[:, 2:] @ b[8:].T
        want = base.copy()
        want[:, :8] += d0 * 2.0
        want[:, 16:] += d1 * 2.0
        np.testing.assert_allclose(out, want, rtol=1e-5)


class TestLoRAConv2d:
    def test_identity_at_init_and_delta(self):
        m = LoRAConv2d(in_channels=3, out_channels=8, kernel_size=3, r=2,
                       lora_alpha=2)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 3)),
                        jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        out0 = np.asarray(m.apply({"params": params}, x))
        base = LoRAConv2d(in_channels=3, out_channels=8, kernel_size=3, r=0)
        base_params = {"kernel": params["kernel"], "bias": params["bias"]}
        np.testing.assert_allclose(
            out0, np.asarray(base.apply({"params": base_params}, x)),
            rtol=1e-5, atol=1e-6)
        params = dict(params)
        params["lora_B"] = jnp.asarray(
            np.random.default_rng(1).normal(size=(8 * 3, 2 * 3)) * 0.1,
            jnp.float32)
        out1 = np.asarray(m.apply({"params": params}, x))
        assert not np.allclose(out1, out0)


class TestMergeUnmerge:
    def _lora_dense(self):
        from vlpet_tpu.config import LoraSpec
        from vlpet_tpu.pet.modules import LoRADense

        spec = LoraSpec(lora_dim=4, lora_alpha=8, lora_dropout=0.0,
                        use_single_lora=True, tasks=("vqa",))
        m = LoRADense(in_dim=16, out_dim=16, spec=spec)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(5, 16)),
                        jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        params = dict(params)
        params["lora_B"] = jnp.asarray(
            np.random.default_rng(1).normal(size=(4, 16)) * 0.2, jnp.float32)
        return m, params, x

    def test_merge_matches_unmerged_forward(self):
        """merged base kernel reproduces base+delta (the reference's
        eval()-time fold, layers.py:138-147); strip_lora loads into a plain
        dense."""
        from vlpet_tpu.pet.modules import TaskDense

        m, params, x = self._lora_dense()
        y = np.asarray(m.apply({"params": params}, x))
        merged = strip_lora(merge_lora(params, lora_alpha=8))
        plain = TaskDense(16, 16)
        y2 = np.asarray(plain.apply({"params": merged}, x))
        np.testing.assert_allclose(y2, y, rtol=1e-5, atol=1e-6)

    def test_unmerge_round_trip(self):
        _, params, _ = self._lora_dense()
        back = unmerge_lora(merge_lora(params, lora_alpha=8), lora_alpha=8)
        for k in ("lora_A", "lora_B"):
            np.testing.assert_allclose(np.asarray(back[k]),
                                       np.asarray(params[k]))
        np.testing.assert_allclose(np.asarray(back["base"]["kernel"]),
                                   np.asarray(params["base"]["kernel"]),
                                   rtol=1e-5, atol=1e-6)


class TestPerTaskLoRARouting:
    def test_model_routes_lora_by_task(self):
        """Per-task LoRA (reference scripts/image-text/lora.sh — no
        --use_single_lora) must route q/v deltas by the batch's task: the
        reference's LoRALinearController takes `task` at every call
        (src/lora/controller.py:56). Before r5 the model called LoRADense
        without task_idx, silently using task 0's A/B for every task."""
        import dataclasses

        import jax
        import jax.numpy as jnp
        import numpy as np

        from vlpet_tpu.config import (BartConfig, PetConfig, VLModelConfig,
                                      VisConfig)
        from vlpet_tpu.models.vlbart import VLBart
        from vlpet_tpu.pet.modules import PetContext

        tasks = ("vqa", "gqa")
        pet = PetConfig(tasks=tasks, use_lora=True, lora_dim=2,
                        lora_alpha=8.0, use_single_lora=False)
        cfg = VLModelConfig(
            backbone=BartConfig(vocab_size=60, d_model=32, encoder_layers=1,
                                decoder_layers=1, encoder_attention_heads=4,
                                decoder_attention_heads=4, encoder_ffn_dim=64,
                                decoder_ffn_dim=64,
                                max_position_embeddings=32, dropout=0.0),
            vis=VisConfig(feat_dim=16, n_boxes=4), pet=pet)
        m = VLBart(cfg)
        rng = np.random.default_rng(0)
        kw = dict(
            input_ids=jnp.asarray(rng.integers(3, 60, (2, 5)), jnp.int32),
            attention_mask=jnp.ones((2, 5), jnp.int32),
            vis_feats=jnp.asarray(rng.normal(size=(2, 4, 16)), jnp.float32),
            boxes=jnp.asarray(rng.uniform(size=(2, 4, 4)), jnp.float32),
            labels=jnp.asarray(rng.integers(3, 60, (2, 4)), jnp.int32))
        params = m.init(jax.random.PRNGKey(0), **kw,
                        ctx=PetContext())["params"]

        # lora_B inits to zeros (delta = 0 → tasks indistinguishable);
        # randomize every lora tensor so the routing is observable
        def rand_lora(path, leaf):
            name = jax.tree_util.keystr(path)
            if "lora_A" in name or "lora_B" in name:
                k = jax.random.fold_in(jax.random.PRNGKey(7), hash(name) % 2**30)
                return jax.random.normal(k, leaf.shape, leaf.dtype) * 0.3
            return leaf

        params = jax.tree_util.tree_map_with_path(rand_lora, params)
        out0 = m.apply({"params": params}, **kw,
                       ctx=PetContext(task="vqa", task_idx=0))["logits"]
        out1 = m.apply({"params": params}, **kw,
                       ctx=PetContext(task="gqa", task_idx=1))["logits"]
        assert float(jnp.abs(out0 - out1).max()) > 1e-4, \
            "per-task LoRA produced identical outputs for different tasks"

        # and the single-lora config shares one pair → identical by design
        pet_s = dataclasses.replace(pet, use_single_lora=True)
        cfg_s = dataclasses.replace(cfg, pet=pet_s)
        ms = VLBart(cfg_s)
        params_s = ms.init(jax.random.PRNGKey(0), **kw,
                           ctx=PetContext())["params"]
        params_s = jax.tree_util.tree_map_with_path(rand_lora, params_s)
        s0 = ms.apply({"params": params_s}, **kw,
                      ctx=PetContext(task="vqa", task_idx=0))["logits"]
        s1 = ms.apply({"params": params_s}, **kw,
                      ctx=PetContext(task="gqa", task_idx=1))["logits"]
        np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
