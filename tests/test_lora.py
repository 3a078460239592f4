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
