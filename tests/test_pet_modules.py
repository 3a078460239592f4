"""Unit tests for the PET module library.

Strategy (SURVEY.md §4): shape tests, identity-at-init behavior, golden-value
checks of the module math against tiny hand-computed cases, and parameter
count parity with the reference formulas.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlpet_tpu.config import AdapterSpec, HyperformerSpec, LoraSpec, PromptSpec
from vlpet_tpu.pet.modules import (
    AdapterController,
    BottleneckAdapter,
    GateLargeXLowRank,
    GateMiddleXYAdd,
    GateSmallXYCat,
    HyperComplexAdapter,
    LoRADense,
    LowRankAdapter,
    MultiheadDownAdapter,
    MultiheadDownUpAdapter,
    MultiheadPairAdapter,
    MultiheadUpAdapter,
    PetContext,
    get_activation,
)
from vlpet_tpu.pet.hypernet import (
    AdapterLayersHyperNetController,
    AdapterLayersOneHyperNetController,
    MetaLayersAdapterController,
    TaskEmbeddingController,
)
from vlpet_tpu.pet.prompts import PromptController


def n_params(tree):
    return sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree))


D = 768


class TestGeluNew:
    def test_matches_torch_formula(self):
        # gelu_new(x) = 0.5 x (1 + tanh(sqrt(2/pi) (x + 0.044715 x^3)))
        x = jnp.linspace(-3, 3, 31)
        want = 0.5 * x * (1 + jnp.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x**3)))
        got = get_activation("gelu_new")(x)
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestMultiheadAdapters:
    """VL-PET multihead adapters: fused GEMM must equal the reference's
    per-head loop-and-concat (my_transformers/modeling_bart.py:1149-1185)."""

    def _ref_down_multihead(self, params, x, h, act):
        wd, bd = np.asarray(params["down_kernel"]), np.asarray(params["down_bias"])
        outs = [x @ wd[i] + bd[i] for i in range(h)]  # h x (B,L,r/h)
        z = np.concatenate(outs, axis=-1)
        z = np.asarray(act(jnp.asarray(z)))
        wu, bu = np.asarray(params["up"]["kernel"]), np.asarray(params["up"]["bias"])
        return z @ wu + bu

    def test_down_multihead_matches_per_head_reference(self):
        h, r = 4, 96
        m = MultiheadDownAdapter(d_model=D, down_dim=r, num_heads=h, init_std=0.02)
        x = np.random.default_rng(0).normal(size=(2, 5, D)).astype(np.float32)
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        got = m.apply({"params": params}, x)
        want = self._ref_down_multihead(params, x, h, get_activation("gelu_new"))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)

    def test_down_multihead_param_count(self):
        # h*(d*r/h + r/h) + r*d + d  (reference param shapes)
        h, r = 4, 96
        m = MultiheadDownAdapter(d_model=D, down_dim=r, num_heads=h, init_std=0.02)
        params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, D)))["params"]
        assert n_params(params) == h * (D * r // h + r // h) + r * D + D

    def test_up_multihead_shapes(self):
        m = MultiheadUpAdapter(d_model=D, down_dim=96, num_heads=4, init_std=0.02)
        x = jnp.ones((2, 3, D))
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        assert m.apply({"params": params}, x).shape == (2, 3, D)

    def test_down_up_multihead_shapes(self):
        m = MultiheadDownUpAdapter(d_model=D, down_dim=96, num_heads=4, init_std=0.02)
        x = jnp.ones((2, 3, D))
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        assert m.apply({"params": params}, x).shape == (2, 3, D)

    def test_pair_multihead_matches_blockdiag_reference(self):
        h, r = 4, 96
        m = MultiheadPairAdapter(d_model=D, down_dim=r, num_heads=h, init_std=0.02)
        x = np.random.default_rng(1).normal(size=(2, 3, D)).astype(np.float32)
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        got = m.apply({"params": params}, x)
        wd, bd = np.asarray(params["down_kernel"]), np.asarray(params["down_bias"])
        wu, bu = np.asarray(params["up_kernel"]), np.asarray(params["up_bias"])
        act = get_activation("gelu_new")
        outs = []
        for i in range(h):
            z = np.asarray(act(jnp.asarray(x @ wd[i] + bd[i])))
            outs.append(z @ wu[i] + bu[i])
        want = np.concatenate(outs, axis=-1)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)

    def test_zero_init_up_gives_zero_delta(self):
        """T5 recipe: multihead-up zero init → adapter is identity at start."""
        m = MultiheadDownAdapter(d_model=D, down_dim=96, num_heads=4, init_std=0.02)
        x = jnp.ones((1, 2, D))
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        params = jax.tree_util.tree_map(lambda p: p, params)
        params["up"]["kernel"] = jnp.zeros_like(params["up"]["kernel"])
        params["up"]["bias"] = jnp.zeros_like(params["up"]["bias"])
        out = m.apply({"params": params}, x)
        np.testing.assert_allclose(out, np.zeros_like(out), atol=1e-7)


class TestAdapterController:
    def test_sequential_residual(self):
        spec = AdapterSpec(d_model=D, use_adapter_down_dim=True, adapter_down_dim=96,
                           tasks=("vqa", "gqa"), use_single_adapter=True)
        ac = AdapterController(spec, init_std=0.02)
        x = jnp.ones((2, 3, D))
        ctx = PetContext(task="vqa", task_idx=0)
        params = ac.init(jax.random.PRNGKey(0), x, ctx)["params"]
        out = ac.apply({"params": params}, x, ctx)
        # out = A(x) + x → subtracting x gives the raw adapter output
        delta = out - x
        assert delta.shape == x.shape
        assert not np.allclose(np.asarray(delta), 0)

    def test_parallel_mode_adds_y(self):
        spec = AdapterSpec(d_model=D, use_adapter_down_dim=True, adapter_down_dim=96,
                           use_parallel_adapter=True)
        ac = AdapterController(spec, init_std=0.02)
        x = jnp.ones((2, 3, D))
        y = 5.0 * jnp.ones((2, 3, D))
        ctx = PetContext()
        params = ac.init(jax.random.PRNGKey(0), x, ctx, y=y)["params"]
        out_parallel = ac.apply({"params": params}, x, ctx, y=y)
        out_zero_y = ac.apply({"params": params}, x, ctx, y=jnp.zeros_like(y))
        np.testing.assert_allclose(out_parallel - out_zero_y, y, rtol=1e-6)

    def test_task_routing_distinct_params(self):
        spec = AdapterSpec(d_model=32, use_adapter_down_dim=True, adapter_down_dim=8,
                           tasks=("a", "b"), use_single_adapter=False)
        ac = AdapterController(spec, init_std=0.02)
        x = jnp.ones((1, 2, 32))
        params = ac.init(jax.random.PRNGKey(0), x, PetContext())["params"]
        out_a = ac.apply({"params": params}, x, PetContext(task="a", task_idx=0))
        out_b = ac.apply({"params": params}, x, PetContext(task="b", task_idx=1))
        assert not np.allclose(np.asarray(out_a), np.asarray(out_b))
        # param count: 2 tasks × (down + up)
        assert n_params(params) == 2 * (32 * 8 + 8 + 8 * 32 + 32)

    def test_scaling_factor(self):
        spec = AdapterSpec(d_model=32, use_adapter_down_dim=True, adapter_down_dim=8,
                           use_scaling_factor=True, scaling_factor=0.5)
        base = AdapterSpec(d_model=32, use_adapter_down_dim=True, adapter_down_dim=8)
        x = jnp.ones((1, 2, 32))
        ac1, ac2 = AdapterController(spec, init_std=0.02), AdapterController(base, init_std=0.02)
        params = ac2.init(jax.random.PRNGKey(0), x, PetContext())["params"]
        d1 = ac1.apply({"params": params}, x, PetContext()) - x
        d2 = ac2.apply({"params": params}, x, PetContext()) - x
        np.testing.assert_allclose(np.asarray(d1), 0.5 * np.asarray(d2), rtol=1e-4,
                                   atol=1e-7)


class TestCompacter:
    def test_phm_adapter_shapes_and_param_count(self):
        spec = AdapterSpec(d_model=D, kind="compacter", reduction_factor=16,
                           hypercomplex_division=4, factorized_phm=True, phm_rank=1,
                           shared_phm_rule=False)
        m = HyperComplexAdapter(spec)
        x = jnp.ones((2, 3, D))
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        out = m.apply({"params": params}, x)
        assert out.shape == x.shape
        down = D // 16
        pd, rank = 4, 1
        expected = 0
        for (i, o) in ((D, down), (down, D)):
            expected += pd * (i // pd) * rank + pd * rank * (o // pd)  # W_left/W_right
            expected += o  # bias
            expected += pd * pd * pd  # own phm_rule
        assert n_params(params) == expected

    def test_per_task_rule_and_sampler_sharing(self):
        """Multi-task compacter: per-task W AND phm_rule by default; the
        share_*_sampler / shared_phm_rule_over_tasks switches drop the task
        dim (reference: src/adapters/adapter_controller.py:69-84)."""
        import dataclasses

        tasks = ("vqa", "caption")
        spec = AdapterSpec(d_model=D, kind="compacter", reduction_factor=16,
                           hypercomplex_division=4, factorized_phm=False,
                           shared_phm_rule=False, tasks=tasks)
        m = HyperComplexAdapter(spec)
        x = jnp.ones((1, 2, D))
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        assert params["down_sampler"]["W"].shape[0] == len(tasks)
        assert params["down_sampler"]["phm_rule"].shape == (2, 4, 4, 4)
        # task routing actually selects distinct weights
        o0 = m.apply({"params": params}, x, 0)
        o1 = m.apply({"params": params}, x, 1)
        assert not np.allclose(np.asarray(o0), np.asarray(o1))

        spec2 = dataclasses.replace(spec, share_down_sampler=True,
                                    share_up_sampler=True,
                                    shared_phm_rule_over_tasks=True)
        m2 = HyperComplexAdapter(spec2)
        p2 = m2.init(jax.random.PRNGKey(0), x)["params"]
        assert p2["down_sampler"]["W"].shape == (4, D // 4, (D // 16) // 4)
        assert p2["down_sampler"]["phm_rule"].shape == (4, 4, 4)
        # fully shared → identical across task routes
        np.testing.assert_array_equal(
            np.asarray(m2.apply({"params": p2}, x, 0)),
            np.asarray(m2.apply({"params": p2}, x, 1)))

    def test_lowrank_sampler_sharing(self):
        import dataclasses

        tasks = ("vqa", "caption")
        spec = AdapterSpec(d_model=D, kind="lowrank", reduction_factor=16,
                           low_rank_rank=1, tasks=tasks)
        m = LowRankAdapter(spec)
        x = jnp.ones((1, 2, D))
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        assert params["down_sampler"]["W_left"].shape[0] == len(tasks)
        spec2 = dataclasses.replace(spec, share_down_sampler=True)
        p2 = LowRankAdapter(spec2).init(jax.random.PRNGKey(0), x)["params"]
        assert p2["down_sampler"]["W_left"].shape == (D, 1)
        assert p2["up_sampler"]["W_left"].shape[0] == len(tasks)

    def test_shared_phm_rule_via_context(self):
        spec = AdapterSpec(d_model=64, kind="compacter", reduction_factor=16,
                           hypercomplex_division=4, shared_phm_rule=True)
        m = HyperComplexAdapter(spec)
        x = jnp.ones((1, 2, 64))
        rule = 0.01 * jax.random.normal(jax.random.PRNGKey(1), (4, 4, 4))
        params = m.init(jax.random.PRNGKey(0), x, phm_rule=rule)["params"]
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        names = ["/".join(str(k) for k in path) for path, _ in flat]
        assert not any("phm_rule" in n for n in names)
        out = m.apply({"params": params}, x, phm_rule=rule)
        assert out.shape == x.shape


class TestLowRankAdapter:
    def test_shapes(self):
        spec = AdapterSpec(d_model=D, kind="lowrank", reduction_factor=16, low_rank_rank=1)
        m = LowRankAdapter(spec)
        x = jnp.ones((2, 3, D))
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        assert m.apply({"params": params}, x).shape == x.shape
        down = D // 16
        want = (D * 1 + 1 * down + down) + (down * 1 + 1 * D + D)
        assert n_params(params) == want


class TestGates:
    def test_large_x_lowrank_range_and_shape(self):
        g = GateLargeXLowRank(d_model=D, gating_down_dim=96, init_std=0.02)
        x = jnp.ones((2, 3, D))
        params = g.init(jax.random.PRNGKey(0), x)["params"]
        gate = g.apply({"params": params}, x)
        assert gate.shape == x.shape
        assert np.all(np.asarray(gate) > 0) and np.all(np.asarray(gate) < 1)

    def test_small_xy_cat_is_per_example_scalar(self):
        g = GateSmallXYCat(d_model=D, init_std=0.02)
        x = jnp.ones((2, 5, D))
        y = jnp.ones((2, 5, D)) * 2
        params = g.init(jax.random.PRNGKey(0), x, y)["params"]
        gate = g.apply({"params": params}, x, y)
        assert gate.shape == (2, 1, 1)

    def test_middle_xy_add_is_per_token_scalar(self):
        g = GateMiddleXYAdd(d_model=D, init_std=0.02)
        x = jnp.ones((2, 5, D))
        params = g.init(jax.random.PRNGKey(0), x, x)["params"]
        gate = g.apply({"params": params}, x, x)
        assert gate.shape == (2, 5, 1)

    def test_zero_up_gate_is_half(self):
        """VL-PET-large zero-init: σ(0) = 0.5 everywhere."""
        g = GateLargeXLowRank(d_model=32, gating_down_dim=8, init_std=0.02)
        x = jnp.ones((1, 2, 32))
        params = g.init(jax.random.PRNGKey(0), x)["params"]
        params["up"]["kernel"] = jnp.zeros_like(params["up"]["kernel"])
        params["up"]["bias"] = jnp.zeros_like(params["up"]["bias"])
        gate = g.apply({"params": params}, x)
        np.testing.assert_allclose(np.asarray(gate), 0.5, atol=1e-7)


class TestLoRA:
    def test_identity_at_init(self):
        """B is zero-init → LoRA delta starts at 0 (loralib semantics)."""
        spec = LoraSpec(lora_dim=4, lora_alpha=32, lora_dropout=0.0)
        m = LoRADense(in_dim=32, out_dim=32, spec=spec, init_std=0.02)
        x = jnp.ones((2, 3, 32))
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        out = m.apply({"params": params}, x)
        base = x @ params["base"]["kernel"] + params["base"]["bias"]
        np.testing.assert_allclose(np.asarray(out), np.asarray(base), rtol=1e-6)

    def test_scaling_alpha_over_r(self):
        spec = LoraSpec(lora_dim=4, lora_alpha=32, lora_dropout=0.0)
        m = LoRADense(in_dim=8, out_dim=8, spec=spec, init_std=0.02)
        x = jnp.ones((1, 2, 8))
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        params["lora_B"] = jnp.ones_like(params["lora_B"])
        out = m.apply({"params": params}, x)
        base = x @ params["base"]["kernel"] + params["base"]["bias"]
        delta = np.asarray(out - base)
        a = np.asarray(params["lora_A"])
        want = (np.asarray(x) @ a @ np.ones((4, 8))) * (32 / 4)
        np.testing.assert_allclose(delta, want, rtol=1e-5)


class TestPrompts:
    def test_shapes_and_task_routing(self):
        spec = PromptSpec(prompt_len=10, mid_dim=16, tasks=("a", "b"))
        pc = PromptController(spec, d_model=32, init_std=0.02)
        params = pc.init(jax.random.PRNGKey(0), 4, 0)["params"]
        pa = pc.apply({"params": params}, 4, 0)
        pb = pc.apply({"params": params}, 4, 1)
        assert pa.shape == (4, 10, 32)
        assert not np.allclose(np.asarray(pa), np.asarray(pb))


class TestHyperformer:
    def test_unique_hyper_net_generates_block_weights(self):
        spec = HyperformerSpec(task_embedding_dim=64, projected_task_embedding_dim=16,
                               hidden_dim=32)
        ctrl = AdapterLayersHyperNetController(spec, d_model=64, reduction_factor=16,
                                               num_layers=3)
        tec = TaskEmbeddingController(spec, tasks=("a", "b"))
        temb_params = tec.init(jax.random.PRNGKey(0), 0)["params"]
        temb = tec.apply({"params": temb_params}, 0)
        params = ctrl.init(jax.random.PRNGKey(1), temb, 0)["params"]
        block = ctrl.apply({"params": params}, temb, 2)
        assert block.feed_forward.down.weight.shape == (4, 64)  # (r, d)
        assert block.feed_forward.up.weight.shape == (64, 4)  # (d, r)
        # apply through the meta controller: residual form
        meta = MetaLayersAdapterController(d_model=64)
        x = jnp.ones((1, 2, 64))
        out = meta.apply({"params": {}}, x, block.self_attention)
        assert out.shape == x.shape

    def test_efficient_one_hyper_net(self):
        spec = HyperformerSpec(task_embedding_dim=64, projected_task_embedding_dim=16,
                               hidden_dim=32)
        ctrl = AdapterLayersOneHyperNetController(spec, d_model=64, reduction_factor=16,
                                                  num_layers=3, include_cross_attention=True)
        temb = jnp.ones((64,))
        params = ctrl.init(jax.random.PRNGKey(1), temb, 0)["params"]
        block = ctrl.apply({"params": params}, temb, 1)
        assert block.cross_attention is not None
        assert block.self_attention.down.weight.shape == (4, 64)
