"""Torch-oracle parity for the non-VL-PET PET families (judge r4 #2).

The VL-PET hook surface has whole-model oracle parity
(test_reference_parity.py); these tests close the remaining families whose
math had never been compared against the reference's own execution:

* PHMLinear / Compacter (reference: src/adapters/hypercomplex/layers.py:36-180)
  vs the einsum-Kronecker rewrite (vlpet_tpu/pet/modules.py PHMDense) —
  all four (factorized_phm × factorized_phm_rule) combinations, plus the
  composed HyperComplexAdapter (down→gelu_new→up).
* Hyperformer weight generation + application for BOTH controllers
  (reference: src/adapters/adapter_hypernetwork.py:54-260) incl. the
  conditional-LN hypernets (pre/post) and the embedding LayerNorm.
* InputPrompts reparameterization (reference: src/prompt/prompt_modeling.py).
* LoRALinearController task-routed forward (reference: src/lora/controller.py:56).

No reference code is vendored — it is executed read-only as a test oracle
(same harness pattern as test_reference_parity.py).
"""

import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/src"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")

import jax
import jax.numpy as jnp

from vlpet_tpu.config import AdapterSpec, HyperformerSpec, LoraSpec, PromptSpec


@pytest.fixture(scope="module")
def ref_path():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    return REF


def _t(x):
    return np.asarray(x.detach().numpy())


def _randomize(module, std=0.5, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * std)


# ---------------------------------------------------------------------------
# PHM / Compacter
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("factorized_phm", [False, True])
@pytest.mark.parametrize("factorized_phm_rule", [False, True])
def test_phm_linear_parity(ref_path, factorized_phm, factorized_phm_rule):
    """PHMLinear forward on identical weights — the Kronecker-sum matvec
    (layers.py:11-33) vs the einsum contraction that never materializes H."""
    from adapters.hypercomplex.layers import PHMLinear

    from vlpet_tpu.pet.modules import PHMDense

    in_f, out_f, pd, rank = 16, 24, 4, 2
    torch.manual_seed(0)
    ref = PHMLinear(in_f, out_f, pd, w_init="glorot-uniform", c_init="normal",
                    factorized_phm=factorized_phm,
                    factorized_phm_rule=factorized_phm_rule, phm_rank=rank)
    _randomize(ref)

    x = torch.randn(3, 5, in_f, generator=torch.Generator().manual_seed(7))
    with torch.no_grad():
        want = _t(ref(x))

    spec = AdapterSpec(hypercomplex_division=pd, phm_rank=rank,
                       factorized_phm=factorized_phm,
                       factorized_phm_rule=factorized_phm_rule,
                       shared_phm_rule=False, phm_c_init="normal")
    mod = PHMDense(in_f, out_f, spec)
    params = dict(mod.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 1, in_f)))["params"])
    if factorized_phm:
        params["W_left"] = jnp.asarray(_t(ref.W_left))
        params["W_right"] = jnp.asarray(_t(ref.W_right))
    else:
        params["W"] = jnp.asarray(_t(ref.W))
    if factorized_phm_rule:
        params["phm_rule_left"] = jnp.asarray(_t(ref.phm_rule_left))
        params["phm_rule_right"] = jnp.asarray(_t(ref.phm_rule_right))
    else:
        params["phm_rule"] = jnp.asarray(_t(ref.phm_rule))
    params["b"] = jnp.asarray(_t(ref.b))

    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def _phm_copy(tref, p):
    """Copy one reference PHMLinear's tensors into a PHMDense param dict."""
    if tref.factorized_phm:
        p["W_left"] = jnp.asarray(_t(tref.W_left))
        p["W_right"] = jnp.asarray(_t(tref.W_right))
    else:
        p["W"] = jnp.asarray(_t(tref.W))
    if tref.factorized_phm_rule:
        p["phm_rule_left"] = jnp.asarray(_t(tref.phm_rule_left))
        p["phm_rule_right"] = jnp.asarray(_t(tref.phm_rule_right))
    else:
        p["phm_rule"] = jnp.asarray(_t(tref.phm_rule))
    p["b"] = jnp.asarray(_t(tref.b))


def test_hypercomplex_adapter_parity(ref_path):
    """Composed Compacter adapter (PHM down → gelu_new → PHM up) vs the
    reference HyperComplexAdapter (adapter_modeling.py:88-139)."""
    from adapters.adapter_modeling import HyperComplexAdapter as RefHC

    from vlpet_tpu.pet.modules import HyperComplexAdapter

    d, down, pd = 16, 8, 4
    cfg = SimpleNamespace(
        input_dim=d, use_adapter_down_dim=True, adapter_down_dim=down,
        non_linearity="gelu_new", phm_c_init="normal",
        hypercomplex_division=pd, learn_phm=True,
        hypercomplex_nonlinearity="glorot-uniform", shared_phm_rule=False,
        factorized_phm=True, shared_W_phm=False, factorized_phm_rule=False,
        phm_rank=2, phm_init_range=0.01, kronecker_prod=False, track_z=False)
    torch.manual_seed(0)
    ref = RefHC(cfg)
    _randomize(ref, seed=1)

    x = torch.randn(2, 6, d, generator=torch.Generator().manual_seed(9))
    with torch.no_grad():
        want = _t(ref(x))

    spec = AdapterSpec(d_model=d, use_adapter_down_dim=True,
                       adapter_down_dim=down, hypercomplex_division=pd,
                       phm_rank=2, factorized_phm=True,
                       factorized_phm_rule=False, shared_phm_rule=False,
                       phm_c_init="normal", tasks=("vqa",),
                       use_single_adapter=True, kind="compacter")
    mod = HyperComplexAdapter(spec)
    params = jax.tree_util.tree_map(
        np.asarray,
        dict(mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, d)))["params"]))
    _phm_copy(ref.down_sampler, params["down_sampler"])
    _phm_copy(ref.up_sampler, params["up_sampler"])
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


# ---------------------------------------------------------------------------
# Hyperformer
# ---------------------------------------------------------------------------

TED, PROJ, THID, D, RF = 8, 12, 16, 16, 4


def _hyper_cfg(ref_path):
    from adapters import MetaAdapterConfig

    cfg = MetaAdapterConfig()
    cfg.task_embedding_dim = TED
    cfg.projected_task_embedding_dim = PROJ
    cfg.task_hidden_dim = THID
    cfg.hidden_dim = THID
    cfg.input_dim = D
    cfg.reduction_factor = RF
    cfg.non_linearity = "gelu_new"
    cfg.unique_hyper_net_layer_norm = True
    cfg.train_task_embeddings = False
    cfg.add_layer_norm_before_adapter = True
    cfg.add_layer_norm_after_adapter = True
    cfg.track_z = False
    cfg.tasks = ["vqa"]
    return cfg


def _my_hyper_spec():
    return HyperformerSpec(task_embedding_dim=TED,
                           projected_task_embedding_dim=PROJ,
                           hidden_dim=THID, unique_hyper_net_layer_norm=True,
                           train_task_embeddings=False)


def _copy_gen(tgen, p):
    """AdapterLayersHyperNet → AdapterWeightGenerator params
    (weight_generator/bias_generator are 1-layer Sequentials)."""
    p["weight_generator"]["kernel"] = jnp.asarray(
        _t(tgen.weight_generator[0].weight).T)
    p["weight_generator"]["bias"] = jnp.asarray(_t(tgen.weight_generator[0].bias))
    p["bias_generator"]["kernel"] = jnp.asarray(
        _t(tgen.bias_generator[0].weight).T)
    p["bias_generator"]["bias"] = jnp.asarray(_t(tgen.bias_generator[0].bias))


def _copy_ln_gen(tgen, p):
    """LayerNormHyperNet → my LayerNormHyperNet (plain Linears)."""
    p["weight_generator"]["kernel"] = jnp.asarray(_t(tgen.weight_generator.weight).T)
    p["weight_generator"]["bias"] = jnp.asarray(_t(tgen.weight_generator.bias))
    p["bias_generator"]["kernel"] = jnp.asarray(_t(tgen.bias_generator.weight).T)
    p["bias_generator"]["bias"] = jnp.asarray(_t(tgen.bias_generator.bias))


def _copy_task_hypernet(tnet, p):
    p["fc1"]["kernel"] = jnp.asarray(_t(tnet.task_embeding_generator[0].weight).T)
    p["fc1"]["bias"] = jnp.asarray(_t(tnet.task_embeding_generator[0].bias))
    p["fc2"]["kernel"] = jnp.asarray(_t(tnet.task_embeding_generator[2].weight).T)
    p["fc2"]["bias"] = jnp.asarray(_t(tnet.task_embeding_generator[2].bias))


def _assert_block_equal(got, tblock, *, rtol=2e-5, atol=2e-6):
    """Compare a BlockAdapterWeights against the reference
    AdapterT5BlockOutput (F.linear weight layout on both sides)."""
    for name in ("feed_forward", "self_attention", "cross_attention"):
        g, t = getattr(got, name), getattr(tblock, name)
        if t is None:
            assert g is None
            continue
        for part in ("up", "down"):
            np.testing.assert_allclose(
                np.asarray(getattr(g, part).weight),
                _t(getattr(t, part).weight), rtol=rtol, atol=atol,
                err_msg=f"{name}.{part}.weight")
            np.testing.assert_allclose(
                np.asarray(getattr(g, part).bias),
                _t(getattr(t, part).bias), rtol=rtol, atol=atol,
                err_msg=f"{name}.{part}.bias")
        for norm in ("pre_norm", "post_norm"):
            np.testing.assert_allclose(
                np.asarray(getattr(g, norm).weight),
                _t(getattr(t, norm).weight), rtol=rtol, atol=atol,
                err_msg=f"{name}.{norm}.weight")
            np.testing.assert_allclose(
                np.asarray(getattr(g, norm).bias),
                _t(getattr(t, norm).bias), rtol=rtol, atol=atol,
                err_msg=f"{name}.{norm}.bias")


def _apply_both(tcfg, tblock, got_block):
    """Apply generated weights through both MetaLayersAdapterControllers."""
    from adapters.adapter_controller import MetaLayersAdapterController as RefMeta

    from vlpet_tpu.pet.hypernet import MetaLayersAdapterController

    tmeta = RefMeta(tcfg)
    meta = MetaLayersAdapterController(
        non_linearity="gelu_new", d_model=D,
        add_layer_norm_before_adapter=True, add_layer_norm_after_adapter=True)
    x = torch.randn(2, 5, D, generator=torch.Generator().manual_seed(3))
    for name in ("feed_forward", "self_attention", "cross_attention"):
        with torch.no_grad():
            want = _t(tmeta(x, getattr(tblock, name)))
        got = np.asarray(meta.apply({}, jnp.asarray(x.numpy()),
                                    getattr(got_block, name)))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5,
                                   err_msg=name)


def test_hyperformer_unique_parity(ref_path):
    """unique_hyper_net: per-layer generated adapter + conditional-LN weights
    and their application match the reference controller exactly."""
    from adapters.adapter_hypernetwork import (
        AdapterLayersHyperNetController as RefCtrl)

    from vlpet_tpu.pet.hypernet import AdapterLayersHyperNetController

    tcfg = _hyper_cfg(ref_path)
    torch.manual_seed(0)
    tctrl = RefCtrl(tcfg, num_layers=3, include_cross_attention=True)
    _randomize(tctrl, std=0.2, seed=2)
    temb = torch.randn(TED, generator=torch.Generator().manual_seed(5))
    with torch.no_grad():
        tblock = tctrl(temb, 2)

    ctrl = AdapterLayersHyperNetController(
        _my_hyper_spec(), d_model=D, reduction_factor=RF, num_layers=3,
        include_cross_attention=True, add_layer_norm_before_adapter=True,
        add_layer_norm_after_adapter=True)
    params = jax.tree_util.tree_map(
        np.asarray,
        jax.tree_util.tree_map(
            lambda x: x,
            dict(ctrl.init(jax.random.PRNGKey(0), jnp.zeros(TED), 0)["params"])))
    params["layer_id_embeddings"] = jnp.asarray(_t(tctrl.layer_id_embeddings.weight))
    _copy_task_hypernet(tctrl.task_hypernet, params["task_hypernet"])
    params["LayerNorm"]["scale"] = jnp.asarray(_t(tctrl.LayerNorm.weight))
    params["LayerNorm"]["bias"] = jnp.asarray(_t(tctrl.LayerNorm.bias))
    for prefix in ("feed_forward", "self_attention", "cross_attention"):
        _copy_gen(getattr(tctrl, f"{prefix}_up_sampler_hyper_net"),
                  params[f"{prefix}_up_sampler_hyper_net"])
        _copy_gen(getattr(tctrl, f"{prefix}_down_sampler_hyper_net"),
                  params[f"{prefix}_down_sampler_hyper_net"])
        _copy_ln_gen(getattr(tctrl, f"{prefix}_pre_layernorm_hypernet"),
                     params[f"{prefix}_pre_layernorm_hypernet"])
        _copy_ln_gen(getattr(tctrl, f"{prefix}_post_layernorm_hypernet"),
                     params[f"{prefix}_post_layernorm_hypernet"])

    got_block = ctrl.apply({"params": params}, jnp.asarray(temb.numpy()), 2)
    _assert_block_equal(got_block, tblock)
    _apply_both(tcfg, tblock, got_block)


def test_hyperformer_efficient_parity(ref_path):
    """efficient_unique_hyper_net: the block-type-embedding variant."""
    from adapters.adapter_hypernetwork import (
        AdapterLayersOneHyperNetController as RefCtrl)

    from vlpet_tpu.pet.hypernet import AdapterLayersOneHyperNetController

    tcfg = _hyper_cfg(ref_path)
    torch.manual_seed(0)
    tctrl = RefCtrl(tcfg, num_layers=3, include_cross_attention=True)
    _randomize(tctrl, std=0.2, seed=4)
    temb = torch.randn(TED, generator=torch.Generator().manual_seed(6))
    with torch.no_grad():
        tblock = tctrl(temb, 1)

    ctrl = AdapterLayersOneHyperNetController(
        _my_hyper_spec(), d_model=D, reduction_factor=RF, num_layers=3,
        include_cross_attention=True, add_layer_norm_before_adapter=True,
        add_layer_norm_after_adapter=True)
    params = jax.tree_util.tree_map(
        np.asarray,
        dict(ctrl.init(jax.random.PRNGKey(0), jnp.zeros(TED), 0)["params"]))
    params["layer_id_embeddings"] = jnp.asarray(_t(tctrl.layer_id_embeddings.weight))
    params["adapters_block_type"] = jnp.asarray(_t(tctrl.adapters_block_type.weight))
    _copy_task_hypernet(tctrl.task_hypernet, params["task_hypernet"])
    params["LayerNorm"]["scale"] = jnp.asarray(_t(tctrl.LayerNorm.weight))
    params["LayerNorm"]["bias"] = jnp.asarray(_t(tctrl.LayerNorm.bias))
    _copy_gen(tctrl.up_sampler_hyper_net, params["up_sampler_hyper_net"])
    _copy_gen(tctrl.down_sampler_hyper_net, params["down_sampler_hyper_net"])
    _copy_ln_gen(tctrl.pre_layernorm_hypernet, params["pre_layernorm_hypernet"])
    _copy_ln_gen(tctrl.post_layernorm_hypernet, params["post_layernorm_hypernet"])

    got_block = ctrl.apply({"params": params}, jnp.asarray(temb.numpy()), 1)
    _assert_block_equal(got_block, tblock)
    _apply_both(tcfg, tblock, got_block)


# ---------------------------------------------------------------------------
# Prompt tuning
# ---------------------------------------------------------------------------


def test_input_prompts_parity(ref_path):
    """InputPrompts: Embedding → Linear → Tanh → Linear reparameterization
    (prompt_modeling.py:4-24) on identical weights."""
    from prompt.prompt_modeling import InputPrompts as RefPrompts

    from vlpet_tpu.pet.prompts import InputPrompts

    P, d, mid = 5, 16, 12
    cfg = SimpleNamespace(prompt_len=P, input_dim=d, mid_dim=mid)
    torch.manual_seed(0)
    ref = RefPrompts(cfg)
    _randomize(ref, seed=8)
    with torch.no_grad():
        want = _t(ref.get_prompt(3, torch.device("cpu")))

    mod = InputPrompts(PromptSpec(prompt_len=P, mid_dim=mid, tasks=("vqa",)),
                       d_model=d)
    params = jax.tree_util.tree_map(
        np.asarray, dict(mod.init(jax.random.PRNGKey(0), 1)["params"]))
    params["prefix_embedding"] = jnp.asarray(_t(ref.prefix_embedding[0].weight))
    params["mlp_in"]["kernel"] = jnp.asarray(_t(ref.prefix_embedding[1].weight).T)
    params["mlp_in"]["bias"] = jnp.asarray(_t(ref.prefix_embedding[1].bias))
    params["mlp_out"]["kernel"] = jnp.asarray(_t(ref.prefix_embedding[3].weight).T)
    params["mlp_out"]["bias"] = jnp.asarray(_t(ref.prefix_embedding[3].bias))
    got = np.asarray(mod.apply({"params": params}, 3))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


# ---------------------------------------------------------------------------
# LoRA
# ---------------------------------------------------------------------------


def test_lora_controller_parity(ref_path):
    """LoRALinearController task-routed forward (controller.py:56-70):
    result = x·Wᵀ + b + x·Aᵀ·Bᵀ·(α/r), per-task A/B."""
    from lora.controller import LoRALinearController

    from vlpet_tpu.pet.modules import LoRADense

    in_f, out_f, r = 16, 24, 4
    tasks = ("vqa", "gqa")
    cfg = SimpleNamespace(tasks=list(tasks), use_single_lora=False,
                          lora_dim=r, lora_alpha=32, lora_dropout=0.0)
    torch.manual_seed(0)
    ref = LoRALinearController(in_f, out_f, config=cfg).eval()
    g = torch.Generator().manual_seed(11)
    with torch.no_grad():
        ref.weight.copy_(torch.randn(ref.weight.shape, generator=g) * 0.3)
        ref.bias.copy_(torch.randn(ref.bias.shape, generator=g) * 0.3)
        for t in tasks:
            ref.lora_As[t].copy_(
                torch.randn(ref.lora_As[t].shape, generator=g) * 0.3)
            ref.lora_Bs[t].copy_(
                torch.randn(ref.lora_Bs[t].shape, generator=g) * 0.3)

    mod = LoRADense(in_f, out_f, LoraSpec(lora_dim=r, lora_alpha=32,
                                          lora_dropout=0.0, tasks=tasks,
                                          use_single_lora=False))
    params = jax.tree_util.tree_map(
        np.asarray,
        dict(mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, in_f)))["params"]))
    params["base"]["kernel"] = jnp.asarray(_t(ref.weight).T)
    params["base"]["bias"] = jnp.asarray(_t(ref.bias))
    params["lora_A"] = jnp.stack(
        [jnp.asarray(_t(ref.lora_As[t]).T) for t in tasks])
    params["lora_B"] = jnp.stack(
        [jnp.asarray(_t(ref.lora_Bs[t]).T) for t in tasks])

    x = torch.randn(2, 5, in_f, generator=torch.Generator().manual_seed(13))
    for ti, task in enumerate(tasks):
        with torch.no_grad():
            want = _t(ref(x, task))
        got = np.asarray(mod.apply({"params": params}, jnp.asarray(x.numpy()),
                                   ti))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6,
                                   err_msg=task)
