"""Core PET modules: adapters, gates, LoRA, IA3, PHM — as Flax linen modules.

Design notes (TPU-first, not a port):

* Task routing: the reference keeps one ``nn.ModuleDict`` entry per task and
  dispatches in Python (reference: src/adapters/adapter_controller.py:41-90).
  Here, per-task weights are a single stacked parameter with a leading task
  axis, indexed by a *static* ``task_idx`` — each task gets its own jit cache
  entry, the selected slice is a static gather, and the parameter count is
  identical to the reference's ModuleDict.

* Multihead adapters: the reference loops over h small ``nn.Linear``s and
  concatenates (reference: src/my_transformers/modeling_bart.py:1045-1113).
  Mathematically, h parallel down-projections d→r/h followed by concat equal
  ONE d→r matmul with a block-column weight. We store the parameter per-head
  (same shapes/init/param-count as the reference) but reshape to a single
  fused kernel at apply time so the MXU runs one large GEMM.

* All activation math runs in ``dtype`` (bf16-capable); params stay float32.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from vlpet_tpu.config import AdapterSpec, LoraSpec

Array = jax.Array
Dtype = Any


# ---------------------------------------------------------------------------
# Activations / initializers
# ---------------------------------------------------------------------------


def get_activation(name: str) -> Callable[[Array], Array]:
    """Activation registry matching HF ACT2FN semantics.

    ``gelu_new`` is the tanh approximation (torch ``gelu_new``); ``gelu`` is
    the exact erf form — both map to jax.nn.gelu with the right flag.
    """
    name = name.lower()
    if name == "gelu_new":
        from vlpet_tpu.ops.activations import gelu_new

        return gelu_new
    if name == "gelu":
        from vlpet_tpu.ops.activations import gelu_exact

        return gelu_exact
    if name == "relu":
        return jax.nn.relu
    if name in ("swish", "silu"):
        return jax.nn.silu
    if name == "tanh":
        return jnp.tanh
    if name == "sigmoid":
        return jax.nn.sigmoid
    raise ValueError(f"unknown activation: {name}")


class Activations:
    """Callable wrapper mirroring the reference's Activations helper
    (reference: src/adapters/adapter_utils.py)."""

    def __init__(self, name: str):
        self.fn = get_activation(name)

    def __call__(self, x: Array) -> Array:
        return self.fn(x)


def normal_init(std: float):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


def zeros_init():
    return nn.initializers.zeros


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)).

    ``shape`` is (..., fan_in, fan_out); leading dims are task/head axes.
    """
    fan_in = shape[-2]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def glorot_uniform_gain2(key, shape, dtype=jnp.float32):
    """xavier_uniform with gain sqrt(2) over the last two dims
    (reference: src/adapters/hypercomplex/inits.py:6-10)."""
    fan_in, fan_out = shape[-2], shape[-1]
    bound = math.sqrt(2.0) * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def glorot_normal_gain2(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[-2], shape[-1]
    std = math.sqrt(2.0) * math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def resolve_kernel_init(init_std: Optional[float]):
    """BART-fork semantics: model-wide init_weights makes every Linear
    normal(0, init_std) with zero bias (HF BartPretrainedModel._init_weights);
    T5-fork adapters keep the torch Linear default. ``init_std=None`` selects
    the torch default."""
    if init_std is None:
        return torch_linear_kernel_init
    return normal_init(init_std)


def resolve_bias_init(init_std: Optional[float], fan_in: int):
    if init_std is None:
        return torch_linear_bias_init(fan_in)
    return nn.initializers.zeros


# ---------------------------------------------------------------------------
# Pet context threaded through the backbone
# ---------------------------------------------------------------------------


@struct.dataclass
class PetContext:
    """Per-call PET state threaded through the backbone layers.

    ``task_idx``/``task`` are static (one jit specialization per task, mirroring
    the reference's per-task Python dispatch). ``phm_rule`` carries the
    model-shared Compacter rule (reference: src/modeling_bart.py:1479-1520);
    ``block_adapters`` carries hyperformer-generated weights for the current
    layer (reference: src/my_transformers/modeling_bart.py:949-951).

    Registered as a pytree (static task fields as aux data, arrays as
    children) so it flows through lifted transforms — nn.remat'd/nn.scan'd
    layers take it as a regular argument.
    """

    task: str = struct.field(pytree_node=False, default="default")
    task_idx: int = struct.field(pytree_node=False, default=0)
    phm_rule: Optional[Array] = None  # (phm_dim, phm_dim, phm_dim)
    # shared_W_phm: model-root Compacter slow weights, injected into every
    # PHMDense. {"down": W, "up": W} where W is (pd, in/pd, out/pd) or a
    # factorized (W_left, W_right) tuple. (The reference declares this mode
    # but its set_W wiring is dead code — see config.AdapterSpec.shared_W_phm.)
    phm_W: Any = None
    block_adapters: Any = None

    def for_layer(self, block_adapters) -> "PetContext":
        return dataclasses.replace(self, block_adapters=block_adapters)


# ---------------------------------------------------------------------------
# Task-stacked dense primitives
# ---------------------------------------------------------------------------


class TaskDense(nn.Module):
    """Dense layer with an optional leading task axis on its parameters.

    shared=True  -> kernel (in, out)
    shared=False -> kernel (n_tasks, in, out), statically indexed by task_idx.
    """

    in_dim: int
    out_dim: int
    n_tasks: int = 1
    shared: bool = True
    use_bias: bool = True
    init_std: Optional[float] = None
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None
    dtype: Dtype = jnp.float32

    def setup(self):
        kinit = self.kernel_init or resolve_kernel_init(self.init_std)
        binit = self.bias_init or resolve_bias_init(self.init_std, self.in_dim)
        if self.shared:
            self.kernel = self.param("kernel", kinit,
                                     (self.in_dim, self.out_dim))
            self.bias = (self.param("bias", binit, (self.out_dim,))
                         if self.use_bias else None)
        else:
            self.kernel = self.param("kernel", kinit,
                                     (self.n_tasks, self.in_dim, self.out_dim))
            self.bias = (self.param("bias", binit, (self.n_tasks, self.out_dim))
                         if self.use_bias else None)

    def kb(self, task_idx: int = 0):
        """(kernel, bias) for the (statically-indexed) task — lets callers
        fuse several projections into one GEMM (e.g. QKV, models/bart.py)."""
        if self.shared:
            return self.kernel, self.bias
        return (self.kernel[task_idx],
                self.bias[task_idx] if self.bias is not None else None)

    def __call__(self, x: Array, task_idx: int = 0) -> Array:
        kernel, bias = self.kb(task_idx)
        # flatten leading dims: a clean 2D (M, K)x(K, N) GEMM tiles far better
        # on the MXU than a batched (B, L, K) dot (measured ~5x on v5e)
        lead = x.shape[:-1]
        x2 = x.reshape(-1, self.in_dim).astype(self.dtype)
        y = jnp.dot(x2, kernel.astype(self.dtype),
                    preferred_element_type=self.dtype)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y.reshape(lead + (self.out_dim,))


class LowRankDense(nn.Module):
    """W = W_left @ W_right, rank-k (reference: src/adapters/low_rank_layer.py:7-40)."""

    in_dim: int
    out_dim: int
    rank: int = 1
    n_tasks: int = 1
    shared: bool = True
    use_bias: bool = True
    w_init: str = "glorot-uniform"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, task_idx: int = 0) -> Array:
        init = glorot_uniform_gain2 if self.w_init == "glorot-uniform" else glorot_normal_gain2
        lead = () if self.shared else (self.n_tasks,)
        w_left = self.param("W_left", init, lead + (self.in_dim, self.rank))
        w_right = self.param("W_right", init, lead + (self.rank, self.out_dim))
        bias = (self.param("b", nn.initializers.zeros, lead + (self.out_dim,))
                if self.use_bias else None)
        if not self.shared:
            w_left, w_right = w_left[task_idx], w_right[task_idx]
            bias = bias[task_idx] if bias is not None else None
        x = x.astype(self.dtype)
        # contract through the rank bottleneck: (x @ L) @ R — two thin GEMMs
        y = jnp.dot(jnp.dot(x, w_left.astype(self.dtype)), w_right.astype(self.dtype))
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class PHMDense(nn.Module):
    """Parameterized-hypercomplex (Kronecker) linear layer for Compacter.

    y = x · (Σ_r phm_rule[r] ⊗ W[r]) + b
    (reference: src/adapters/hypercomplex/layers.py:36-180, kronecker.py:22).

    Implemented as einsum contractions instead of materializing the Kronecker
    sum: with x reshaped to (..., phm_dim, in/phm_dim),
    y[..., j, o] = Σ_{r,i,k} x[..., i, k] · rule[r, i, j] · W[r, k, o].
    """

    in_dim: int
    out_dim: int
    spec: AdapterSpec
    n_tasks: int = 1
    shared: bool = True
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, task_idx: int = 0,
                 phm_rule: Optional[Array] = None,
                 W_shared: Any = None) -> Array:
        s = self.spec
        pd = s.hypercomplex_division
        assert self.in_dim % pd == 0 and self.out_dim % pd == 0
        in_per, out_per = self.in_dim // pd, self.out_dim // pd
        lead = () if self.shared else (self.n_tasks,)

        # shared_W_phm: slow weights injected from the model root — this
        # layer owns no W of its own (reference intent: config.py:35 +
        # layers.py:83-92 skip init_W when shared_W_phm)
        if W_shared is not None:
            if isinstance(W_shared, tuple):
                wl, wr = W_shared
                assert wl.shape == (pd, in_per, s.phm_rank) \
                    and wr.shape == (pd, s.phm_rank, out_per), \
                    f"shared phm W mismatch: {wl.shape}/{wr.shape} for " \
                    f"({self.in_dim},{self.out_dim}) pd={pd}"
                W = jnp.einsum("rip,rpo->rio", wl.astype(self.dtype),
                               wr.astype(self.dtype))
            else:
                assert W_shared.shape == (pd, in_per, out_per)
                W = W_shared.astype(self.dtype)
        # W (possibly factorized), glorot-uniform init (w_init default)
        elif s.factorized_phm:
            w_left = self.param("W_left", glorot_uniform_gain2,
                                lead + (pd, in_per, s.phm_rank))
            w_right = self.param("W_right", glorot_uniform_gain2,
                                 lead + (pd, s.phm_rank, out_per))
            if not self.shared:
                w_left, w_right = w_left[task_idx], w_right[task_idx]
            W = jnp.einsum("rip,rpo->rio", w_left.astype(self.dtype),
                           w_right.astype(self.dtype))
        else:
            W = self.param("W", glorot_uniform_gain2, lead + (pd, in_per, out_per))
            if not self.shared:
                W = W[task_idx]
            W = W.astype(self.dtype)

        # phm_rule: shared (passed in) or owned. Owned rules are per-task
        # unless shared_phm_rule_over_tasks aliases task 0's rule across
        # tasks (reference: src/adapters/adapter_controller.py:79-84)
        if phm_rule is None:
            rule_shared = self.shared or s.shared_phm_rule_over_tasks
            rlead = () if rule_shared else (self.n_tasks,)
            c_init = (normal_init(s.phm_init_range) if s.phm_c_init == "normal"
                      else nn.initializers.uniform(scale=0.02))
            if s.factorized_phm_rule:
                rl = self.param("phm_rule_left", c_init, rlead + (pd, pd, 1))
                rr = self.param("phm_rule_right", c_init, rlead + (pd, 1, pd))
                if not rule_shared:
                    rl, rr = rl[task_idx], rr[task_idx]
                phm_rule = jnp.einsum("rio,roj->rij", rl, rr)
            else:
                phm_rule = self.param("phm_rule", c_init, rlead + (pd, pd, pd))
                if not rule_shared:
                    phm_rule = phm_rule[task_idx]
        phm_rule = phm_rule.astype(self.dtype)

        xr = x.astype(self.dtype).reshape(x.shape[:-1] + (pd, in_per))
        # (..., i, k) x (r, k, o) -> (..., r, i, o); then contract rule over (r, i)
        t = jnp.einsum("...ik,rko->...rio", xr, W)
        y = jnp.einsum("...rio,rij->...jo", t, phm_rule)
        y = y.reshape(x.shape[:-1] + (self.out_dim,))
        if self.use_bias:
            b = self.param("b", nn.initializers.zeros, lead + (self.out_dim,))
            if not self.shared:
                b = b[task_idx]
            y = y + b.astype(self.dtype)
        return y


# ---------------------------------------------------------------------------
# Adapters
# ---------------------------------------------------------------------------


class BottleneckAdapter(nn.Module):
    """down → act → up, returns the delta (reference: src/adapters/adapter_modeling.py:36-62).

    The residual/parallel combination lives in AdapterController."""

    spec: AdapterSpec
    init_std: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, task_idx: int = 0) -> Array:
        s = self.spec
        n_tasks = len(s.tasks)
        down_shared = s.use_single_adapter or s.share_down_sampler or n_tasks == 1
        up_shared = s.use_single_adapter or s.share_up_sampler or n_tasks == 1
        z = TaskDense(s.d_model, s.down_dim, n_tasks, down_shared,
                      init_std=self.init_std, dtype=self.dtype,
                      name="down_sampler")(x, task_idx)
        z = get_activation(s.non_linearity)(z)
        if s.track_z:
            self.sow("intermediates", "z", z)
        return TaskDense(s.down_dim, s.d_model, n_tasks, up_shared,
                         init_std=self.init_std, dtype=self.dtype,
                         name="up_sampler")(z, task_idx)


class LowRankAdapter(nn.Module):
    """Rank-factorized bottleneck adapter (reference: src/adapters/adapter_modeling.py:9-33)."""

    spec: AdapterSpec
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, task_idx: int = 0) -> Array:
        s = self.spec
        n_tasks = len(s.tasks)
        # NOTE: reference LowRankAdapter always uses input_dim // reduction_factor
        down_dim = s.d_model // s.reduction_factor
        # sampler sharing applies to every adapter kind
        # (reference: src/adapters/adapter_controller.py:69-77)
        down_shared = s.use_single_adapter or s.share_down_sampler or n_tasks == 1
        up_shared = s.use_single_adapter or s.share_up_sampler or n_tasks == 1
        z = LowRankDense(s.d_model, down_dim, s.low_rank_rank, n_tasks, down_shared,
                         w_init=s.low_rank_w_init, dtype=self.dtype,
                         name="down_sampler")(x, task_idx)
        z = get_activation(s.non_linearity)(z)
        if s.track_z:
            self.sow("intermediates", "z", z)
        return LowRankDense(down_dim, s.d_model, s.low_rank_rank, n_tasks, up_shared,
                            w_init=s.low_rank_w_init, dtype=self.dtype,
                            name="up_sampler")(z, task_idx)


def make_shared_phm_W(module: nn.Module, pet, d_model: int) -> Any:
    """Create the model-root shared Compacter slow weights (shared_W_phm).

    Called from the flagship models' setup(); the returned pytree is injected
    into every PHMDense via PetContext.phm_W. One W_down (d_model→down_dim)
    and one W_up (down_dim→d_model), factorized iff pet.factorized_phm —
    the working version of the reference's dead set_W path
    (src/adapters/hypercomplex/layers.py:160, never invoked)."""
    down = (pet.adapter_down_dim if pet.use_adapter_down_dim
            else d_model // pet.reduction_factor)
    pd, rank = pet.hypercomplex_division, pet.phm_rank

    def mk(prefix: str, i: int, o: int):
        ip, op = i // pd, o // pd
        if pet.factorized_phm:
            return (module.param(f"{prefix}_left", glorot_uniform_gain2,
                                 (pd, ip, rank)),
                    module.param(f"{prefix}_right", glorot_uniform_gain2,
                                 (pd, rank, op)))
        return module.param(prefix, glorot_uniform_gain2, (pd, ip, op))

    return {"down": mk("phm_W_down", d_model, down),
            "up": mk("phm_W_up", down, d_model)}


def _phm_w_dims(W: Any, s: AdapterSpec) -> Tuple[int, int]:
    """(in_dim, out_dim) implied by a shared phm W (full or factorized)."""
    pd = s.hypercomplex_division
    if isinstance(W, tuple):
        return W[0].shape[1] * pd, W[1].shape[2] * pd
    return W.shape[1] * pd, W.shape[2] * pd


class HyperComplexAdapter(nn.Module):
    """Compacter adapter: PHM down → act → PHM up
    (reference: src/adapters/adapter_modeling.py:88-139)."""

    spec: AdapterSpec
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, task_idx: int = 0,
                 phm_rule: Optional[Array] = None,
                 phm_W: Any = None) -> Array:
        s = self.spec
        n_tasks = len(s.tasks)
        # sampler sharing applies to every adapter kind
        # (reference: src/adapters/adapter_controller.py:69-77)
        down_shared = s.use_single_adapter or s.share_down_sampler or n_tasks == 1
        up_shared = s.use_single_adapter or s.share_up_sampler or n_tasks == 1
        rule = phm_rule if s.shared_phm_rule else None
        # model-shared slow weights apply only where the sampler dims match
        # the root W (e.g. down-dim variants keep their own W)
        W_down = W_up = None
        if s.shared_W_phm and phm_W is not None:
            if _phm_w_dims(phm_W["down"], s) == (s.d_model, s.down_dim):
                W_down = phm_W["down"]
            if _phm_w_dims(phm_W["up"], s) == (s.down_dim, s.d_model):
                W_up = phm_W["up"]
        z = PHMDense(s.d_model, s.down_dim, s, n_tasks, down_shared, dtype=self.dtype,
                     name="down_sampler")(x, task_idx, phm_rule=rule,
                                          W_shared=W_down)
        z = get_activation(s.non_linearity)(z)
        if s.track_z:
            self.sow("intermediates", "z", z)
        return PHMDense(s.down_dim, s.d_model, s, n_tasks, up_shared, dtype=self.dtype,
                        name="up_sampler")(z, task_idx, phm_rule=rule,
                                           W_shared=W_up)


class AdapterController(nn.Module):
    """Task-routed adapter with sequential/parallel combination
    (reference: src/adapters/adapter_controller.py:131-163).

    sequential: out = scale·A(x) + x
    parallel:   out = scale·A(x) + y   (y = wrapped projection's output)
    """

    spec: AdapterSpec
    init_std: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Array, ctx: PetContext, y: Optional[Array] = None) -> Array:
        s = self.spec
        z = inputs
        if s.add_layer_norm_before_adapter:
            z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pre_layer_norm")(z)
        if s.kind == "compacter":
            out = HyperComplexAdapter(s, dtype=self.dtype, name="adapters")(
                z, ctx.task_idx, phm_rule=ctx.phm_rule, phm_W=ctx.phm_W)
        elif s.kind == "lowrank":
            out = LowRankAdapter(s, dtype=self.dtype, name="adapters")(z, ctx.task_idx)
        else:
            out = BottleneckAdapter(s, init_std=self.init_std, dtype=self.dtype,
                                    name="adapters")(z, ctx.task_idx)
        if s.use_scaling_factor:
            out = out * s.scaling_factor
        if s.add_layer_norm_after_adapter:
            out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="post_layer_norm")(out)
        if s.use_parallel_adapter:
            assert y is not None, "parallel adapter needs the wrapped output y"
            return out + y
        return out + inputs


class OutputParallelAdapterLayer(nn.Module):
    """lm-head adapter: d_model → d_model/16 → vocab, added to the logits
    (reference: src/adapters/adapter_controller.py:186-211, adapter_modeling.py:64-86)."""

    d_model: int
    output_dim: int
    non_linearity: str = "gelu_new"
    init_std: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        down = self.d_model // 16
        z = TaskDense(self.d_model, down, init_std=self.init_std, dtype=self.dtype,
                      name="adapter_down_sampler")(x)
        z = get_activation(self.non_linearity)(z)
        return TaskDense(down, self.output_dim, init_std=self.init_std,
                         dtype=self.dtype, name="adapter_up_sampler")(z)


# ---------------------------------------------------------------------------
# VL-PET multihead adapters (fused GEMMs)
# ---------------------------------------------------------------------------


class MultiheadDownAdapter(nn.Module):
    """h heads of d→r/h (concat) → act → single up r→d; returns the delta.

    Reference math: src/my_transformers/modeling_bart.py:1045-1056 (init),
    :1149-1157 (apply). Stored per-head (h, d, r/h); applied as one (d, r)
    GEMM — identical result, one MXU pass.
    """

    d_model: int
    down_dim: int  # r (total across heads)
    num_heads: int
    non_linearity: str = "gelu_new"
    init_std: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h, d, r = self.num_heads, self.d_model, self.down_dim
        rh = r // h
        kinit = resolve_kernel_init(self.init_std)
        binit = resolve_bias_init(self.init_std, d)
        wd = self.param("down_kernel", kinit, (h, d, rh))
        bd = self.param("down_bias", binit, (h, rh))
        # fuse: (h, d, rh) -> (d, h*rh); concat([x@W_i+b_i]) == x@W_fused+b_fused
        w_fused = jnp.transpose(wd, (1, 0, 2)).reshape(d, r).astype(self.dtype)
        b_fused = bd.reshape(r).astype(self.dtype)
        z = jnp.dot(x.astype(self.dtype), w_fused, preferred_element_type=self.dtype) + b_fused
        z = get_activation(self.non_linearity)(z)
        return TaskDense(r, d, init_std=self.init_std, dtype=self.dtype,
                         name="up")(z)


class MultiheadUpAdapter(nn.Module):
    """single down d→r → act → h heads of r→d/h (concat)
    (reference: src/my_transformers/modeling_bart.py:1058-1069, :1158-1166)."""

    d_model: int
    down_dim: int
    num_heads: int
    non_linearity: str = "gelu_new"
    init_std: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h, d, r = self.num_heads, self.d_model, self.down_dim
        dh = d // h
        z = TaskDense(d, r, init_std=self.init_std, dtype=self.dtype, name="down")(x)
        z = get_activation(self.non_linearity)(z)
        kinit = resolve_kernel_init(self.init_std)
        binit = resolve_bias_init(self.init_std, r)
        wu = self.param("up_kernel", kinit, (h, r, dh))
        bu = self.param("up_bias", binit, (h, dh))
        w_fused = jnp.transpose(wu, (1, 0, 2)).reshape(r, d).astype(self.dtype)
        b_fused = bu.reshape(d).astype(self.dtype)
        return jnp.dot(z, w_fused, preferred_element_type=self.dtype) + b_fused


class MultiheadDownUpAdapter(nn.Module):
    """h downs d→r/h (concat) → act → h ups r→d/h (concat); each up sees the
    FULL r-dim activation (reference: src/my_transformers/modeling_bart.py:1071-1091)."""

    d_model: int
    down_dim: int
    num_heads: int
    non_linearity: str = "gelu_new"
    init_std: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h, d, r = self.num_heads, self.d_model, self.down_dim
        rh, dh = r // h, d // h
        kinit = resolve_kernel_init(self.init_std)
        wd = self.param("down_kernel", kinit, (h, d, rh))
        bd = self.param("down_bias", resolve_bias_init(self.init_std, d), (h, rh))
        wu = self.param("up_kernel", kinit, (h, r, dh))
        bu = self.param("up_bias", resolve_bias_init(self.init_std, r), (h, dh))
        wdf = jnp.transpose(wd, (1, 0, 2)).reshape(d, r).astype(self.dtype)
        wuf = jnp.transpose(wu, (1, 0, 2)).reshape(r, d).astype(self.dtype)
        z = jnp.dot(x.astype(self.dtype), wdf, preferred_element_type=self.dtype)
        z = z + bd.reshape(r).astype(self.dtype)
        z = get_activation(self.non_linearity)(z)
        return jnp.dot(z, wuf, preferred_element_type=self.dtype) + bu.reshape(d).astype(self.dtype)


class MultiheadPairAdapter(nn.Module):
    """h independent pairs d→r/h→d/h; the up is block-diagonal
    (reference: src/my_transformers/modeling_bart.py:1093-1113).

    Applied as one fused down GEMM + one batched (h, r/h, d/h) contraction.
    """

    d_model: int
    down_dim: int
    num_heads: int
    non_linearity: str = "gelu_new"
    init_std: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h, d, r = self.num_heads, self.d_model, self.down_dim
        rh, dh = r // h, d // h
        kinit = resolve_kernel_init(self.init_std)
        wd = self.param("down_kernel", kinit, (h, d, rh))
        bd = self.param("down_bias", resolve_bias_init(self.init_std, d), (h, rh))
        wu = self.param("up_kernel", kinit, (h, rh, dh))
        bu = self.param("up_bias", resolve_bias_init(self.init_std, rh), (h, dh))
        wdf = jnp.transpose(wd, (1, 0, 2)).reshape(d, r).astype(self.dtype)
        z = jnp.dot(x.astype(self.dtype), wdf, preferred_element_type=self.dtype)
        z = z + bd.reshape(r).astype(self.dtype)
        z = get_activation(self.non_linearity)(z)
        zh = z.reshape(z.shape[:-1] + (h, rh))
        y = jnp.einsum("...hr,hro->...ho", zh, wu.astype(self.dtype)) + bu.astype(self.dtype)
        return y.reshape(x.shape[:-1] + (d,))


# ---------------------------------------------------------------------------
# Granularity-control gates
# ---------------------------------------------------------------------------


class GateLargeX(nn.Module):
    """Full d×d gate from the block input: G = σ(W·x)
    (reference: src/my_transformers/modeling_bart.py:969, :1189-1194)."""

    d_model: int
    init_std: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        g = TaskDense(self.d_model, self.d_model, init_std=self.init_std,
                      dtype=self.dtype, name="proj")(x)
        return jax.nn.sigmoid(g)


class GateLargeXLowRank(nn.Module):
    """VL-PET-large gate: G = σ(U·gelu_new(D·x)); also reused as the
    standalone gating Δy (pre-sigmoid) when ``return_pre_sigmoid``
    (reference: src/my_transformers/modeling_bart.py:1001-1011, :1014-1024)."""

    d_model: int
    gating_down_dim: int
    init_std: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, return_pre_sigmoid: bool = False):
        z = TaskDense(self.d_model, self.gating_down_dim, init_std=self.init_std,
                      dtype=self.dtype, name="down")(x)
        z = get_activation("gelu_new")(z)
        pre = TaskDense(self.gating_down_dim, self.d_model, init_std=self.init_std,
                        dtype=self.dtype, name="up")(z)
        gate = jax.nn.sigmoid(pre)
        if return_pre_sigmoid:
            return gate, pre
        return gate


class GateSmallXYCat(nn.Module):
    """VL-PET-small gate: scalar per example, σ(W·[x;y]) meaned over tokens
    (reference: src/my_transformers/modeling_bart.py:976-981, :1210-1218)."""

    d_model: int
    init_std: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        g = TaskDense(2 * self.d_model, 1, init_std=self.init_std,
                      dtype=self.dtype, name="proj")(jnp.concatenate([x, y], axis=-1))
        g = jax.nn.sigmoid(g)
        return jnp.mean(g, axis=-2, keepdims=True)  # (B, 1, 1)


class GateMiddleXYAdd(nn.Module):
    """VL-PET-middleX gate: per-token scalar σ(W·(x+y))
    (reference: src/my_transformers/modeling_bart.py:983-988, :1219-1226)."""

    d_model: int
    init_std: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        g = TaskDense(self.d_model, 1, init_std=self.init_std,
                      dtype=self.dtype, name="proj")(x + y)
        return jax.nn.sigmoid(g)


class IA3Vector(nn.Module):
    """Learned d-vector for IA³-style scaling; init normal(0.02), typically
    overridden to ones post-init (reference: my_transformers/modeling_bart.py:990-998;
    trainer_base.py:548-553)."""

    dim: int
    init_std: float = 0.02
    param_name: str = "ia3"

    @nn.compact
    def __call__(self) -> Array:
        return self.param(self.param_name, normal_init(self.init_std), (self.dim,))


# ---------------------------------------------------------------------------
# LoRA
# ---------------------------------------------------------------------------


class LoRADense(nn.Module):
    """Dense with a task-routed LoRA delta:
    y = x·W + b + dropout(x)·A·B · (alpha/r)
    (reference: src/lora/controller.py:11-88, src/lora/layers.py:92-160).

    A init: kaiming_uniform(a=sqrt(5)) (torch default on (r, in)); B init: zeros.
    The base kernel stays frozen via the freezing engine (name-based).
    """

    in_dim: int
    out_dim: int
    spec: LoraSpec
    use_bias: bool = True
    init_std: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, task_idx: int = 0,
                 deterministic: bool = True) -> Array:
        s = self.spec
        n_tasks = 1 if s.use_single_lora else len(s.tasks)
        shared = n_tasks == 1
        base = TaskDense(self.in_dim, self.out_dim, use_bias=self.use_bias,
                         init_std=self.init_std, dtype=self.dtype, name="base")(x)
        lead = () if shared else (n_tasks,)

        def a_init(key, shape, dtype=jnp.float32):
            # torch kaiming_uniform(a=sqrt(5)) on (r, in): bound = 1/sqrt(in)
            bound = 1.0 / math.sqrt(self.in_dim)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        lora_a = self.param("lora_A", a_init, lead + (self.in_dim, s.lora_dim))
        lora_b = self.param("lora_B", nn.initializers.zeros,
                            lead + (s.lora_dim, self.out_dim))
        if not shared:
            lora_a, lora_b = lora_a[task_idx], lora_b[task_idx]
        xz = x
        if s.lora_dropout > 0.0:
            xz = nn.Dropout(rate=s.lora_dropout)(xz, deterministic=deterministic)
        delta = jnp.dot(jnp.dot(xz.astype(self.dtype), lora_a.astype(self.dtype)),
                        lora_b.astype(self.dtype))
        return base + delta * (s.lora_alpha / s.lora_dim)
