"""Hyperformer hypernetworks: generate adapter (and conditional-LN) weights
from task + layer (+ block-type) embeddings.

Reference: src/adapters/adapter_hypernetwork.py (AdapterLayersHyperNetController
:54, AdapterLayersOneHyperNetController :158), src/adapters/adapter_utils.py
(TaskEmbeddingController :60, TaskHyperNet :29, LayerNormHyperNet :46), and
src/adapters/adapter_outputs.py (typed weight containers).

One controller per stack; the per-layer generated weights are threaded into
the layers through PetContext.block_adapters and applied by
MetaLayersAdapterController.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from vlpet_tpu.config import HyperformerSpec
from vlpet_tpu.pet.modules import get_activation, normal_init

Array = jax.Array


# Typed containers for generated weights (reference: adapter_outputs.py:7-37)


@struct.dataclass
class SamplerWeights:
    weight: Array  # (out, in) — F.linear convention of the reference
    bias: Array


@struct.dataclass
class LayerNormWeights:
    weight: Array
    bias: Array


@struct.dataclass
class AdapterWeights:
    up: SamplerWeights
    down: SamplerWeights
    pre_norm: Optional[LayerNormWeights] = None
    post_norm: Optional[LayerNormWeights] = None


@struct.dataclass
class BlockAdapterWeights:
    feed_forward: AdapterWeights
    self_attention: AdapterWeights
    cross_attention: Optional[AdapterWeights] = None


def _hyper_dense(name: str, in_dim: int, out_dim: int, dtype):
    """linear_layer with normal(1e-2)/zeros init (reference: adapter_utils.py:22-27)."""
    return nn.Dense(out_dim, kernel_init=normal_init(1e-2),
                    bias_init=nn.initializers.zeros, dtype=dtype, name=name)


class TaskHyperNet(nn.Module):
    """Task-embedding projection MLP (reference: adapter_utils.py:29-43)."""

    spec: HyperformerSpec
    input_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, task_embedding: Array) -> Array:
        z = _hyper_dense("fc1", self.input_dim, self.spec.hidden_dim, self.dtype)(
            task_embedding.reshape(-1))
        z = jax.nn.relu(z)
        return _hyper_dense("fc2", self.spec.hidden_dim,
                            self.spec.projected_task_embedding_dim, self.dtype)(z).reshape(-1)


class LayerNormHyperNet(nn.Module):
    """Generates conditional-LN weight/bias (reference: adapter_utils.py:46-57)."""

    spec: HyperformerSpec
    input_dim: int  # d_model of the target LN
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, emb: Array):
        w = _hyper_dense("weight_generator", self.spec.projected_task_embedding_dim,
                         self.input_dim, self.dtype)(emb)
        b = _hyper_dense("bias_generator", self.spec.projected_task_embedding_dim,
                         self.input_dim, self.dtype)(emb)
        return w, b


class TaskEmbeddingController(nn.Module):
    """Per-task learned embedding, optionally projected
    (reference: adapter_utils.py:60-92). randn init."""

    spec: HyperformerSpec
    tasks: tuple

    @nn.compact
    def __call__(self, task_idx: int) -> Array:
        table = self.param("task_to_embeddings", nn.initializers.normal(1.0),
                           (len(self.tasks), self.spec.task_embedding_dim))
        emb = table[task_idx]
        if self.spec.train_task_embeddings:
            emb = TaskHyperNet(self.spec, self.spec.task_embedding_dim,
                               name="task_hyper_net")(emb)
        return emb


class AdapterWeightGenerator(nn.Module):
    """Generates (weight, bias) for one sampler
    (reference: adapter_hypernetwork.py:35-52). ``weight`` is (out=input_dim,
    in=output_dim) in the reference's F.linear convention."""

    spec: HyperformerSpec
    input_dim: int
    output_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, emb: Array) -> SamplerWeights:
        w = _hyper_dense("weight_generator", self.spec.projected_task_embedding_dim,
                         self.input_dim * self.output_dim, self.dtype)(emb)
        b = _hyper_dense("bias_generator", self.spec.projected_task_embedding_dim,
                         self.input_dim, self.dtype)(emb)
        return SamplerWeights(weight=w.reshape(self.input_dim, self.output_dim), bias=b)


class AdapterLayersHyperNetController(nn.Module):
    """'unique_hyper_net': one hypernet per stack generating ff + self-attn
    (+ cross-attn) adapter weights per layer
    (reference: adapter_hypernetwork.py:54-156)."""

    spec: HyperformerSpec
    d_model: int
    reduction_factor: int
    num_layers: int = 6
    include_cross_attention: bool = False
    add_layer_norm_before_adapter: bool = False
    add_layer_norm_after_adapter: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, task_embedding: Array, layer_id: int) -> BlockAdapterWeights:
        s = self.spec
        down = self.d_model // self.reduction_factor
        layer_table = self.param("layer_id_embeddings", nn.initializers.normal(1.0),
                                 (self.num_layers, s.task_embedding_dim))
        emb = jnp.concatenate([task_embedding.reshape(-1),
                               layer_table[layer_id].reshape(-1)])
        emb = TaskHyperNet(s, 2 * s.task_embedding_dim, name="task_hypernet")(emb)
        if s.unique_hyper_net_layer_norm:
            emb = nn.LayerNorm(epsilon=1e-6, name="LayerNorm")(emb)

        def gen(prefix: str) -> AdapterWeights:
            # up generator: (input_dim=d, output_dim=down) -> F.linear weight d←down
            up = AdapterWeightGenerator(s, self.d_model, down, self.dtype,
                                        name=f"{prefix}_up_sampler_hyper_net")(emb)
            dn = AdapterWeightGenerator(s, down, self.d_model, self.dtype,
                                        name=f"{prefix}_down_sampler_hyper_net")(emb)
            pre = post = None
            if self.add_layer_norm_before_adapter:
                w, b = LayerNormHyperNet(s, self.d_model,
                                         name=f"{prefix}_pre_layernorm_hypernet")(emb)
                pre = LayerNormWeights(w, b)
            if self.add_layer_norm_after_adapter:
                w, b = LayerNormHyperNet(s, self.d_model,
                                         name=f"{prefix}_post_layernorm_hypernet")(emb)
                post = LayerNormWeights(w, b)
            return AdapterWeights(up=up, down=dn, pre_norm=pre, post_norm=post)

        ff = gen("feed_forward")
        sa = gen("self_attention")
        ca = gen("cross_attention") if self.include_cross_attention else None
        return BlockAdapterWeights(feed_forward=ff, self_attention=sa, cross_attention=ca)


class AdapterLayersOneHyperNetController(nn.Module):
    """'efficient_unique_hyper_net': one shared generator with a block-type
    embedding (reference: adapter_hypernetwork.py:158-260)."""

    spec: HyperformerSpec
    d_model: int
    reduction_factor: int
    num_layers: int = 6
    include_cross_attention: bool = False
    add_layer_norm_before_adapter: bool = False
    add_layer_norm_after_adapter: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, task_embedding: Array, layer_id: int) -> BlockAdapterWeights:
        s = self.spec
        down = self.d_model // self.reduction_factor
        layer_table = self.param("layer_id_embeddings", nn.initializers.normal(1.0),
                                 (self.num_layers, s.task_embedding_dim))
        type_table = self.param("adapters_block_type", nn.initializers.normal(1.0),
                                (3, s.task_embedding_dim))
        task_hypernet = TaskHyperNet(s, 3 * s.task_embedding_dim, name="task_hypernet")
        ln = nn.LayerNorm(epsilon=1e-6, name="LayerNorm") if s.unique_hyper_net_layer_norm else None
        up_gen = AdapterWeightGenerator(s, self.d_model, down, self.dtype,
                                        name="up_sampler_hyper_net")
        down_gen = AdapterWeightGenerator(s, down, self.d_model, self.dtype,
                                          name="down_sampler_hyper_net")
        pre_ln_gen = (LayerNormHyperNet(s, self.d_model, name="pre_layernorm_hypernet")
                      if self.add_layer_norm_before_adapter else None)
        post_ln_gen = (LayerNormHyperNet(s, self.d_model, name="post_layernorm_hypernet")
                       if self.add_layer_norm_after_adapter else None)

        def embed(block_type: int) -> Array:
            emb = jnp.concatenate([task_embedding.reshape(-1),
                                   layer_table[layer_id].reshape(-1),
                                   type_table[block_type].reshape(-1)])
            emb = task_hypernet(emb)
            return ln(emb) if ln is not None else emb

        def gen(emb: Array) -> AdapterWeights:
            pre = (LayerNormWeights(*pre_ln_gen(emb))
                   if pre_ln_gen is not None else None)
            post = (LayerNormWeights(*post_ln_gen(emb))
                    if post_ln_gen is not None else None)
            return AdapterWeights(up=up_gen(emb), down=down_gen(emb),
                                  pre_norm=pre, post_norm=post)

        ff = gen(embed(0))
        sa = gen(embed(1))
        ca = gen(embed(2)) if self.include_cross_attention else None
        return BlockAdapterWeights(feed_forward=ff, self_attention=sa, cross_attention=ca)


class MetaLayersAdapterController(nn.Module):
    """Applies hypernet-generated adapter weights:
    out = x + up(act(down(x))) with optional conditional LNs
    (reference: src/adapters/adapter_controller.py:212-250)."""

    non_linearity: str = "gelu_new"
    d_model: int = 768
    add_layer_norm_before_adapter: bool = False
    add_layer_norm_after_adapter: bool = False
    dtype: Any = jnp.float32

    def _cond_layer_norm(self, x: Array, w: LayerNormWeights) -> Array:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        normed = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return normed * w.weight + w.bias

    @nn.compact
    def __call__(self, x: Array, weights: AdapterWeights) -> Array:
        z = self._cond_layer_norm(x, weights.pre_norm) if self.add_layer_norm_before_adapter else x
        # F.linear convention: weight is (out, in) → contract on the last dim
        down = jnp.einsum("...d,rd->...r", z.astype(self.dtype),
                          weights.down.weight.astype(self.dtype)) + weights.down.bias
        mid = get_activation(self.non_linearity)(down)
        out = jnp.einsum("...r,dr->...d", mid,
                         weights.up.weight.astype(self.dtype)) + weights.up.bias
        if self.add_layer_norm_after_adapter:
            out = self._cond_layer_norm(out, weights.post_norm)
        return out + x
