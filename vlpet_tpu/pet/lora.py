"""LoRA layer family + inference-time merge/unmerge.

Completes the reference's LoRA baseline surface beyond the task-routed
LoRADense in pet/modules.py (reference: src/lora/layers.py):

* LoRAEmbedding    — layers.py:32-90  (A zeros / B normal init, per spec)
* LoRAMergedLinear — layers.py:160-262 (grouped QKV-style LoRA with
  enable_lora gating and zero-padded scatter)
* LoRAConv2d       — layers.py:264-330 (delta reshaped onto the conv kernel)
* merge_lora / unmerge_lora — the train()/eval() weight folding, done
  functionally on the param tree (TPU-idiomatic: params are immutable
  inputs; a merged tree gives zero-overhead inference like the reference's
  eval()-time merge).

All frozen bases keep torch-compatible naming ('weight'-equivalent kernels
named like the surrounding flax modules) and LoRA params are named
lora_A/lora_B so the freezing engine's 'lora' substring rule picks them up.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vlpet_tpu.pet.modules import Dtype, normal_init

Array = jax.Array


def _kaiming_a(in_dim: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(in_dim)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class LoRAEmbedding(nn.Module):
    """Embedding + LoRA delta (reference: lora/layers.py:32-90).

    Per the reference's reset_parameters: lora_A is ZEROS and lora_B is
    normal (the reverse of the Linear variant), so the delta starts at 0.
    """

    num_embeddings: int
    features: int
    r: int = 0
    lora_alpha: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ids: Array) -> Array:
        emb = self.param("embedding", normal_init(1.0),
                         (self.num_embeddings, self.features))
        y = jnp.take(emb, ids, axis=0).astype(self.dtype)
        if self.r > 0:
            lora_a = self.param("lora_A", nn.initializers.zeros,
                                (self.r, self.num_embeddings))
            lora_b = self.param("lora_B", normal_init(1.0),
                                (self.features, self.r))
            after_a = jnp.take(lora_a.T, ids, axis=0).astype(self.dtype)
            y = y + (after_a @ lora_b.T.astype(self.dtype)) * (self.lora_alpha / self.r)
        return y


class LoRAMergedLinear(nn.Module):
    """Linear whose output blocks are selectively LoRA-adapted
    (reference: lora/layers.py:160-262 — the packed-QKV use case).

    enable_lora: one flag per equal output block; A is (r·n_on, in), B is
    (block·n_on, r), and the grouped delta scatters into the enabled blocks
    (the reference's conv1d-groups + zero_pad)."""

    in_dim: int
    out_dim: int
    r: int = 0
    lora_alpha: int = 1
    enable_lora: Sequence[bool] = (False,)
    lora_dropout: float = 0.0
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        n_blocks = len(self.enable_lora)
        assert self.out_dim % n_blocks == 0
        block = self.out_dim // n_blocks
        n_on = sum(self.enable_lora)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_dim, self.out_dim))
        bias = (self.param("bias", nn.initializers.zeros, (self.out_dim,))
                if self.use_bias else None)
        lead = x.shape[:-1]
        x2 = x.reshape(-1, self.in_dim).astype(self.dtype)
        y = x2 @ kernel.astype(self.dtype)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        if self.r > 0 and n_on:
            lora_a = self.param("lora_A", _kaiming_a(self.in_dim),
                                (self.r * n_on, self.in_dim))
            lora_b = self.param("lora_B", nn.initializers.zeros,
                                (block * n_on, self.r))
            xz = x2
            if self.lora_dropout > 0.0:
                xz = nn.Dropout(rate=self.lora_dropout)(
                    xz, deterministic=deterministic)
            after_a = xz @ lora_a.T.astype(self.dtype)  # (N, r*n_on)
            # grouped conv1d == per-group (r -> block) matmul
            deltas = []
            for g in range(n_on):
                ag = after_a[:, g * self.r:(g + 1) * self.r]
                bg = lora_b[g * block:(g + 1) * block].T.astype(self.dtype)
                deltas.append(ag @ bg)  # (N, block)
            scale = self.lora_alpha / self.r
            gi = 0
            for bi, on in enumerate(self.enable_lora):
                if not on:
                    continue
                y = y.at[:, bi * block:(bi + 1) * block].add(deltas[gi] * scale)
                gi += 1
        return y.reshape(lead + (self.out_dim,))


class LoRAConv2d(nn.Module):
    """NHWC conv with the LoRA delta folded onto the kernel
    (reference: lora/layers.py:264-330 — forward always runs one conv with
    W + (B@A).view(W.shape)·scale, which maps cleanly onto XLA)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    r: int = 0
    lora_alpha: int = 1
    stride: int = 1
    padding: str = "SAME"
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        ks = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (ks, ks, self.in_channels, self.out_channels))
        w = kernel
        if self.r > 0:
            lora_a = self.param("lora_A", _kaiming_a(self.in_channels * ks),
                                (self.r * ks, self.in_channels * ks))
            lora_b = self.param("lora_B", nn.initializers.zeros,
                                (self.out_channels * ks, self.r * ks))
            # torch shape (out, in, kh, kw) -> NHWC (kh, kw, in, out)
            delta = (lora_b @ lora_a).reshape(
                self.out_channels, self.in_channels, ks, ks)
            delta = jnp.transpose(delta, (2, 3, 1, 0))
            w = w + delta * (self.lora_alpha / self.r)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=(self.stride, self.stride), padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.out_channels,)).astype(self.dtype)
        return y


# ---------------------------------------------------------------------------
# functional merge / unmerge (the reference's eval()/train() weight folding)
# ---------------------------------------------------------------------------


def _merge_tree(params, sign: float, alpha: int, task_idx: Optional[int]):
    """Fold sign * (A @ B) * (alpha/r) into sibling base kernels wherever a
    module owns lora_A/lora_B. Handles LoRADense layout (A (in, r),
    B (r, out), base under 'base.kernel') and task-routed stacks."""

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {k: walk(v) for k, v in node.items()}
        if "lora_A" in node and "lora_B" in node:
            a, b = node["lora_A"], node["lora_B"]
            if a.ndim == 3:  # task-stacked (LoRADense, per-task)
                assert task_idx is not None, \
                    "task-routed LoRA needs task_idx to merge"
                a, b = a[task_idx], b[task_idx]
            r = a.shape[-1]
            delta = (a @ b) * (alpha / r) * sign
            if "base" in out and isinstance(out["base"], dict) \
                    and "kernel" in out["base"]:
                base = dict(out["base"])
                base["kernel"] = base["kernel"] + delta.astype(
                    base["kernel"].dtype)
                out["base"] = base
        return out

    return walk(params)


def merge_lora(params, lora_alpha: int, task_idx: Optional[int] = None):
    """Returns a param tree with every LoRADense delta folded into its base
    kernel — zero-overhead inference, the reference's eval()-time merge
    (lora/layers.py train/eval). Task-routed LoRA merges one task's delta
    (pass task_idx). The lora_A/lora_B leaves are kept (ignored by the
    merged forward only if you also strip them — inference uses
    apply_merged=True paths or simply tolerates the double count, so
    ALWAYS run the merged tree through a model built with lora disabled,
    or strip with strip_lora())."""
    return _merge_tree(params, +1.0, lora_alpha, task_idx)


def unmerge_lora(params, lora_alpha: int, task_idx: Optional[int] = None):
    """Inverse of merge_lora (the reference's train()-time unmerge)."""
    return _merge_tree(params, -1.0, lora_alpha, task_idx)


def strip_lora(params):
    """Drop lora_A/lora_B leaves (after merge_lora) and hoist each
    LoRADense's 'base' subtree so the tree loads into a LoRA-free model
    (q_proj.base.kernel -> q_proj.kernel) for deployment."""

    def walk(node):
        if not isinstance(node, dict):
            return node
        if "lora_A" in node and "base" in node and isinstance(node["base"], dict):
            rest = {k: walk(v) for k, v in node.items()
                    if k not in ("lora_A", "lora_B", "base")}
            return {**{k: walk(v) for k, v in node["base"].items()}, **rest}
        return {k: walk(v) for k, v in node.items()
                if k not in ("lora_A", "lora_B")}

    return walk(params)
