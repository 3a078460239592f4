"""Prompt tuning modules.

Reference: src/prompt/prompt_modeling.py (InputPrompts: Embedding → Linear →
Tanh → Linear reparameterization) and src/prompt/prompt_controller.py
(per-task or single shared prompt). Task routing follows the stacked-param
pattern of vlpet_tpu.pet.modules.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vlpet_tpu.config import PromptSpec
from vlpet_tpu.pet.modules import TaskDense, normal_init

Array = jax.Array


class InputPrompts(nn.Module):
    """Learned prefix tokens reparameterized through an MLP
    (reference: src/prompt/prompt_modeling.py:4-24)."""

    spec: PromptSpec
    d_model: int
    init_std: Optional[float] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, bsz: int) -> Array:
        s = self.spec
        emb_init = normal_init(self.init_std) if self.init_std else nn.initializers.normal(1.0)
        table = self.param("prefix_embedding", emb_init, (s.prompt_len, self.d_model))
        z = TaskDense(self.d_model, s.mid_dim, init_std=self.init_std,
                      dtype=self.dtype, name="mlp_in")(table.astype(self.dtype))
        z = jnp.tanh(z)
        prompt = TaskDense(s.mid_dim, self.d_model, init_std=self.init_std,
                           dtype=self.dtype, name="mlp_out")(z)
        return jnp.broadcast_to(prompt[None], (bsz,) + prompt.shape)


class PromptController(nn.Module):
    """Task-routed prompt store (reference: src/prompt/prompt_controller.py:6-78).

    With ``use_single_prompt`` a single InputPrompts is shared across tasks;
    otherwise one per task, selected by static ``task_idx``. All per-task
    prompts are materialized at init (so init is task-independent) and the
    selection is a static Python branch — each task is its own jit bucket.
    """

    spec: PromptSpec
    d_model: int
    init_std: Optional[float] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, bsz: int, task_idx: int = 0) -> Array:
        s = self.spec
        if s.use_single_prompt or len(s.tasks) == 1:
            return InputPrompts(s, self.d_model, self.init_std, self.dtype,
                                name="prompts")(bsz)
        outs = [InputPrompts(s, self.d_model, self.init_std, self.dtype,
                             name=f"prompts_{t}")(bsz) for t in s.tasks]
        return outs[task_idx]
