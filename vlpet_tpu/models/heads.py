"""Per-task step logic (losses + prediction rules).

Reference: src/vqa_model.py (score-weighted masked-mean CE, :216-227),
src/gqa_model.py / src/video/video_model.py (masked-mean CE),
src/caption_model.py (reduced CE, :22-34), src/nlvr_model.py (the
true/false-logit trick, :199-258), src/multitask_model.py (dispatch by
batch['task']).

All functions are jit-safe pure functions over model outputs.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def masked_mean_per_example(per_token_loss: Array, labels: Array) -> Array:
    """CE summed over valid tokens / count, per example (B,)."""
    mask = (labels != -100).astype(jnp.float32)
    s = (per_token_loss * mask).sum(axis=1)
    return s / jnp.clip(mask.sum(axis=1), 1.0)


def vqa_loss(per_token_loss: Array, labels: Array, scores: Array) -> Array:
    """Masked-mean per example weighted by VQA soft-answer score, then mean
    (reference: vqa_model.py:216-227)."""
    return (masked_mean_per_example(per_token_loss, labels) * scores).mean()


def qa_loss(per_token_loss: Array, labels: Array) -> Array:
    """GQA / video-QA: masked-mean per example then mean
    (reference: gqa_model.py:30-43, video/video_model.py)."""
    return masked_mean_per_example(per_token_loss, labels).mean()


def caption_loss(per_token_loss: Array, labels: Array) -> Array:
    """Reduced CE over all valid tokens (reference: caption_model.py:22-34,
    the reduce_loss=True path of VLBart.forward)."""
    mask = (labels != -100).astype(jnp.float32)
    return per_token_loss.sum() / jnp.clip(mask.sum(), 1.0)


def nlvr_binary_logits(logits: Array, true_token_id: int, false_token_id: int,
                       position: int) -> Array:
    """Compare lm logits of 'true' vs 'false' at a fixed decoder position —
    position 1 for BART, 0 for T5 (reference: nlvr_model.py:70-77,199-206).
    Returns (B, 2) [false, true] logits."""
    step = logits[:, position, :]
    return jnp.stack([step[:, false_token_id], step[:, true_token_id]], axis=-1)


def nlvr_predict(logits: Array, true_token_id: int, false_token_id: int,
                 position: int) -> Array:
    """Boolean predictions (True = 'true' wins)."""
    bl = nlvr_binary_logits(logits, true_token_id, false_token_id, position)
    return bl[:, 1] > bl[:, 0]


TASK_LOSSES = {
    "vqa": "vqa",
    "gqa": "qa",
    "nlvr": "qa",
    "caption": "caption",
    "tvqa": "qa",
    "how2qa": "qa",
    "tvc": "qa",
    "yc2c": "qa",
}


def classifier_bce_loss(answer_logits: Array, target: Array) -> Array:
    """Mean element-wise BCE-with-logits over (B, num_answers) score
    targets — torch nn.BCEWithLogitsLoss() default reduction
    (reference: vqa_model.py:22,56)."""
    logits = answer_logits.astype(jnp.float32)
    t = target.astype(jnp.float32)
    per = jnp.maximum(logits, 0.0) - logits * t + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    return jnp.mean(per)


def task_loss(task: str, per_token_loss: Array, labels: Array,
              scores: Optional[Array] = None) -> Array:
    """Dispatch on static task name (reference: multitask_model.py:54-89).

    Note: the reference's video head uses masked-mean for ALL four video
    tasks including the captioning ones (video/video_model.py:44-60), while
    the image caption head uses reduced CE — both preserved here.
    """
    kind = TASK_LOSSES.get(task, "qa")
    if kind == "vqa":
        assert scores is not None
        return vqa_loss(per_token_loss, labels, scores)
    if kind == "caption":
        return caption_loss(per_token_loss, labels)
    return qa_loss(per_token_loss, labels)
