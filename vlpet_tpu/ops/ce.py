"""Linear + cross-entropy with a single bf16 logits materialization.

The default train-step CE chain materializes the (B·T, V) tensor three times
in fp32 (logits GEMM output, log_softmax's shifted copy, and the backward's
softmax recompute) — ~13 ms/step at flagship shapes (B·T=5000, V=50265;
scripts/profile_train.py). This custom_vjp pins the schedule to:

  forward:  logits GEMM (fp32 accumulation) → bf16 logits materialized ONCE
            + fp32 logsumexp; per-token nll in fp32.
  backward: softmax recomputed in-register from the saved bf16 logits,
            d_logits emitted in bf16, then the dx GEMM.

bf16 logits cost ~1e-2 absolute on the per-token nll (AMP-equivalent: torch
autocast also produces half-precision logits); gradients are softmax-shaped
and insensitive at that scale. Used only when the lm head is FROZEN (the
published PET recipes; vlbart._ce guards) — d_w/d_b are still returned for
correctness but get DCE'd in that case.

Reference behavior: per-token CE with ignore_index=-100
(reference: src/modeling_bart.py:1580-1586).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@jax.custom_vjp
def linear_ce(x: Array, w: Array, b: Array, labels: Array) -> Array:
    """x (N, d) activations; w (V, d) tied lm head; b (V,) final_logits_bias;
    labels (N,) int with -100 = ignore. Returns per-token nll (N,) fp32
    (0 at ignored positions)."""
    nll, _, _ = _forward(x, w, b, labels)
    return nll


def _forward(x, w, b, labels):
    logits = jnp.dot(x, w.T.astype(x.dtype),
                     preferred_element_type=jnp.float32) + b
    lse = jax.scipy.special.logsumexp(logits, axis=-1)          # (N,) fp32
    valid = labels != -100
    safe = jnp.where(valid, labels, 0)
    picked = jnp.take_along_axis(logits, safe[:, None], axis=-1)[:, 0]
    nll = jnp.where(valid, lse - picked, 0.0)
    return nll, logits.astype(jnp.bfloat16), lse


def _fwd(x, w, b, labels):
    nll, logits_bf16, lse = _forward(x, w, b, labels)
    return nll, (x, w, logits_bf16, lse, labels)


def _bwd(res, g):
    x, w, logits_bf16, lse, labels = res
    valid = labels != -100
    safe = jnp.where(valid, labels, 0)
    gv = jnp.where(valid, g, 0.0)                               # (N,) fp32
    p = jnp.exp(logits_bf16.astype(jnp.float32) - lse[:, None])
    # one-hot as an in-fusion iota compare — never materializes (N, V) fp32
    col = jax.lax.broadcasted_iota(jnp.int32, logits_bf16.shape, 1)
    onehot = (col == safe[:, None]).astype(jnp.float32)
    dlogits = ((p - onehot) * gv[:, None]).astype(jnp.bfloat16)  # ONE bf16 copy
    dx = jnp.dot(dlogits, w.astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32).astype(x.dtype)
    # dw/db are DCE'd when the lm head is frozen (the guarded use case)
    dw = jnp.dot(dlogits.T, x, preferred_element_type=jnp.float32)
    db = jnp.sum(dlogits.astype(jnp.float32), axis=0)
    return (dx, dw.astype(w.dtype), db.astype(jnp.float32),
            np.zeros(labels.shape, dtype=jax.dtypes.float0))


linear_ce.defvjp(_fwd, _bwd)
