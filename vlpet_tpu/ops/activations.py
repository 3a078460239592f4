"""Save-light activations (custom_vjp): residual = the input only.

XLA's default reverse-mode for gelu saves every elementwise intermediate the
backward reuses — at flagship shapes the encoder fc1→gelu chain materializes
FOUR (28000, 3072) tensors per layer (one f32 + three bf16 ≈ 860 MB written,
measured HBM-bound at 603 GiB/s — scripts/profile_train.py). The fc1 output
must be saved anyway (it is the fc2 GEMM input), so the optimal residual set
is exactly {x}: these wrappers pin that choice and recompute the derivative
factor inside the backward fusion, in fp32 for accuracy, costing only VPU
flops that hide under the surrounding GEMMs.

Forward values are bit-identical to jax.nn.gelu (same formula, same dtype);
only the autodiff residual/recompute schedule changes.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

_SQRT_HALF = math.sqrt(0.5)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)
_SQRT_2_OVER_PI = math.sqrt(2.0 / math.pi)


@jax.custom_vjp
def gelu_exact(x):
    """erf-form gelu; residual-minimal backward (saves x only)."""
    return jax.nn.gelu(x, approximate=False)


def _gelu_exact_fwd(x):
    return jax.nn.gelu(x, approximate=False), x


def _gelu_exact_bwd(x, g):
    x32 = x.astype(jnp.float32)
    cdf = 0.5 * lax.erfc(-x32 * _SQRT_HALF)
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * x32 * x32)
    return ((g.astype(jnp.float32) * (cdf + x32 * pdf)).astype(x.dtype),)


gelu_exact.defvjp(_gelu_exact_fwd, _gelu_exact_bwd)


@jax.custom_vjp
def gelu_new(x):
    """tanh-approximation gelu (HF gelu_new); residual-minimal backward."""
    return jax.nn.gelu(x, approximate=True)


def _gelu_new_fwd(x):
    return jax.nn.gelu(x, approximate=True), x


def _gelu_new_bwd(x, g):
    x32 = x.astype(jnp.float32)
    inner = _SQRT_2_OVER_PI * (x32 + 0.044715 * x32 * x32 * x32)
    t = jnp.tanh(inner)
    sech2 = 1.0 - t * t
    dinner = _SQRT_2_OVER_PI * (1.0 + 3.0 * 0.044715 * x32 * x32)
    d = 0.5 * (1.0 + t) + 0.5 * x32 * sech2 * dinner
    return ((g.astype(jnp.float32) * d).astype(x.dtype),)


gelu_new.defvjp(_gelu_new_fwd, _gelu_new_bwd)
