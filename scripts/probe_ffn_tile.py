"""Probe fused-FFN row tiles on the TPU: compile + time fwd/bwd per tb."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import vlpet_tpu.ops.ffn as F

N, D, Fd = 28000, 768, 3072
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(N, D)) * 0.1, jnp.bfloat16)
w1 = jnp.asarray(rng.normal(size=(D, Fd)) * 0.02, jnp.bfloat16)
b1 = jnp.zeros((Fd,), jnp.float32)
w2 = jnp.asarray(rng.normal(size=(Fd, D)) * 0.02, jnp.bfloat16)
b2 = jnp.zeros((D,), jnp.float32)

for tb in [int(a) for a in sys.argv[1:]] or [80, 112, 128, 160]:
    F._row_tile = lambda n, d, f, budget_mb=13.0, _tb=tb: _tb

    def loss(x):
        return F.fused_ffn(x, w1, b1, w2, b2, "gelu").astype(jnp.float32).sum()

    try:
        g = jax.jit(jax.grad(loss))
        out = g(x)
        float(jnp.asarray(out[0, 0]))
        t0 = time.perf_counter()
        for _ in range(10):
            out = g(x)
        float(jnp.asarray(out[0, 0]))
        dt = (time.perf_counter() - t0) / 10
        print(f"tb={tb}: OK {dt*1e3:.2f} ms fwd+bwd", flush=True)
    except Exception as e:
        print(f"tb={tb}: FAIL {str(e)[:120]}", flush=True)
