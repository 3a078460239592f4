"""Probe fused-attention row-block size on the TPU at flagship shapes."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import vlpet_tpu.ops.attention as A

B, L, S, H, Dh = 500, 56, 56, 12, 64
rng = np.random.default_rng(0)
mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.3, jnp.bfloat16)
q, k, v = mk(B, L, H * Dh), mk(B, S, H * Dh), mk(B, S, H * Dh)
mask = jnp.zeros((B, 1, 1, S), jnp.float32)

for tb in [int(a) for a in sys.argv[1:]] or [10, 20, 4]:
    A._block_rows = lambda b, cap=16, _tb=tb: _tb
    # fresh function identities per tb so jit recompiles with the new block
    fwd = jax.jit(lambda q, k, v, m: A._pallas_attention(q, k, v, m, H))
    g = jax.jit(jax.grad(
        lambda q, k, v, m: A.fused_attention(q, k, v, m, H)
        .astype(jnp.float32).sum(), argnums=(0, 1, 2)))
    try:
        out = fwd(q, k, v, mask)
        float(jnp.asarray(out[0, 0, 0], jnp.float32))
        t0 = time.perf_counter()
        for _ in range(20):
            out = fwd(q, k, v, mask)
        float(jnp.asarray(out[0, 0, 0], jnp.float32))
        f_ms = (time.perf_counter() - t0) / 20 * 1e3
        dq, dk, dv = g(q, k, v, mask)
        float(jnp.asarray(dq[0, 0, 0], jnp.float32))
        t0 = time.perf_counter()
        for _ in range(20):
            dq, dk, dv = g(q, k, v, mask)
        float(jnp.asarray(dq[0, 0, 0], jnp.float32))
        fb_ms = (time.perf_counter() - t0) / 20 * 1e3
        print(f"tb={tb}: fwd {f_ms:.2f} ms, fwd+bwd {fb_ms:.2f} ms", flush=True)
    except Exception as e:
        print(f"tb={tb}: FAIL {str(e)[:100]}", flush=True)
