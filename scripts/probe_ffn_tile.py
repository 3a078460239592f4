"""Probe fused-FFN row tiles on the TPU: compile + time fwd/bwd per tb.

Usage: python scripts/probe_ffn_tile.py [n=ROWS] [tb ...]
Defaults: N=28000 (flagship B·L), tb in {80, 112, 128, 160} (the r2/r3
non-power-of-two re-probe — judge r3 #7 / ROADMAP gap 3). Pass n=16384
to reproduce the video-S=1024 backward OOM (r4: the SAME (128, 768)
block compiles at N=35200 but blows scoped vmem at N=16384 inside the
e2e step — isolate whether Mosaic's stack accounting is N-dependent).
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vlpet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import vlpet_tpu.ops.ffn as F  # noqa: E402

N, D, Fd = 28000, 768, 3072
tbs = []
for a in sys.argv[1:]:
    if a.startswith("n="):
        N = int(a[2:])
    else:
        tbs.append(int(a))
tbs = tbs or [80, 112, 128, 160]

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(N, D)) * 0.1, jnp.bfloat16)
w1 = jnp.asarray(rng.normal(size=(D, Fd)) * 0.02, jnp.bfloat16)
b1 = jnp.zeros((Fd,), jnp.float32)
w2 = jnp.asarray(rng.normal(size=(Fd, D)) * 0.02, jnp.bfloat16)
b2 = jnp.zeros((D,), jnp.float32)

for tb in tbs:
    F._row_tile = lambda n, d, f, budget_mb=13.0, n_w=2, hid_f32=1, _tb=tb: _tb

    # weights MUST be jit arguments, not closure constants: closed-over
    # device arrays inline into the MLIR (2×4.7 MB here — code_len 9.4 MB)
    # and crash the remote compile helper, masquerading as a kernel
    # failure (r4 lesson; the e2e step always passes them as arguments).
    def loss(x, w1, b1, w2, b2):
        return F.fused_ffn(x, w1, b1, w2, b2, "gelu").astype(jnp.float32).sum()

    try:
        g = jax.jit(jax.grad(loss, argnums=0))
        out = g(x, w1, b1, w2, b2)
        float(jnp.asarray(out[0, 0]))
        t0 = time.perf_counter()
        for _ in range(10):
            out = g(x, w1, b1, w2, b2)
        float(jnp.asarray(out[0, 0]))
        dt = (time.perf_counter() - t0) / 10
        print(f"N={N} tb={tb}: OK {dt*1e3:.2f} ms fwd+bwd", flush=True)
    except Exception as e:
        print(f"N={N} tb={tb}: FAIL {str(e)[:160]}", flush=True)
