"""A/B: ops/fused_pet.py fused epilogue kernel vs the XLA chain it replaces.

Judge r2 weak #7: the kernel is exported+tested but unwired. Decision rule
(CLAUDE.md): adopt only on an e2e win. This script measures the epilogue in
isolation BUT with 32 chained dependent iterations per timing window so
dispatch amortizes (the repo's rule that isolated timings are noise applies
to single dispatches). If even the isolated win is below ~20% of epilogue
time, the e2e ceiling (epilogue is <5% of the 107 ms step) is <1% and the
kernel gets deleted rather than wired.

Flagship shapes: M = B*(L_txt+L_vis) = 500*56 = 28000 rows, d=768, r=96,
gate=96, bf16.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vlpet_jax_cache")

M, D, R, G = 28000, 768, 96, 96
ITERS = 32


def main():
    from vlpet_tpu.ops.fused_pet import (fused_epilogue_reference,
                                         fused_multihead_adapter_gate)

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    h = jnp.asarray(rng.normal(size=(M, D)) * 0.5, dt)
    x = jnp.asarray(rng.normal(size=(M, D)) * 0.5, dt)
    Wd = jnp.asarray(rng.normal(size=(D, R)) * 0.02, dt)
    bd = jnp.zeros((R,), dt)
    Wu = jnp.asarray(rng.normal(size=(R, D)) * 0.02, dt)
    bu = jnp.zeros((D,), dt)
    Gd = jnp.asarray(rng.normal(size=(D, G)) * 0.02, dt)
    bgd = jnp.zeros((G,), dt)
    Gu = jnp.asarray(rng.normal(size=(G, D)) * 0.02, dt)
    bgu = jnp.zeros((D,), dt)
    ws = (Wd, bd, Wu, bu, Gd, bgd, Gu, bgu)

    def chain(fn):
        @jax.jit
        def run(h, x):
            for _ in range(ITERS):
                h = fn(h, x, *ws)
            return h

        return run

    def chain_grad(fn):
        @jax.jit
        def run(h, x):
            def loss(h):
                acc = h
                for _ in range(ITERS):
                    acc = fn(acc, x, *ws)
                return jnp.sum(acc.astype(jnp.float32))

            return jax.grad(loss)(h)

        return run

    def timeit(f, *args):
        out = f(*args)
        float(jnp.asarray(out).astype(jnp.float32).sum())  # sync (axon rule)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            out = f(*args)
            float(jnp.asarray(out).astype(jnp.float32).sum())
            best = min(best, time.perf_counter() - t0)
        return best / ITERS * 1e3  # ms per epilogue

    for tag, build in (("fwd", chain), ("fwd+bwd", chain_grad)):
        t_ker = timeit(build(fused_multihead_adapter_gate), h, x)
        t_xla = timeit(build(fused_epilogue_reference), h, x)
        print(f"{tag}: kernel {t_ker:.3f} ms  xla {t_xla:.3f} ms  "
              f"ratio {t_ker / t_xla:.2f}")


if __name__ == "__main__":
    main()
