"""Hardware probe: one-head-per-program attention at video-QA shapes.

Validates on the real chip what the interpret-mode tests validate on CPU:
1. the per-head kernels COMPILE at S≈604 (the all-heads kernels blow the
   16 MB scoped-vmem stack there — PERF.md "Long-sequence shapes"), i.e.
   the `_perhead_fits` model's constants are not optimistic;
2. numerics match the XLA reference at bf16 tolerance;
3. e2e-style timing vs the XLA einsum path (isolated timings on the
   tunnel are noisy — treat as direction, confirm with the video CLI).

Run: python scripts/probe_perhead_attention.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vlpet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from vlpet_tpu.ops.attention import (  # noqa: E402
    _pallas_attention_perhead, _pallas_attention_perhead_bwd,
    _select_attention_mode, fused_attention, fused_attention_reference)


def sync(x):
    return float(jnp.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def timeit(fn, *args, iters=20):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    B, L, H, hd = 50, 604, 12, 64
    inner = H * hd
    dt = jnp.bfloat16
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.random.normal(ks[0], (B, L, inner), dt)
    k = jax.random.normal(ks[1], (B, L, inner), dt)
    v = jax.random.normal(ks[2], (B, L, inner), dt)
    lens = jax.random.randint(ks[3], (B, 1), L // 2, L + 1)
    mask = jnp.where(jnp.arange(L)[None] < lens, 0.0,
                     -1e9).astype(jnp.float32).reshape(B, 1, 1, L)
    bias = jax.random.normal(ks[4], (1, H, L, L), jnp.float32) * 0.1
    seed = jnp.array([42], jnp.int32)

    for tag, kw in [
        ("bart-train (compact mask)", dict()),
        ("t5-eval (mask+bias)", dict(bias=bias)),
        ("t5-train (mask+bias+drop)", dict(bias=bias, rate=0.1, seed=seed)),
    ]:
        rate = kw.get("rate", 0.0)
        has_bias = kw.get("bias") is not None
        mode = _select_attention_mode(B, L, L, inner, H, has_bias, rate, 2,
                                      need_bwd=rate == 0.0 and not has_bias)
        print(f"--- {tag}: mode={mode}")
        ph = jax.jit(functools.partial(_pallas_attention_perhead, num_heads=H,
                                       **kw))
        ref = jax.jit(functools.partial(fused_attention_reference,
                                        num_heads=H, **kw))
        try:
            got = ph(q, k, v, mask)
        except Exception as e:  # noqa: BLE001
            print(f"    fwd COMPILE FAIL: {type(e).__name__}: {str(e)[:300]}")
            continue
        want = ref(q, k, v, mask)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - want.astype(jnp.float32))))
        print(f"    fwd max|Δ|={err:.4f}  "
              f"pallas {timeit(ph, q, k, v, mask):.2f} ms  "
              f"xla {timeit(ref, q, k, v, mask):.2f} ms")

        # backward (training direction)
        do = q
        phb = jax.jit(functools.partial(_pallas_attention_perhead_bwd,
                                        num_heads=H, **kw))
        def xlab(q_, k_, v_, m_, do_):
            f = lambda a, b, c: fused_attention_reference(  # noqa: E731
                a, b, c, m_, H, **kw)
            return jax.vjp(f, q_, k_, v_)[1](do_)
        xb = jax.jit(xlab)
        try:
            g = phb(q, k, v, mask, do)
        except Exception as e:  # noqa: BLE001
            print(f"    bwd COMPILE FAIL: {type(e).__name__}: {str(e)[:300]}")
            continue
        wg = xb(q, k, v, mask, do)
        berr = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                         - b.astype(jnp.float32))))
                   for a, b in zip(g[:3], wg))
        print(f"    bwd max|Δ|={berr:.4f}  "
              f"pallas {timeit(phb, q, k, v, mask, do):.2f} ms  "
              f"xla {timeit(xb, q, k, v, mask, do):.2f} ms")

    # dbias accumulation on hardware (grid-resident block, b-inner grid)
    print("--- dbias accumulation (bias_grad=True, small batch)")
    Bs = 8
    try:
        g = _pallas_attention_perhead_bwd(q[:Bs], k[:Bs], v[:Bs],
                                          mask[:Bs], q[:Bs], H,
                                          bias=bias, bias_grad=True)
        _, vjp = jax.vjp(lambda b_: fused_attention_reference(
            q[:Bs], k[:Bs], v[:Bs], mask[:Bs], H, bias=b_), bias)
        want = vjp(q[:Bs])[0]
        err = float(jnp.max(jnp.abs(g[3] - want)))
        print(f"    dbias max|Δ|={err:.4f}")
    except Exception as e:  # noqa: BLE001
        print(f"    COMPILE FAIL: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
