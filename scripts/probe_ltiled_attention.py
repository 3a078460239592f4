"""Hardware probe: L-tiled all-heads attention (r4) at long-sequence shapes.

Validates on the real chip what the interpret-mode tests validate on CPU:
1. the L-tiled kernels COMPILE at the shapes `_ltiled_block` accepts —
   S=604 (video QA, where they compete with the per-head kernels),
   S=704 and S=1024 (past the per-head ceiling: the r3 'cliff' shapes
   that previously fell back to the XLA einsum path);
2. numerics match the XLA reference at bf16 tolerance;
3. isolated timing vs the per-head kernels (S=604) and the XLA path
   (all S) — direction only; confirm e2e with bench_step_variants.py.

Run: python scripts/probe_ltiled_attention.py [S ...]  (default 604 704 1024)
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/vlpet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vlpet_tpu.ops.attention import (  # noqa: E402
    _ltiled_block, _pallas_attention_ltiled, _pallas_attention_ltiled_bwd,
    _pallas_attention_perhead, _pallas_attention_perhead_bwd, _perhead_fits,
    fused_attention_reference)


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


def probe(S: int, B: int, H: int = 12, hd: int = 64):
    inner = H * hd
    dt = jnp.bfloat16
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.random.normal(ks[0], (B, S, inner), dt)
    k = jax.random.normal(ks[1], (B, S, inner), dt)
    v = jax.random.normal(ks[2], (B, S, inner), dt)
    lens = jax.random.randint(ks[3], (B, 1), S // 2, S + 1)
    mask = jnp.where(jnp.arange(S)[None] < lens, 0.0,
                     -1e9).astype(jnp.float32).reshape(B, 1, 1, S)
    bias = jax.random.normal(ks[4], (1, H, S, S), jnp.float32) * 0.1
    seed = jnp.array([42], jnp.int32)
    do = q

    for tag, kw in [
        ("bart-train (compact mask)", dict()),
        ("t5-train (mask+bias+drop)", dict(bias=bias, rate=0.1, seed=seed)),
    ]:
        rate = kw.get("rate", 0.0)
        has_bias = kw.get("bias") is not None
        bl_f = _ltiled_block(S, S, inner, H, has_bias, rate, 2, False)
        bl_b = _ltiled_block(S, S, inner, H, has_bias, rate, 2, True)
        print(f"--- S={S} B={B} {tag}: block_l fwd={bl_f} bwd={bl_b}")
        lt = jax.jit(functools.partial(_pallas_attention_ltiled,
                                       num_heads=H, **kw))
        ref = jax.jit(functools.partial(fused_attention_reference,
                                        num_heads=H, **kw))
        try:
            got = lt(q, k, v, mask)
        except Exception as e:  # noqa: BLE001
            print(f"    fwd COMPILE FAIL: {type(e).__name__}: {str(e)[:300]}")
            continue
        want = ref(q, k, v, mask)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - want.astype(jnp.float32))))
        line = (f"    fwd max|Δ|={err:.4f}  "
                f"ltiled {timeit(lt, q, k, v, mask):.2f} ms  "
                f"xla {timeit(ref, q, k, v, mask):.2f} ms")
        if _perhead_fits(S, S, hd, has_bias, rate, 2, False, False):
            ph = jax.jit(functools.partial(_pallas_attention_perhead,
                                           num_heads=H, **kw))
            line += f"  perhead {timeit(ph, q, k, v, mask):.2f} ms"
        print(line)

        if bl_b == 0:
            print("    bwd gated off (block model)")
            continue
        ltb = jax.jit(functools.partial(_pallas_attention_ltiled_bwd,
                                        num_heads=H, **kw))

        def xlab(q_, k_, v_, m_, do_):
            f = lambda a, b, c: fused_attention_reference(  # noqa: E731
                a, b, c, m_, H, **kw)
            return jax.vjp(f, q_, k_, v_)[1](do_)
        xb = jax.jit(xlab)
        try:
            g = ltb(q, k, v, mask, do)
        except Exception as e:  # noqa: BLE001
            print(f"    bwd COMPILE FAIL: {type(e).__name__}: {str(e)[:300]}")
            continue
        wg = xb(q, k, v, mask, do)
        berr = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                         - b.astype(jnp.float32))))
                   for a, b in zip(g, wg))
        line = (f"    bwd max|Δ|={berr:.4f}  "
                f"ltiled {timeit(ltb, q, k, v, mask, do):.2f} ms  "
                f"xla {timeit(xb, q, k, v, mask, do):.2f} ms")
        if _perhead_fits(S, S, hd, has_bias, rate, 2, True, False):
            phb = jax.jit(functools.partial(_pallas_attention_perhead_bwd,
                                            num_heads=H, **kw))
            line += f"  perhead {timeit(phb, q, k, v, mask, do):.2f} ms"
        print(line)


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [604, 704, 1024]
    for S in sizes:
        probe(S, B=50 if S <= 704 else 16)


if __name__ == "__main__":
    main()
