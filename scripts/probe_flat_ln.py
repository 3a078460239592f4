"""Hardware probe: flat-row fused-LN backward across R values (advisor r3).

The `_flat_rows` budget (11 co-resident f32 block copies at a 0.8 margin,
ops/fused_ln.py) was fitted at two shapes (R=280 and R=200 @ D=768); this
probe walks R up to the model's cap — including values near it that a
large legal divisor of B·L could select in production — and confirms each
compiles and runs, or finds the real ceiling so the constant can be
corrected. Run, then record the dated result in PERF.md.

Run: python scripts/probe_flat_ln.py [R ...]   (default: 56..392 @ D=768)
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

import vlpet_tpu.ops.fused_ln as FL  # noqa: E402


def main():
    D = 768
    cap = int((FL._VMEM_LIMIT * 0.8) // (11 * D * 4))
    rs = [int(a) for a in sys.argv[1:]] or [56, 128, 200, 256, 320,
                                            (cap // 8) * 8]
    print(f"model cap at D={D}: R<={cap} (largest legal: {(cap // 8) * 8})")
    rng = np.random.default_rng(0)
    seed = jnp.asarray([7], jnp.int32)
    for R in rs:
        # 3-D (B, L, D) like the model call sites; B*L = 13R rows so the
        # monkeypatched block R divides the flat row view exactly
        h = jnp.asarray(rng.normal(size=(13, R, D)) * 0.1, jnp.float32)
        res = jnp.asarray(rng.normal(size=(13, R, D)) * 0.1, jnp.float32)
        gamma = jnp.ones((D,), jnp.float32)
        dy = jnp.asarray(rng.normal(size=(13, R, D)), jnp.float32)
        N = 13 * R
        orig = FL._flat_rows
        FL._flat_rows = lambda n, d, _r=R: _r
        try:
            f = jax.jit(lambda h, res, gamma, dy: FL._bwd_call(
                h, res, gamma, seed, dy, 0.1, 1e-6))
            out = f(h, res, gamma, dy)
            float(jnp.asarray(out[0].ravel()[0]))
            t0 = time.perf_counter()
            for _ in range(20):
                out = f(h, res, gamma, dy)
            float(jnp.asarray(out[0].ravel()[0]))
            dt = (time.perf_counter() - t0) / 20
            print(f"R={R} (N={N}): OK {dt*1e3:.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"R={R} (N={N}): FAIL {type(e).__name__} {str(e)[:200]}",
                  flush=True)
        finally:
            FL._flat_rows = orig


if __name__ == "__main__":
    main()
