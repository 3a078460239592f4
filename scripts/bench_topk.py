"""Microbench: top-k strategies for the beam-search candidate selection
over (B*K, V) logits on TPU."""

import time
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vlpet_jax_cache")

B, K, V = 500, 5, 50265
k = 2 * K

x = jnp.asarray(np.random.default_rng(0).normal(size=(B * K, V)), jnp.float32)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])[:1]
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])[:1]
    dt = (time.perf_counter() - t0) / 10
    print(f"{name:35s} {dt * 1e3:8.2f} ms")
    return out


r1 = timeit("lax.top_k (B*K, V)", lambda x: jax.lax.top_k(x, k), x)
r2 = timeit("approx_max_k r=0.95",
            lambda x: jax.lax.approx_max_k(x, k, recall_target=0.95), x)
r3 = timeit("approx_max_k r=0.99",
            lambda x: jax.lax.approx_max_k(x, k, recall_target=0.99), x)
try:
    r4 = timeit("approx_max_k r=1.0",
                lambda x: jax.lax.approx_max_k(x, k, recall_target=1.0), x)
except Exception as e:
    print("r=1.0 failed:", e)
    r4 = None

# exactness check vs lax.top_k
v1, i1 = [np.asarray(a) for a in r1]
for name, r in (("r95", r2), ("r99", r3), ("r100", r4)):
    if r is None:
        continue
    v2, i2 = [np.asarray(a) for a in r]
    match = np.mean([np.intersect1d(i1[j], i2[j]).size / k
                     for j in range(0, B * K, 97)])
    print(f"{name}: recall vs exact = {match:.6f}")

# joint flavor (old path): top_k over (B, K*V)
xj = x.reshape(B, K * V)
timeit("lax.top_k (B, K*V) joint", lambda x: jax.lax.top_k(x, k), xj)
# sort-based
timeit("full sort top-k", lambda x: jax.lax.sort(x)[:, -k:], x)

# --- r3: two-stage variants (kill the aggregate sort over ~1664 cands) ---
def two_stage_topk(x):
    """PartialReduce candidates (no aggregate sort), then exact top-k over
    the small candidate set; compose indices."""
    vc, ic = jax.lax.approx_max_k(x, k, recall_target=0.99,
                                  aggregate_to_topk=False)
    vals, sub = jax.lax.top_k(vc, k)
    toks = jnp.take_along_axis(ic, sub, axis=1)
    return vals, toks


def two_stage_sort(x):
    """PartialReduce candidates, then aggregate via variadic sort of the
    small (B*K, n_cand) set."""
    vc, ic = jax.lax.approx_max_k(x, k, recall_target=0.99,
                                  aggregate_to_topk=False)
    sv, si = jax.lax.sort((-vc, ic), num_keys=1)
    return -sv[:, :k], si[:, :k]


r5 = timeit("2-stage: PR + top_k(cand)", two_stage_topk, x)
r6 = timeit("2-stage: PR + sort(cand)", two_stage_sort, x)
for name, r in (("2stage_topk", r5), ("2stage_sort", r6)):
    v2, i2 = [np.asarray(a) for a in r]
    match = np.mean([np.intersect1d(i1[j], i2[j]).size / k
                     for j in range(0, B * K, 97)])
    print(f"{name}: recall vs exact = {match:.6f}, "
          f"vals equal = {np.allclose(np.sort(v2, axis=1), np.sort(v1, axis=1))}")
