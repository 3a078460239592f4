"""ops/topk.py — the exact fused top-k + logsumexp kernel behind
models/generate.py topk_lse (the TPU beam/greedy scoring reduction).
Interpret-mode on CPU; the on-hardware exactness guard at the flagship
shape is tests/test_tpu_hardware.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlpet_tpu.ops.topk import _row_block, topk_lse_exact, topk_lse_hier


def test_row_block_selection():
    assert _row_block(2500, 50265) == 10      # flagship beam (B·K)
    assert _row_block(500, 50265) == 10       # flagship greedy
    assert _row_block(1500, 32128) == 15      # T5 beam (B=300, K=5)
    assert _row_block(2503, 50265) == 0       # prime-ish -> fallback
    assert _row_block(7, 50265) == 0


@pytest.mark.parametrize("R,V,k,dtype", [
    (40, 517, 10, jnp.float32),
    (2500, 2051, 10, jnp.float32),   # flagship row count, small vocab
    (48, 1024, 5, jnp.bfloat16),     # bf16 rows cast in-kernel
    (16, 333, 1, jnp.float32),       # greedy k=1
])
def test_matches_lax_top_k(R, V, k, dtype, rng):
    x = jnp.asarray(rng.normal(size=(R, V)), dtype)
    vals, toks, lse = topk_lse_exact(x, k, interpret=True)
    xf = x.astype(jnp.float32)
    ve, te = jax.lax.top_k(xf, k)
    le = jax.scipy.special.logsumexp(xf, axis=-1)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(ve))
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(te))
    np.testing.assert_allclose(np.asarray(lse), np.asarray(le),
                               rtol=1e-6, atol=1e-5)


def test_tie_order_matches_lax_top_k(rng):
    # duplicated values must surface in index order (stable sort semantics)
    x = jnp.asarray(np.tile(rng.normal(size=(1, 40)), (8, 1)).astype(np.float32))
    x = jnp.concatenate([x, x], axis=1)
    vals, toks, _ = topk_lse_exact(x, 6, interpret=True)
    ve, te = jax.lax.top_k(x, 6)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(ve))
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(te))


@pytest.mark.parametrize("R,V,k,dtype", [
    (40, 517, 10, jnp.float32),      # V % 128 != 0 -> in-HBM pad branch
    (2500, 2048, 10, jnp.float32),   # V % 128 == 0 -> no pad
    (48, 1024, 5, jnp.bfloat16),
    (16, 333, 1, jnp.float32),       # greedy k=1
])
def test_hier_matches_lax_top_k(R, V, k, dtype, rng):
    x = jnp.asarray(rng.normal(size=(R, V)), dtype)
    vals, toks, lse = topk_lse_hier(x, k, interpret=True)
    xf = x.astype(jnp.float32)
    ve, te = jax.lax.top_k(xf, k)
    le = jax.scipy.special.logsumexp(xf, axis=-1)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(ve))
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(te))
    np.testing.assert_allclose(np.asarray(lse), np.asarray(le),
                               rtol=1e-6, atol=1e-5)


def test_hier_tie_order_matches_lax_top_k(rng):
    # duplicated values within AND across 128-lane chunks must surface in
    # global index order (the min-chunk/first-occurrence pop rule)
    x = np.tile(rng.normal(size=(1, 128)).astype(np.float32), (8, 3))
    vals, toks, _ = topk_lse_hier(jnp.asarray(x), 3, interpret=True)
    ve, te = jax.lax.top_k(jnp.asarray(x), 3)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(ve))
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(te))


def test_hier_chunk_overflow_falls_back_exact(rng):
    # >_LEVELS of a row's top-k packed into ONE lane column: the count
    # detector must trip and the lax.cond fallback must return the exact
    # answer anyway (this is the correctness guarantee the fast path
    # leans on at ~0.2% of flagship batches)
    R, V, k = 8, 1024, 10
    x = rng.normal(size=(R, V)).astype(np.float32)
    x[3, 2::128] = 50.0 + np.arange(8)       # 8 of row 3's top-10 in lane 2
    x = jnp.asarray(x)
    vals, toks, lse = topk_lse_hier(x, k, interpret=True)
    ve, te = jax.lax.top_k(x, k)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(ve))
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(te))
    np.testing.assert_allclose(
        np.asarray(lse),
        np.asarray(jax.scipy.special.logsumexp(x, axis=-1)),
        rtol=1e-6, atol=1e-5)


def test_fallback_path_exact(rng):
    # no divisor of R in [8, 16] -> lax.top_k branch (still exact)
    x = jnp.asarray(rng.normal(size=(7, 707)).astype(np.float32))
    vals, toks, lse = topk_lse_exact(x, 4)
    ve, te = jax.lax.top_k(x, 4)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(ve))
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(te))
