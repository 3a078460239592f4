"""Microbench beam decode-attention formulations + cache-update strategies
on TPU (shapes: B=500 K=J=5 L=40 H=12 Dh=64)."""

import time
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vlpet_jax_cache")

B, K, J, L, H, Dh = 500, 5, 5, 40, 12, 64
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(B * K, 1, H, Dh)), jnp.bfloat16)
kc = jnp.asarray(rng.normal(size=(B * J, L, H, Dh)), jnp.bfloat16)
vc = jnp.asarray(rng.normal(size=(B * J, L, H, Dh)), jnp.bfloat16)
anc = jnp.asarray(rng.integers(0, J, (B, K, L)), jnp.int32)
pos = jnp.asarray(20, jnp.int32)
NEG = -1.0e9


def sel_mask():
    jj = jnp.arange(J)[None, None, :, None]
    ll = jnp.arange(L)[None, None, None, :]
    sel = (anc[:, :, None, :] == jj) & (ll <= pos)
    return jnp.where(sel, 0.0, NEG).astype(jnp.float32)


def attend_4d(q, kc, vc, anc, pos):
    m = sel_mask().reshape(B, 1, K, J * L)
    qb = q.reshape(B, K, H, Dh)
    kb = kc.reshape(B, J * L, H, Dh)
    vb = vc.reshape(B, J * L, H, Dh)
    logits = jnp.einsum("bqhd,bmhd->bhqm", qb, kb,
                        preferred_element_type=jnp.float32) + m
    probs = jax.nn.softmax(logits, axis=-1).astype(qb.dtype)
    return jnp.einsum("bhqm,bmhd->bqhd", probs, vb).reshape(B * K, 1, H * Dh)


def attend_2d_softmax(q, kc, vc, anc, pos):
    m = sel_mask().reshape(B, 1, K, J * L)
    qb = q.reshape(B, K, H, Dh)
    kb = kc.reshape(B, J * L, H, Dh)
    vb = vc.reshape(B, J * L, H, Dh)
    logits = jnp.einsum("bqhd,bmhd->bhqm", qb, kb,
                        preferred_element_type=jnp.float32) + m
    flat = logits.reshape(B * H * K, J * L)
    probs = jax.nn.softmax(flat, axis=-1).reshape(B, H, K, J * L).astype(qb.dtype)
    return jnp.einsum("bhqm,bmhd->bqhd", probs, vb).reshape(B * K, 1, H * Dh)


def attend_merged_rows(q, kc, vc, anc, pos):
    # fold K into the head axis: one (B, H*K) "head" batch, memory (J*L)
    m = sel_mask()  # (B,K,J,L)
    qb = q.reshape(B, K, H, Dh).transpose(0, 2, 1, 3).reshape(B, H * K, Dh)
    kb = kc.reshape(B, J * L, H, Dh)
    logits = jnp.einsum("bed,bmhd->behm", qb.reshape(B, H, K, Dh)[:, :, 0:K, :].reshape(B, H * K, Dh).reshape(B, H, K, Dh).reshape(B, H * K, Dh), kb, preferred_element_type=jnp.float32) if False else None
    return None


def timeit(name, fn):
    f = jax.jit(fn)
    out = f(q, kc, vc, anc, pos)
    _ = np.asarray(out)[:1, :1]
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(q, kc, vc, anc, pos)
    _ = np.asarray(out)[:1, :1]
    dt = (time.perf_counter() - t0) / 20
    print(f"{name:30s} {dt * 1e3:8.3f} ms")


timeit("attend_4d (current)", attend_4d)
timeit("attend_2d_softmax", attend_2d_softmax)

# cache update strategies
k_new = jnp.asarray(rng.normal(size=(B * J, 1, H, Dh)), jnp.bfloat16)


def dus_blhd(kc, k_new, pos):
    return jax.lax.dynamic_update_slice(kc, k_new, (0, pos, 0, 0))


def timeit2(name, fn, *args):
    f = jax.jit(fn, donate_argnums=(0,))
    state = args[0]
    out = f(state, *args[1:])
    _ = np.asarray(out)[:1, :1]
    # re-donate each call
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(out, *args[1:])
    _ = np.asarray(out)[:1, :1]
    dt = (time.perf_counter() - t0) / 20
    print(f"{name:30s} {dt * 1e3:8.3f} ms")


timeit2("dus (B,L,H,Dh) donated", dus_blhd, jnp.copy(kc), k_new, pos)

kc_lmaj = jnp.asarray(rng.normal(size=(L, B * J, H, Dh)), jnp.bfloat16)
k_new_l = jnp.asarray(rng.normal(size=(1, B * J, H, Dh)), jnp.bfloat16)


def dus_lbhd(kc, k_new, pos):
    return jax.lax.dynamic_update_slice(kc, k_new, (pos, 0, 0, 0))


timeit2("dus (L,B,H,Dh) donated", dus_lbhd, kc_lmaj, k_new_l, pos)

# combined: update-then-attend in one jit (what the decode step does)
def step_4d(kc, q, k_new, anc, pos):
    kc = jax.lax.dynamic_update_slice(kc, k_new, (0, pos, 0, 0))
    out = attend_4d(q, kc, kc, anc, pos)
    return kc, out


f = jax.jit(step_4d, donate_argnums=(0,))
state = jnp.copy(kc)
state, out = f(state, q, k_new, anc, pos)
_ = np.asarray(out)[:1, :1]
t0 = time.perf_counter()
for _ in range(20):
    state, out = f(state, q, k_new, anc, pos)
_ = np.asarray(out)[:1, :1]
print(f"{'dus+attend_4d combined':30s} {(time.perf_counter()-t0)/20*1e3:8.3f} ms")
