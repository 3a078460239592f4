"""Pallas kernel correctness (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from vlpet_tpu.ops.fused_pet import (
    _pallas_forward,
    fused_epilogue_reference,
    fused_multihead_adapter_gate,
)


def make_inputs(M=64, d=128, r=32, g=32, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.05, dtype)
    return (mk(M, d), mk(M, d), mk(d, r), mk(r), mk(r, d), mk(d),
            mk(d, g), mk(g), mk(g, d), mk(d))


def test_kernel_matches_reference_interpret():
    args = make_inputs()
    got = _pallas_forward(*args, interpret=True)
    want = fused_epilogue_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_custom_vjp_grads_match_reference():
    args = make_inputs(M=32, d=128, r=32, g=32)

    def loss_k(*a):
        return fused_multihead_adapter_gate(*a).sum()

    def loss_r(*a):
        return fused_epilogue_reference(*a).sum()

    # forward kernel runs in interpret mode on CPU via the pallas interpreter
    # — patch through interpret by calling _pallas_forward in fwd is not
    # configurable here, so compare backward only (backward never touches
    # pallas: it is the VJP of the reference)
    g_ref = jax.grad(loss_r, argnums=(0, 2, 4, 6, 8))(*args)
    import vlpet_tpu.ops.fused_pet as fp
    orig = fp._pallas_forward
    fp._pallas_forward = lambda *a, **k: orig(*a, interpret=True)
    try:
        g_k = jax.grad(loss_k, argnums=(0, 2, 4, 6, 8))(*args)
    finally:
        fp._pallas_forward = orig
    for a, b in zip(g_k, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
