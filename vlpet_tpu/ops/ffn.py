"""Fused transformer FFN (fc1 → act → fc2) as a Pallas TPU kernel, fwd + bwd.

Motivation (scripts/profile_train.py at flagship shapes): XLA runs the fc2
GEMMs at ~74 TF/s (38% of v5e peak) because the gelu chain is fused into the
GEMM as a VPU prologue/epilogue, and the (28000, 3072) hidden activation
round-trips HBM between fc1 and fc2 — 22 ms/step across the 6 encoder
layers. This kernel keeps both weight matrices and the hidden tile resident
in VMEM, computes gelu in fp32 in-register, and saves NOTHING for the
backward (the bwd kernel recomputes fc1 — one extra MXU pass beats reading
a 172 MB residual back from HBM, and beats XLA's four-tensor save set that
the save-light gelu already shrank).

Scope / guards (enforced by `ffn_supported`):
* weight MATRICES are frozen (every published PET recipe): the custom_vjp
  returns zero cotangents for w1/w2, so the kernel is gated off under
  ``unfreeze_language_model``. BIASES get TRUE cotangents (db1/db2
  accumulate across the sequential bwd grid) — LoRA and the
  unfreeze_*bias recipes train fc biases while weights stay frozen.
* activation dropout (when configured) is FUSED IN via the hash mask
  (ops/hashdrop.py), regenerated in the backward — not excluded.
* activation ∈ {gelu (erf), gelu_new (tanh), relu}.

Layout: x (N, D) bf16; w1 (D, F), b1 (F,), w2 (F, D), b2 (D,) — any float
dtype (cast to bf16 for the MXU, fp32 accumulation via preferred_element_type).

Reference behavior: my_transformers/modeling_bart.py:1122-1388 fc1/fc2.
"""

from __future__ import annotations

import contextlib
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vlpet_tpu.ops.hashdrop import keep_mask

Array = jax.Array

_SQRT_HALF = math.sqrt(0.5)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)
_SQRT_2_OVER_PI = math.sqrt(2.0 / math.pi)

ACTS = ("gelu", "gelu_new", "relu")

# tests monkeypatch this to run the kernels in interpreter mode on CPU
_INTERPRET = False


def _erf(x):
    """Abramowitz–Stegun 7.1.26 rational erf (max abs err 1.5e-7 — below
    bf16 resolution); Mosaic lowers neither lax.erf nor lax.erfc."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _act(h, kind: str):
    if kind == "gelu":
        return 0.5 * h * (1.0 + _erf(h * _SQRT_HALF))
    if kind == "gelu_new":
        t = jnp.tanh(_SQRT_2_OVER_PI * (h + 0.044715 * h * h * h))
        return 0.5 * h * (1.0 + t)
    return jnp.maximum(h, 0.0)


def _act_grad(h, kind: str):
    if kind == "gelu":
        cdf = 0.5 * (1.0 + _erf(h * _SQRT_HALF))
        pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * h * h)
        return cdf + h * pdf
    if kind == "gelu_new":
        inner = _SQRT_2_OVER_PI * (h + 0.044715 * h * h * h)
        t = jnp.tanh(inner)
        dinner = _SQRT_2_OVER_PI * (1.0 + 3.0 * 0.044715 * h * h)
        return 0.5 * (1.0 + t) + 0.5 * h * (1.0 - t * t) * dinner
    return (h > 0.0).astype(h.dtype)


_LEGAL_ROW_TILES = (8, 16, 32, 64, 128, 256, 512)
_ROW_TILE_OVERRIDE: Optional[int] = None


def _validate_row_tile(value) -> Optional[int]:
    """Parse a pinned row tile; warn and return None on anything outside
    the hardware-probed power-of-two set."""
    import warnings

    try:
        tb = int(value)
    except (TypeError, ValueError):
        tb = -1
    if tb in _LEGAL_ROW_TILES:
        return tb
    warnings.warn(
        f"VLPET_FFN_ROW_TILE={value!r} is invalid (must be one of "
        f"{_LEGAL_ROW_TILES} — non-power-of-two tiles blow the Mosaic "
        "scoped-vmem stack); falling back to the VMEM model.")
    return None


@contextlib.contextmanager
def row_tile_override(tb: Optional[int]):
    """Scoped row-tile pin, read by ``_row_tile`` at TRACE time.

    The Trainer's scoped-vmem auto-retry uses this instead of mutating
    os.environ process-globally (advisor r4: a permanent env-var pin
    degraded every later trace, including flagship shapes where tile 128
    is measured optimal, and leaked into other Trainer instances)."""
    global _ROW_TILE_OVERRIDE
    if tb is not None and tb not in _LEGAL_ROW_TILES:
        raise ValueError(f"row tile {tb!r} not in {_LEGAL_ROW_TILES}")
    prev = _ROW_TILE_OVERRIDE
    _ROW_TILE_OVERRIDE = tb
    try:
        yield
    finally:
        _ROW_TILE_OVERRIDE = prev


def _row_tile(n: int, d: int, f: int, budget_mb: float = 13.0,
              n_w: int = 2, hid_f32: int = 1) -> int:
    """Largest row tile whose VMEM residency (weights + x/h/y tiles) fits.

    ``n_w`` weight matrices of d×f bf16 stay resident; ``hid_f32`` counts
    the fp32 (·, f) hidden intermediates live at once (2 for the gated
    variant: both wi_0 and wi_1 products).

    Power-of-two tiles only: Mosaic's scoped-vmem stack allocation blows
    past the 16 MB limit for other sizes (tb 80/112/160 all fail compile
    where 128 fits — scripts/probe_ffn_tile.py).

    ``VLPET_FFN_ROW_TILE`` env var pins the tile explicitly. Escape hatch
    for a CONTEXT-DEPENDENT Mosaic stack blow-up this model cannot
    predict (PERF.md r4 "S=1024" note): the identical bwd kernel at
    N=16384 compiles inside one step graph (XLA attention neighbors) and
    exceeds scoped vmem by 0.8-3.7 MB inside another (Pallas attention
    neighbors), while N=30208/35200 compile in both. At the affected
    video S=1024 shape, VLPET_FFN_ROW_TILE=32 runs the full Pallas step
    at 169.4 ex/s — 9% above the best alternative. On self-managed TPU
    VMs, raising the limit itself (LIBTPU_INIT_ARGS
    --xla_tpu_scoped_vmem_limit_kib) is the cleaner lever; the tunneled
    terminal here pins LIBTPU_INIT_ARGS, so the tile override stands in.

    Pinned values are validated: only the probed power-of-two set is
    accepted — a non-power-of-two pin would silently reintroduce the
    Mosaic stack blow-up above, and a non-integer would crash the trace."""
    import os

    if _ROW_TILE_OVERRIDE is not None:
        return _ROW_TILE_OVERRIDE
    pinned = os.environ.get("VLPET_FFN_ROW_TILE")
    if pinned:
        tb = _validate_row_tile(pinned)
        if tb is not None:
            return tb
    weights = 2 * n_w * d * f  # bf16
    for tb in (512, 256, 128, 64, 32, 16, 8):
        tile = tb * (d * 2 + f * 4 * hid_f32 + f * 2 + d * 4)
        if weights + tile <= budget_mb * 1024 * 1024:
            return tb
    return 8


def _fwd_kernel(act: str, rate: float, *refs):
    if rate > 0.0:
        seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref = refs
    else:
        x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref = refs
    h = jax.lax.dot_general(x_ref[...], w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = _act(h + b1_ref[...].astype(jnp.float32), act)
    if rate > 0.0:
        # activation dropout fused in; the mask is a hash of the global
        # element index (ops/hashdrop.py) — regenerated in the backward
        row_base = pl.program_id(0) * x_ref.shape[0]
        keep = keep_mask(h.shape, row_base, seed_ref[0], rate)
        h = jnp.where(keep, h * (1.0 / (1.0 - rate)), 0.0)
    h = h.astype(x_ref.dtype)
    y = jax.lax.dot_general(h, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y_ref[...] = (y + b2_ref[...].astype(jnp.float32)).astype(y_ref.dtype)


def _bwd_kernel(act: str, rate: float, *refs):
    if rate > 0.0:
        seed_ref, x_ref, dy_ref, w1_ref, b1_ref, w2_ref, dx_ref, db1_ref, db2_ref = refs
    else:
        x_ref, dy_ref, w1_ref, b1_ref, w2_ref, dx_ref, db1_ref, db2_ref = refs
    pid = pl.program_id(0)
    # recompute fc1 (one extra MXU pass — no residual reads)
    h = jax.lax.dot_general(x_ref[...], w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    dyf = dy_ref[...].astype(jnp.float32)
    dh = jax.lax.dot_general(dy_ref[...], w2_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if rate > 0.0:
        row_base = pid * x_ref.shape[0]
        keep = keep_mask(dh.shape, row_base, seed_ref[0], rate)
        dh = jnp.where(keep, dh * (1.0 / (1.0 - rate)), 0.0)
    dsf = dh * _act_grad(h, act)
    ds = dsf.astype(x_ref.dtype)
    dx = jax.lax.dot_general(ds, w1_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dx_ref[...] = dx.astype(dx_ref.dtype)
    # true bias cotangents: db1 = Σ_rows ds, db2 = Σ_rows dy — LoRA and the
    # unfreeze_*bias recipes train fc biases while weights stay frozen.
    # Accumulate across the sequential grid (padded rows contribute 0: dy is
    # zero-padded, so dh/ds vanish there too).

    @pl.when(pid == 0)
    def _init():
        db1_ref[...] = jnp.zeros_like(db1_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    db1_ref[...] += jnp.sum(dsf, axis=0)[None]
    db2_ref[...] += jnp.sum(dyf, axis=0)[None]


def _pad_rows(x: Array, tb: int):
    n = x.shape[0]
    rem = n % tb
    if rem == 0:
        return x, n
    pad = tb - rem
    return jnp.pad(x, ((0, pad), (0, 0))), n


def _run(kernel, act, row_inputs, full_inputs, d_hidden, out_dim,
         rate: float = 0.0, seed=None, acc_dims=(), n_w: int = 2,
         hid_f32: int = 1):
    """row_inputs are (N, ·) tensors sliced per grid row-tile; full_inputs
    (weights/biases) live whole in VMEM across the sequential grid.

    N is padded to the row tile explicitly (a ~2.5 ms/step pad+slice cost
    at flagship shapes — hlo_stats). Cheaper alternatives were tried and
    rejected on hardware: non-power-of-two tiles that divide N exactly
    (80/112/160) blow Mosaic's 16 MB scoped-vmem stack where 128 fits,
    and a pl.cdiv ragged grid hangs the Mosaic compile outright
    (scripts/probe_ffn_tile.py)."""
    n0 = row_inputs[0].shape[0]
    d = row_inputs[0].shape[1]
    tb = _row_tile(n0, d, d_hidden, n_w=n_w, hid_f32=hid_f32)
    padded = []
    for t in row_inputs:
        t, _ = _pad_rows(t, tb)
        padded.append(t)
    N = padded[0].shape[0]
    ms = pl.ANY if _INTERPRET else pltpu.VMEM
    row_specs = [pl.BlockSpec((tb, t.shape[1]), lambda i: (i, 0),
                              memory_space=ms) for t in padded]
    out_specs = [pl.BlockSpec((tb, out_dim), lambda i: (i, 0), memory_space=ms)]
    out_shapes = [jax.ShapeDtypeStruct((N, out_dim), row_inputs[0].dtype)]
    # grid-accumulated (1, dim) fp32 outputs (bias cotangents in the bwd)
    for dim in acc_dims:
        out_specs.append(pl.BlockSpec((1, dim), lambda i: (0, 0),
                                      memory_space=ms))
        out_shapes.append(jax.ShapeDtypeStruct((1, dim), jnp.float32))
    full_specs = [pl.BlockSpec(t.shape, (lambda nd: lambda i: (0,) * nd)(t.ndim),
                               memory_space=ms) for t in full_inputs]
    pre_specs, pre_args = [], []
    if rate > 0.0:
        pre_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        pre_args = [seed]
    out = pl.pallas_call(
        functools.partial(kernel, act, rate),
        grid=(N // tb,),
        in_specs=pre_specs + row_specs + full_specs,
        out_specs=out_specs[0] if not acc_dims else tuple(out_specs),
        out_shape=out_shapes[0] if not acc_dims else tuple(out_shapes),
        interpret=_INTERPRET,
    )(*pre_args, *padded, *full_inputs)
    if not acc_dims:
        return out[:n0] if N != n0 else out
    y, *accs = out
    return (y[:n0] if N != n0 else y, *accs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_ffn(x: Array, w1: Array, b1: Array, w2: Array, b2: Array,
              act: str = "gelu", rate: float = 0.0,
              seed: Optional[Array] = None) -> Array:
    """y = drop(act(x @ w1 + b1); rate) @ w2 + b2. Weight matrices are
    frozen (zero cotangents — gated by ``ffn_supported``); biases receive
    TRUE cotangents (trainable under LoRA / unfreeze_*bias recipes).

    x (N, D) bf16; w1 (D, F); b1 (F,); w2 (F, D); b2 (D,). ``rate`` > 0
    fuses activation dropout in (seed (1,) int32 drives the hash mask,
    regenerated in the backward — ops/hashdrop.py)."""
    w1 = w1.astype(x.dtype)
    w2 = w2.astype(x.dtype)
    return _run(_fwd_kernel, act, [x], [w1, b1, w2, b2],
                w1.shape[1], w2.shape[1], rate, seed)


def _fwd(x, w1, b1, w2, b2, act, rate, seed):
    y = fused_ffn(x, w1, b1, w2, b2, act, rate, seed)
    return y, (x, w1, b1, w2, b2, seed)


def _bwd(act, rate, res, dy):
    x, w1, b1, w2, b2, seed = res
    dx, db1, db2 = _run(
        _bwd_kernel, act, [x, dy.astype(x.dtype)],
        [w1.astype(x.dtype), b1, w2.astype(x.dtype)],
        w1.shape[1], w1.shape[0], rate, seed,
        acc_dims=(w1.shape[1], w2.shape[1]))
    return (dx, jnp.zeros_like(w1), db1.reshape(b1.shape).astype(b1.dtype),
            jnp.zeros_like(w2), db2.reshape(b2.shape).astype(b2.dtype), None)


fused_ffn.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Gated variant: y = drop(act(x @ w0) * (x @ w1)) @ wo  (t5-1.1 gated-gelu,
# reference: my_transformers/modeling_t5.py:270 T5DenseGatedGeluDense).
# T5 dense layers carry no biases, so only dx is emitted; weights are frozen
# (guarded by ffn_supported, same rule as the 2-matrix kernel).
# ---------------------------------------------------------------------------


def _gated_fwd_kernel(act: str, rate: float, *refs):
    if rate > 0.0:
        seed_ref, x_ref, w0_ref, w1_ref, wo_ref, y_ref = refs
    else:
        x_ref, w0_ref, w1_ref, wo_ref, y_ref = refs
    h0 = jax.lax.dot_general(x_ref[...], w0_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    h1 = jax.lax.dot_general(x_ref[...], w1_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    g = _act(h0, act) * h1
    if rate > 0.0:
        row_base = pl.program_id(0) * x_ref.shape[0]
        keep = keep_mask(g.shape, row_base, seed_ref[0], rate)
        g = jnp.where(keep, g * (1.0 / (1.0 - rate)), 0.0)
    y = jax.lax.dot_general(g.astype(x_ref.dtype), wo_ref[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _gated_bwd_kernel(act: str, rate: float, *refs):
    if rate > 0.0:
        seed_ref, x_ref, dy_ref, w0_ref, w1_ref, wo_ref, dx_ref = refs
    else:
        x_ref, dy_ref, w0_ref, w1_ref, wo_ref, dx_ref = refs
    pid = pl.program_id(0)
    # recompute both wi products (two extra MXU passes — nothing saved)
    h0 = jax.lax.dot_general(x_ref[...], w0_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    h1 = jax.lax.dot_general(x_ref[...], w1_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dg = jax.lax.dot_general(dy_ref[...], wo_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if rate > 0.0:
        row_base = pid * x_ref.shape[0]
        keep = keep_mask(dg.shape, row_base, seed_ref[0], rate)
        dg = jnp.where(keep, dg * (1.0 / (1.0 - rate)), 0.0)
    a = _act(h0, act)
    dh0 = (dg * h1 * _act_grad(h0, act)).astype(x_ref.dtype)
    dh1 = (dg * a).astype(x_ref.dtype)
    dx = jax.lax.dot_general(dh0, w0_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dx += jax.lax.dot_general(dh1, w1_ref[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dx_ref[...] = dx.astype(dx_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_gated_ffn(x: Array, w0: Array, w1: Array, wo: Array,
                    act: str = "gelu_new", rate: float = 0.0,
                    seed: Optional[Array] = None) -> Array:
    """y = drop(act(x @ w0) * (x @ w1); rate) @ wo with frozen weights
    (zero cotangents — gate with ``ffn_supported``). x (N, D); w0/w1 (D, F);
    wo (F, D). ``rate`` > 0 fuses the hidden dropout via the hash mask."""
    w0 = w0.astype(x.dtype)
    w1 = w1.astype(x.dtype)
    wo = wo.astype(x.dtype)
    return _run(_gated_fwd_kernel, act, [x], [w0, w1, wo], w0.shape[1],
                wo.shape[1], rate, seed, n_w=3, hid_f32=2)


def _gated_fwd(x, w0, w1, wo, act, rate, seed):
    y = fused_gated_ffn(x, w0, w1, wo, act, rate, seed)
    return y, (x, w0, w1, wo, seed)


def _gated_bwd(act, rate, res, dy):
    x, w0, w1, wo, seed = res
    dx = _run(_gated_bwd_kernel, act, [x, dy.astype(x.dtype)],
              [w0.astype(x.dtype), w1.astype(x.dtype), wo.astype(x.dtype)],
              w0.shape[1], w0.shape[0], rate, seed, n_w=3, hid_f32=2)
    return (dx, jnp.zeros_like(w0), jnp.zeros_like(w1), jnp.zeros_like(wo),
            None)


fused_gated_ffn.defvjp(_gated_fwd, _gated_bwd)


def ffn_supported(cfg, act: str) -> bool:
    """Kernel applicability: TPU backend, bf16 compute, supported
    activation, frozen language-model WEIGHT MATRICES (the custom_vjp
    returns zero w1/w2 cotangents; biases get true cotangents, so LoRA /
    unfreeze_*bias recipes are safe). Activation dropout is fused in via
    the hash mask when configured, not excluded."""
    p = cfg.pet
    return (jax.default_backend() not in ("cpu",)
            and cfg.dtype == "bfloat16"
            and act in ACTS
            and not p.unfreeze_language_model)
