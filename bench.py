"""Benchmark: fine-tune throughput of the flagship configs on one TPU chip.

Measures examples/sec of the full training step (forward + backward + clip +
AdamW) for BOTH flagship recipes:

* BART-base + VL-PET-large multitask image-text (headline; batch 500,
  20 text tokens, 36 visual boxes @2048-d, 10 target tokens —
  scripts/image-text/VL-PET-large.sh)
* T5-base + VL-PET-large (batch 300, r 192 —
  scripts/image-text/T5-VL-PET-large.sh)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
BART headline, plus "t5_examples_per_sec" / "t5_vs_bart",
"beam5_decode_examples_per_sec" (caption eval protocol) and
"video_examples_per_sec" (video-QA joint shapes, S≈604) so the driver
record captures every flagship surface.

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


def bench_step(cfg, tasks, B: int, n_steps: int = 10, windows: int = 3,
               L_txt: int = 20) -> float:
    """examples/sec of the full train step for one model config."""
    import dataclasses

    from __graft_entry__ import _batch
    from vlpet_tpu.models.t5 import VLT5
    from vlpet_tpu.models.vlbart import VLBart
    from vlpet_tpu.pet.modules import PetContext
    from vlpet_tpu.train.freezing import split_params, trainable_mask
    from vlpet_tpu.train.optim import build_optimizer
    from vlpet_tpu.train.steps import TrainState, make_train_step

    # MXU-native bf16 compute; Pallas fused attention/FFN/LN default on TPU
    cfg = dataclasses.replace(cfg, dtype="bfloat16")
    model = VLT5(cfg) if cfg.is_t5 else VLBart(cfg)
    batch = _batch(cfg, B=B, L_txt=L_txt, L_tgt=10)

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
    for _ in range(3):  # warmup / compile
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, frozen, batch, sub, 0)
    float(jnp.asarray(metrics["loss"]))

    # Timing on the tunneled 'axon' platform: block_until_ready can return
    # early and a host fetch costs a ~27ms round trip, so dispatch n_steps
    # asynchronously (they pipeline on device) and synchronize ONCE via a
    # data-dependent scalar fetch from the final state. Best-of-N windows
    # (device/tunnel throughput is noisy across sessions).
    best_dt = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, frozen, batch, sub, 0)
        float(jnp.asarray(metrics["loss"]))
        best_dt = min(best_dt, time.perf_counter() - t0)
    return B * n_steps / best_dt


def bench_beam(cfg, B=500, beams=5, max_length=40, iters=3):
    """Beam-5 caption-eval decode throughput (the published eval protocol:
    scripts/image-text/VL-PET-large.sh num_beams 5, gen_max_length 40)."""
    import dataclasses

    from __graft_entry__ import _batch
    from vlpet_tpu.models.generate import seq2seq_generate
    from vlpet_tpu.models.vlbart import VLBart
    from vlpet_tpu.pet.modules import PetContext

    cfg = dataclasses.replace(cfg, dtype="bfloat16")
    model = VLBart(cfg)
    batch = _batch(cfg, B=B, L_txt=20, L_tgt=10)
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), batch["input_ids"], batch["attention_mask"],
        vis_feats=batch["vis_feats"], boxes=batch["boxes"],
        labels=batch["target_ids"], ctx=PetContext()))()
    ctx = PetContext(task="caption", task_idx=3)
    fn = jax.jit(lambda p, b: seq2seq_generate(
        model, p, input_ids=b["input_ids"],
        attention_mask=b["attention_mask"], vis_feats=b["vis_feats"],
        boxes=b["boxes"], ctx=ctx, num_beams=beams, max_length=max_length))
    out = fn(params, batch)
    _ = int(jnp.asarray(out[0, 0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, batch)
    _ = int(jnp.asarray(out[0, 0]))
    return B * iters / (time.perf_counter() - t0)


def main():
    from __graft_entry__ import _flagship_cfg, _flagship_t5_cfg

    cfg, tasks = _flagship_cfg()
    bart_ex = bench_step(cfg, tasks, B=500)

    t5_cfg, t5_tasks = _flagship_t5_cfg()
    t5_ex = bench_step(t5_cfg, t5_tasks, B=300)

    try:
        beam_ex = round(bench_beam(cfg), 2)
    except Exception:
        # keep the headline metrics flowing, but a null here must be
        # diagnosable — print the real failure to stderr
        import traceback

        traceback.print_exc()
        beam_ex = None

    try:
        # video-QA joint shapes: 64 CLIP-ViT frames (feat_dim 512) + 540
        # text tokens = S 604, batch 50 (scripts/video-text recipes) —
        # the long-sequence kernel routes (PERF.md "Long-sequence shapes")
        import dataclasses

        video_cfg = dataclasses.replace(
            cfg, vis=dataclasses.replace(cfg.vis, feat_dim=512, n_boxes=64))
        video_ex = round(bench_step(video_cfg, tasks, B=50, L_txt=540), 2)
    except Exception:
        import traceback

        traceback.print_exc()
        video_ex = None

    print(json.dumps({
        "metric": "train_examples_per_sec_per_chip (BART-base VL-PET-large multitask)",
        "value": round(bart_ex, 2),
        "unit": "examples/sec/chip",
        "vs_baseline": round(bart_ex / A100_EST_EX_PER_SEC, 3),
        "t5_examples_per_sec": round(t5_ex, 2),
        "t5_vs_bart": round(t5_ex / bart_ex, 3),
        "beam5_decode_examples_per_sec": beam_ex,
        "video_examples_per_sec": video_ex,
        # the denominator of vs_baseline is derived, not measured — see the
        # module docstring for the derivation
        "vs_baseline_basis": (
            "estimated A100-fp32 155 ex/s (FLOP-derived occupancy estimate, "
            "not measured; reference publishes no throughput)"),
    }))


if __name__ == "__main__":
    main()
