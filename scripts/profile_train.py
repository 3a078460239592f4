"""Profile the flagship train step on the TPU and print top HLO ops by
self time (parsed from the xplane trace via xprof/tensorboard tooling)."""

import glob
import os
import shutil
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/vlpet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = "/tmp/vlpet_train_trace"


def build():
    from __graft_entry__ import _batch, _flagship_cfg
    from vlpet_tpu.models.vlbart import VLBart
    from vlpet_tpu.pet.modules import PetContext
    from vlpet_tpu.train.freezing import split_params, trainable_mask
    from vlpet_tpu.train.optim import build_optimizer
    from vlpet_tpu.train.steps import TrainState, make_train_step

    import dataclasses
    if "t5" in sys.argv[1:]:  # profile the T5 flagship (bench.py's 2nd metric)
        from __graft_entry__ import _flagship_t5_cfg
        from vlpet_tpu.models.t5 import VLT5
        cfg, tasks = _flagship_t5_cfg()
        cfg = dataclasses.replace(cfg, dtype="bfloat16")
        model = VLT5(cfg)
        B = 300
    else:
        cfg, tasks = _flagship_cfg()
        cfg = dataclasses.replace(cfg, dtype="bfloat16")
        if "scan" in sys.argv[1:]:  # profile the scan-over-layers variant
            cfg = dataclasses.replace(cfg, scan_layers=True)
        if "remat_dots" in sys.argv[1:]:
            cfg = dataclasses.replace(cfg, remat="dots")
        if "remat_full" in sys.argv[1:]:
            cfg = dataclasses.replace(cfg, remat="full")
        model = VLBart(cfg)
        B = 500
    L_txt, L_tgt = 20, 10
    if "video" in sys.argv[1:]:
        # video-QA joint shapes: 64 CLIP-ViT frames (feat_dim 512) + 540
        # text tokens = S 604, batch 50 (scripts/video-text recipes) —
        # same construction as bench_step_variants.py video_* variants
        from vlpet_tpu.models.t5 import VLT5
        from vlpet_tpu.models.vlbart import VLBart as _VLBart
        B, L_txt = 50, 540
        cfg = dataclasses.replace(
            cfg, vis=dataclasses.replace(cfg.vis, feat_dim=512, n_boxes=64))
        model = (VLT5 if cfg.is_t5 else _VLBart)(cfg)
    batch = _batch(cfg, B=B, L_txt=L_txt, L_tgt=L_tgt)
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), batch["input_ids"], batch["attention_mask"],
        vis_feats=batch["vis_feats"], boxes=batch["boxes"],
        labels=batch["target_ids"], ctx=PetContext())["params"])()
    mask = trainable_mask(params, cfg.pet)
    trainable, frozen = split_params(params, mask)
    tx = build_optimizer(trainable, lr=1e-3, total_steps=1000)
    state = TrainState.create(trainable, tx)
    step = make_train_step(model, tx, tasks)
    return step, state, frozen, batch


def summarize(trace_dir, top=40):
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    xplanes = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                        recursive=True)
    assert xplanes, f"no xplane under {trace_dir}"
    data = None
    for tool in ("hlo_op_stats", "hlo_stats"):
        try:
            data, _ = rtd.xspace_to_tool_data(xplanes, tool, {})
        except Exception as e:
            err = e
            data = None
        if data is not None:
            break
    else:
        if data is None:
            raise err
    import json

    if isinstance(data, bytes):
        data = data.decode()
    rows = json.loads(data)
    # gviz table format: {cols: [...], rows: [{c: [{v: ...}, ...]}]}
    if isinstance(rows, dict) and "rows" in rows:
        cols = [c.get("label") or c.get("id") for c in rows["cols"]]
        out = []
        for r in rows["rows"]:
            out.append({c: (cell or {}).get("v") for c, cell in zip(cols, r["c"])})
        rows = out
    # pick name + self time columns heuristically
    keys = rows[0].keys() if rows else []
    print("columns:", list(keys))
    def get(r, *names):
        for n in names:
            for k in r:
                if n.lower() in str(k).lower():
                    return r[k]
        return None
    optext = "optext" in sys.argv[1:]  # include truncated HLO op text
    stats = []
    for r in rows:
        name = get(r, "hlo op name", "op name", "name", "hlo_op")
        cat = get(r, "category")
        t = get(r, "total self time (us)", "self time (us)", "self_time", "self time")
        occ = get(r, "occurrences", "#occur")
        gflops = get(r, "model gflop")
        bw = get(r, "measured memory bw")
        bound = get(r, "bound by")
        dma = get(r, "stalled by dma")
        if name is None or t is None:
            continue
        try:
            t = float(t)
        except (TypeError, ValueError):
            continue
        text = get(r, "hlo op text") if optext else None
        stats.append((t, name, cat, occ, gflops, bw, bound, dma, text))
    stats.sort(reverse=True)
    total = sum(t for t, *_ in stats)
    print(f"total self time: {total/1000:.1f} ms (over traced window)")
    by_cat = {}
    for t, _, cat, *_ in stats:
        by_cat[cat] = by_cat.get(cat, 0.0) + t
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  category {str(cat):28s} {t/1000:8.3f} ms  {100*t/total:5.1f}%")
    for t, name, cat, occ, gflops, bw, bound, dma, text in stats[:top]:
        extra = f" {gflops} GF/s, {bw} GiB/s, {bound}, dma-stall {dma}%"
        print(f"{t/1000:9.3f} ms  {100*t/total:5.1f}%  [{cat}] x{occ} "
              f"{str(name)[:70]} |{extra}")
        if text:
            print(f"           {str(text)[:300]}")


def main():
    step, state, frozen, batch = build()
    rng = jax.random.key(0, impl="rbg")
    for _ in range(3):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, frozen, batch, sub, 0)
    float(jnp.asarray(metrics["loss"]))

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, frozen, batch, sub, 0)
        float(jnp.asarray(metrics["loss"]))

    t0 = time.perf_counter()
    for _ in range(10):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, frozen, batch, sub, 0)
    float(jnp.asarray(metrics["loss"]))
    dt = time.perf_counter() - t0
    B = int(batch["input_ids"].shape[0])
    print(f"step time: {dt/10*1000:.1f} ms -> {B*10/dt:.0f} ex/s")
    summarize(TRACE_DIR)


if __name__ == "__main__":
    main()
