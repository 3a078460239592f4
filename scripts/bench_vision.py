"""CLIP visual-trunk throughput on the TPU (the raw-image path's encoder).

The raw path (--feature_type raw_clip_*, vision/vis_encoder.py) runs the
CLIP trunk inside the train/eval step; its throughput bounds the raw-image
configs the same way the h5 readers bound the feature configs. Measures
images/sec for the flax trunks in bf16 (NHWC convs on the MXU):

Usage: python scripts/bench_vision.py [--batch 256] [--backbones RN50,ViT-B/32]
       [--train]  (adds the backward: grad of a scalar pooled-sum loss)

One JSON line per backbone.
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vlpet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(backbone: str, batch: int, train: bool, iters=20, windows=3):
    from vlpet_tpu.vision.clip import CLIPVisualEncoder

    enc = CLIPVisualEncoder(backbone=backbone, image_size=224,
                            dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 224, 224, 3)), jnp.float32)
    params = jax.jit(lambda: enc.init(jax.random.PRNGKey(0), x))()

    if train:
        def loss(p, x):
            grid, pooled = enc.apply(p, x, train=False)
            return jnp.sum(pooled.astype(jnp.float32) ** 2)

        fn = jax.jit(lambda p, x: jax.grad(loss)(p, x))

        def run(x):
            g = fn(params, x)
            return jax.tree_util.tree_leaves(g)[0]
    else:
        fn = jax.jit(lambda p, x: enc.apply(p, x, train=False)[1])

        def run(x):
            return fn(params, x)

    out = run(x)
    float(jnp.asarray(out).reshape(-1)[0])  # tunnel-safe sync
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(x)
        float(jnp.asarray(out).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    ips = batch * iters / best
    print(json.dumps({"backbone": backbone, "mode": "fwd+bwd" if train
                      else "fwd", "images_per_sec": round(ips, 1),
                      "batch": batch,
                      "ms_per_batch": round(1e3 * best / iters, 2)}),
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--backbones", type=str, default="RN50,RN101,ViT-B/32")
    ap.add_argument("--train", action="store_true")
    args = ap.parse_args()
    for b in args.backbones.split(","):
        bench(b, args.batch, args.train)


if __name__ == "__main__":
    main()
