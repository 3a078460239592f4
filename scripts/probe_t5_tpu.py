"""TPU smoke: VLT5 train-shape forward+backward with the split bias/mask
attention path (kernel bias input) at t5-base-like dims."""
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vlpet_jax_cache")

from vlpet_tpu.config import T5Config, VisConfig, VLModelConfig, vlpet_recipe
from vlpet_tpu.models.t5 import VLT5
from vlpet_tpu.pet.modules import PetContext

cfg = VLModelConfig(
    backbone=T5Config(num_layers=2, num_decoder_layers=2),
    vis=VisConfig(feat_dim=2048, n_boxes=36),
    pet=vlpet_recipe("large", tasks=("vqa",)), dtype="bfloat16")
model = VLT5(cfg)
B, L, T = 100, 20, 10
rng = np.random.default_rng(0)
kw = dict(
    input_ids=jnp.asarray(rng.integers(3, 1000, (B, L)), jnp.int32),
    attention_mask=jnp.ones((B, L), jnp.int32),
    vis_feats=jnp.asarray(rng.normal(size=(B, 36, 2048)), jnp.float32),
    boxes=jnp.asarray(rng.uniform(size=(B, 36, 4)), jnp.float32),
    labels=jnp.asarray(rng.integers(3, 1000, (B, T)), jnp.int32))
params = jax.jit(lambda: model.init(
    jax.random.PRNGKey(0), **kw, ctx=PetContext(task="vqa"))["params"])()


def loss_fn(p):
    out = model.apply({"params": p}, **kw, ctx=PetContext(task="vqa"))
    return jnp.mean(out["loss"])


g = jax.jit(jax.value_and_grad(loss_fn))
t0 = time.perf_counter()
loss, grads = g(params)
loss = float(jnp.asarray(loss, jnp.float32))
print(f"compile+step {time.perf_counter()-t0:.1f}s loss={loss:.4f}")
assert np.isfinite(loss)
t0 = time.perf_counter()
for _ in range(5):
    loss, grads = g(params)
float(jnp.asarray(loss, jnp.float32))
print(f"step {(time.perf_counter()-t0)/5*1e3:.1f} ms OK")
