"""Train-step behavior: loss decreases, only PET params update, frozen
backbone untouched, optimizer state is trainable-sized."""

import jax
import jax.numpy as jnp
import numpy as np

from vlpet_tpu.config import BartConfig, VLModelConfig, VisConfig, vlpet_recipe
from vlpet_tpu.models.vlbart import VLBart
from vlpet_tpu.pet.modules import PetContext
from vlpet_tpu.train.freezing import (
    count_params,
    merge_params,
    split_params,
    trainable_mask,
)
from vlpet_tpu.train.optim import build_optimizer
from vlpet_tpu.train.steps import TrainState, make_train_step

TASKS = ("vqa", "caption")


def setup_tiny():
    cfg = VLModelConfig(
        backbone=BartConfig(vocab_size=60, d_model=32, encoder_layers=2,
                            decoder_layers=2, encoder_attention_heads=4,
                            decoder_attention_heads=4, encoder_ffn_dim=64,
                            decoder_ffn_dim=64, max_position_embeddings=32,
                            dropout=0.0),
        vis=VisConfig(feat_dim=16, n_boxes=4),
        pet=vlpet_recipe("large", r=8, num_heads=4, gate_dim=8, tasks=TASKS))
    m = VLBart(cfg)
    rng = np.random.default_rng(0)
    B = 4
    batch = dict(
        input_ids=jnp.asarray(rng.integers(3, 60, (B, 5)), jnp.int32),
        attention_mask=jnp.ones((B, 5), jnp.int32),
        vis_feats=jnp.asarray(rng.normal(size=(B, 4, 16)), jnp.float32),
        boxes=jnp.asarray(rng.uniform(size=(B, 4, 4)), jnp.float32),
        target_ids=jnp.asarray(rng.integers(3, 60, (B, 4)), jnp.int32),
        scores=jnp.ones((B,), jnp.float32),
    )
    params = m.init(jax.random.PRNGKey(0), batch["input_ids"],
                    batch["attention_mask"], vis_feats=batch["vis_feats"],
                    boxes=batch["boxes"], labels=batch["target_ids"],
                    ctx=PetContext())["params"]
    return cfg, m, params, batch


def test_train_step_learns_and_respects_freezing():
    cfg, m, params, batch = setup_tiny()
    mask = trainable_mask(params, cfg.pet)
    trainable, frozen = split_params(params, mask)
    tx = build_optimizer(trainable, lr=2e-2, total_steps=150, warmup_ratio=0.05)
    state = TrainState.create(trainable, tx)
    step = make_train_step(m, tx, TASKS)

    frozen_before = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), frozen)
    trainable_before = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(),
                                              state.params)
    losses = []
    rng = jax.random.PRNGKey(1)
    for i in range(120):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, frozen, batch, sub, 0)
        losses.append(float(metrics["loss"]))
    # only PET params are trainable on a frozen random backbone, so the
    # reachable floor is high — assert a clear monotone-ish improvement
    assert losses[-1] < losses[0] - 0.1, losses[:3] + losses[-3:]

    # trainable params moved
    moved = [not np.allclose(a, np.asarray(b))
             for a, b in zip(jax.tree_util.tree_leaves(trainable_before),
                             jax.tree_util.tree_leaves(state.params))]
    assert any(moved)
    # optimizer state is trainable-sized, not model-sized
    n_train = count_params(state.params)
    n_total = count_params(merge_params(state.params, frozen))
    n_opt = count_params(state.opt_state)
    assert n_opt < 3 * n_train  # two moments + schedule scalars
    assert n_total > 4 * n_train  # the backbone dwarfs the PET subtree


def test_task_routing_uses_distinct_jit_entries():
    cfg, m, params, batch = setup_tiny()
    mask = trainable_mask(params, cfg.pet)
    trainable, frozen = split_params(params, mask)
    tx = build_optimizer(trainable, lr=1e-3, total_steps=10)
    state = TrainState.create(trainable, tx)
    step = make_train_step(m, tx, TASKS)
    rng = jax.random.PRNGKey(0)
    # the step donates its input state, so chain them
    state, m1 = step(state, frozen, batch, rng, 0)  # vqa: score-weighted
    state, m2 = step(state, frozen, batch, rng, 1)  # caption: reduced CE
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))


def test_data_parallel_matches_single_device():
    """The same train step under an 8-device data-parallel mesh must produce
    the same loss/params as unsharded execution (XLA-inserted psum ==
    NCCL-DDP semantics)."""
    from vlpet_tpu.parallel.mesh import MeshConfig, batch_sharding, build_mesh, param_shardings

    cfg, m, params, batch = setup_tiny()
    mask = trainable_mask(params, cfg.pet)
    trainable, frozen = split_params(params, mask)
    tx = build_optimizer(trainable, lr=1e-2, total_steps=10)
    step = make_train_step(m, tx, TASKS)
    rng = jax.random.PRNGKey(0)

    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
    # unsharded
    s1 = TrainState.create(copy(trainable), tx)
    s1, m1 = step(s1, frozen, batch, rng, 0)

    # sharded over the full 8-device mesh (batch=4 won't divide 8; use 8)
    big = {k: (np.concatenate([np.asarray(v)] * 2, 0) if hasattr(v, "shape")
               and v.shape and v.shape[0] == 4 else v)
           for k, v in batch.items()}
    mesh = build_mesh(MeshConfig(data=8, model=1))
    bs = batch_sharding(mesh)
    sharded = {k: jax.device_put(jnp.asarray(v), bs) for k, v in big.items()}
    unsharded = {k: jnp.asarray(v) for k, v in big.items()}

    s2 = TrainState.create(copy(trainable), tx)
    s2, m2 = step(s2, frozen, sharded, rng, 0)
    s3 = TrainState.create(copy(trainable), tx)
    s3, m3 = step(s3, frozen, unsharded, rng, 0)
    np.testing.assert_allclose(float(m2["loss"]), float(m3["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s2.params),
                    jax.tree_util.tree_leaves(s3.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_classifier_head_trains_and_predicts():
    """--classifier: BCE over dense answer-score targets with a single
    start-token decode (reference: vqa_model.py:34-56), loss decreases,
    and predict_classifier returns label2ans answers."""
    import dataclasses

    from vlpet_tpu.data.datasets import (DatasetConfig, Loader, TaskDataset,
                                         synthetic_task_data)
    from vlpet_tpu.data.tokenization import WhitespaceTokenizer
    from vlpet_tpu.train.trainer import Trainer

    cfg, _, _, _ = setup_tiny()
    ans2label = {"yes": 0, "no": 1, "2": 2}
    cfg = dataclasses.replace(cfg, classifier=True,
                              num_answers=len(ans2label))
    tok = WhitespaceTokenizer(vocab_size=60)
    examples, source = synthetic_task_data("vqa", 8, n_boxes=4, feat_dim=16)
    for ex in examples:  # force labels into the topk vocab
        ex["label"] = {"yes": 1.0}
    ds = TaskDataset(DatasetConfig(task="vqa", max_text_length=8,
                                   gen_max_length=4, n_boxes=4, feat_dim=16,
                                   classifier=True, ans2label=ans2label),
                     examples, source, tok)
    loader = Loader(ds, 4)
    trainer = Trainer(cfg, TASKS, lr=1e-2, total_steps=10, tokenizer=tok,
                      verbose=False)
    batch = next(iter(loader))
    assert batch["target"].shape == (4, 3)
    losses = [float(trainer.do_train_step(batch)["loss"]) for _ in range(6)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    res = trainer.predict_classifier(loader,
                                     {v: k for k, v in ans2label.items()})
    assert len(res["quesid2ans"]) == 8
    assert set(res["quesid2ans"].values()) <= {"yes", "no", "2"}


def test_raw_label_answer_sampling():
    """--raw_label: targets sampled uniformly from the 10 raw annotator
    answers with optional normalization (reference:
    vqa_clip_data.py:235-265)."""
    from vlpet_tpu.data.datasets import DatasetConfig, TaskDataset, synthetic_task_data
    from vlpet_tpu.data.tokenization import WhitespaceTokenizer

    tok = WhitespaceTokenizer(vocab_size=60)
    examples, source = synthetic_task_data("vqa", 4, n_boxes=4, feat_dim=16)
    for ex in examples:
        ex["answers"] = [{"answer": "A Net"}, {"answer": "mesh"}]
    ds = TaskDataset(DatasetConfig(task="vqa", max_text_length=8,
                                   gen_max_length=4, n_boxes=4, feat_dim=16,
                                   raw_label=True, answer_normalize=True),
                     examples, source, tok)
    seen = {ds[i]["answer"] for i in range(4) for _ in range(4)}
    # normalize_answer lowercases and strips articles ("A Net" -> "net")
    assert seen <= {"net", "mesh"}
    item = ds[0]
    assert item["score"] == 1.0
    assert item["all_answers"] == ["A Net", "mesh"]


def test_classifier_head_t5():
    """VLT5 classifier parity: the reference's VLT5VQA has the same BCE
    answer head (vqa_model.py:8-18)."""
    import dataclasses

    from vlpet_tpu.config import T5Config
    from vlpet_tpu.data.datasets import (DatasetConfig, Loader, TaskDataset,
                                         synthetic_task_data)
    from vlpet_tpu.data.tokenization import WhitespaceTokenizer
    from vlpet_tpu.train.trainer import Trainer

    ans2label = {"yes": 0, "no": 1}
    cfg = VLModelConfig(
        backbone=T5Config(vocab_size=60, d_model=32, num_layers=2,
                          num_decoder_layers=2, num_heads=4, d_kv=8,
                          d_ff=64, dropout_rate=0.0),
        vis=VisConfig(feat_dim=16, n_boxes=4),
        pet=vlpet_recipe("large", r=8, num_heads=4, gate_dim=8, tasks=TASKS),
        classifier=True, num_answers=len(ans2label))
    tok = WhitespaceTokenizer(vocab_size=60)
    examples, source = synthetic_task_data("vqa", 4, n_boxes=4, feat_dim=16)
    for ex in examples:
        ex["label"] = {"no": 1.0}
    ds = TaskDataset(DatasetConfig(task="vqa", max_text_length=8,
                                   gen_max_length=4, n_boxes=4, feat_dim=16,
                                   classifier=True, ans2label=ans2label),
                     examples, source, tok)
    loader = Loader(ds, 4)
    trainer = Trainer(cfg, TASKS, lr=1e-2, total_steps=10, tokenizer=tok,
                      verbose=False)
    batch = next(iter(loader))
    m = trainer.do_train_step(batch)
    assert np.isfinite(float(m["loss"]))
    res = trainer.predict_classifier(loader,
                                     {v: k for k, v in ans2label.items()})
    assert set(res["quesid2ans"].values()) <= {"yes", "no"}


def test_scoped_vmem_auto_retry():
    """Trainer.do_train_step retries a scoped-vmem COMPILE failure once on
    a small-tile wrapper (graph-context-dependent FFN stack blow-up —
    PERF.md r4 'Toolchain drift'). Advisor-r4 semantics: the override is
    SCOPED per (task, shapes) signature (no process-global env mutation;
    healthy signatures keep the modeled tile), an opaque remote-compile 500
    is only trusted after the helper passes a health check, and a failure
    on a signature that already executed propagates (the donated state may
    be consumed)."""
    import os

    import vlpet_tpu.ops.ffn as ffn_mod
    from vlpet_tpu.data.datasets import (DatasetConfig, Loader, TaskDataset,
                                         synthetic_task_data)
    from vlpet_tpu.data.tokenization import WhitespaceTokenizer
    from vlpet_tpu.train.trainer import (Trainer, _is_direct_vmem_oom,
                                         _is_opaque_remote_500,
                                         _remote_compile_healthy)

    assert _is_direct_vmem_oom(RuntimeError(
        "INTERNAL: Ran out of memory in memory space vmem while ..."))
    assert _is_opaque_remote_500(RuntimeError(
        "INTERNAL: http://127.0.0.1:8113/remote_compile: HTTP 500: ..."))
    assert not _is_direct_vmem_oom(RuntimeError("Ran out of memory in hbm"))
    assert not _is_opaque_remote_500(RuntimeError("Ran out of memory in hbm"))
    assert _remote_compile_healthy(timeout_s=60.0)  # CPU backend: healthy

    cfg = VLModelConfig(
        backbone=BartConfig(vocab_size=60, d_model=32, encoder_layers=1,
                            decoder_layers=1, encoder_attention_heads=4,
                            decoder_attention_heads=4, encoder_ffn_dim=64,
                            decoder_ffn_dim=64, max_position_embeddings=32,
                            dropout=0.0),
        vis=VisConfig(feat_dim=16, n_boxes=4),
        pet=vlpet_recipe("large", r=8, num_heads=4, gate_dim=8, tasks=TASKS))
    tok = WhitespaceTokenizer(vocab_size=60)
    examples, source = synthetic_task_data("vqa", 4, n_boxes=4, feat_dim=16)
    ds = TaskDataset(DatasetConfig(task="vqa", max_text_length=8,
                                   gen_max_length=4, n_boxes=4, feat_dim=16),
                     examples, source, tok)
    batch = next(iter(Loader(ds, 4)))
    trainer = Trainer(cfg, TASKS, lr=1e-2, total_steps=10, tokenizer=tok,
                      verbose=False)
    os.environ.pop("VLPET_FFN_ROW_TILE", None)

    real_step = trainer.train_step
    calls = {"n": 0}
    seen_tiles = []

    def failing_once(*a, **kw):
        calls["n"] += 1
        raise RuntimeError("Ran out of memory in memory space vmem while "
                           "allocating on stack for %ffn")

    def recording_small(*a, **kw):
        seen_tiles.append(ffn_mod._ROW_TILE_OVERRIDE)
        return real_step(*a, **kw)

    trainer.train_step = failing_once
    trainer._small_step = recording_small
    try:
        m = trainer.do_train_step(batch)
        # first call raised; the retry ran on the small-tile wrapper with
        # the SCOPED override active at call (-> trace) time
        assert calls["n"] == 1
        assert np.isfinite(float(m["loss"]))
        assert seen_tiles == [32]
        # scoped: no process-global leak, default wrapper untouched
        assert "VLPET_FFN_ROW_TILE" not in os.environ
        assert ffn_mod._ROW_TILE_OVERRIDE is None
        assert trainer.train_step is failing_once
        # the signature is pinned: the next step goes straight to the
        # small wrapper without touching the (still-failing) default
        m2 = trainer.do_train_step(batch)
        assert calls["n"] == 1 and np.isfinite(float(m2["loss"]))
        assert seen_tiles == [32, 32]
    finally:
        trainer.train_step = real_step
        trainer._small_step = None
        trainer._small_tile_sigs.clear()

    # a vmem-looking error on a signature that ALREADY executed must
    # propagate — the donated state may be consumed (advisor r4 low)
    assert trainer._ok_sigs
    trainer.train_step = failing_once
    try:
        import pytest as _pytest
        with _pytest.raises(RuntimeError, match="vmem"):
            trainer.do_train_step(batch)
    finally:
        trainer.train_step = real_step

    # an opaque remote-compile 500 with a WEDGED helper must not retry
    trainer._ok_sigs.clear()

    def failing_500(*a, **kw):
        raise RuntimeError(
            "INTERNAL: http://127.0.0.1:8113/remote_compile: HTTP 500")

    import vlpet_tpu.train.trainer as trainer_mod
    trainer.train_step = failing_500
    orig_health = trainer_mod._remote_compile_healthy
    trainer_mod._remote_compile_healthy = lambda *a, **kw: False
    try:
        import pytest as _pytest
        with _pytest.raises(RuntimeError, match="wedged"):
            trainer.do_train_step(batch)
    finally:
        trainer_mod._remote_compile_healthy = orig_health
        trainer.train_step = real_step

    # unrelated errors propagate
    def failing_other(*a, **kw):
        raise RuntimeError("something else entirely")

    trainer.train_step = failing_other
    try:
        import pytest as _pytest
        with _pytest.raises(RuntimeError, match="something else"):
            trainer.do_train_step(batch)
    finally:
        trainer.train_step = real_step
