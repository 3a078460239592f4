"""PET-variant sweep: every published baseline recipe must train + generate
end-to-end (reference scripts: scripts/image-text/{single_adapter,
single_compacter,single_lora,single_prompt,bitfit,full_finetuning,
hyperformer}.sh plus the four VL-PET variants)."""

import dataclasses

import numpy as np
import pytest

from vlpet_tpu.cli.param import build_model_config, parse_args
from vlpet_tpu.config import BartConfig
from vlpet_tpu.data.datasets import DatasetConfig, Loader, TaskDataset, synthetic_task_data
from vlpet_tpu.data.tokenization import WhitespaceTokenizer
from vlpet_tpu.train.trainer import Trainer

TASKS = ("vqa", "caption")

BASE = ["--tasks", "vqa,caption", "--batch_size", "4", "--feat_dim", "8",
        "--n_boxes", "4", "--synthetic_examples", "8", "--use_tasks_prompts",
        "--backbone", "facebook/bart-base"]

VARIANTS = {
    "vlpet_small": ["--use_adapter", "--use_single_adapter",
                    "--no_encoder_adapter", "--use_adapter_down_dim",
                    "--use_encoder_adapter_down_multihead",
                    "--adapter_down_dim", "8",
                    "--encoder_adapter_multihead_num_head", "4",
                    "--use_encoder_adapter_gating_small_xy_cat",
                    "--unfreeze_encoder_layer_norms", "--no_decoder_adapter",
                    "--use_decoder_enc_attn_value_parallel_adapter_down_dim",
                    "--decoder_enc_attn_value_parallel_adapter_down_dim", "8"],
    "vlpet_middleX": ["--use_adapter", "--use_single_adapter",
                      "--no_encoder_adapter", "--use_adapter_down_dim",
                      "--use_encoder_adapter_down_multihead",
                      "--adapter_down_dim", "8",
                      "--encoder_adapter_multihead_num_head", "4",
                      "--use_encoder_adapter_gating_middle_xy_add",
                      "--unfreeze_encoder_layer_norms", "--no_decoder_adapter",
                      "--use_decoder_enc_attn_value_parallel_adapter_down_dim",
                      "--decoder_enc_attn_value_parallel_adapter_down_dim", "8"],
    "vlpet_middleY": ["--use_adapter", "--use_single_adapter",
                      "--no_encoder_adapter", "--use_adapter_down_dim",
                      "--use_encoder_adapter_down_multihead",
                      "--adapter_down_dim", "8",
                      "--encoder_adapter_multihead_num_head", "4",
                      "--use_encoder_adapter_gating_middle_ia3_add",
                      "--unfreeze_encoder_layer_norms", "--no_decoder_adapter",
                      "--use_decoder_enc_attn_value_parallel_adapter_down_dim",
                      "--decoder_enc_attn_value_parallel_adapter_down_dim", "8"],
    # single_adapter.sh — the VL-Adapter baseline
    "single_adapter": ["--use_adapter", "--unfreeze_layer_norms",
                       "--reduction_factor", "8", "--use_single_adapter"],
    # single_compacter.sh
    "single_compacter": ["--use_compacter", "--hypercomplex_division", "4",
                         "--reduction_factor", "8", "--shared_phm_rule", "False",
                         "--factorized_phm", "False",
                         "--unfreeze_layer_norms", "--use_single_adapter"],
    # per-task compacter with cross-task sampler sharing + task-shared rule
    # (reference: adapter_controller.py:69-84 share_*_sampler /
    # shared_phm_rule_over_tasks — sharing beyond use_single_adapter)
    "compacter_shared_samplers": [
        "--use_compacter", "--hypercomplex_division", "4",
        "--reduction_factor", "8", "--shared_phm_rule", "False",
        "--factorized_phm", "False", "--share_down_sampler",
        "--share_up_sampler", "--shared_phm_rule_over_tasks",
        "--unfreeze_layer_norms"],
    # model-shared Compacter slow weights: ONE W_down/W_up at the model root
    # injected into every PHMDense (working version of the reference's dead
    # shared_W_phm path — adapters/config.py:35, set_W never called)
    "compacter_shared_W": [
        "--use_compacter", "--hypercomplex_division", "4",
        "--reduction_factor", "8", "--shared_W_phm", "True",
        "--unfreeze_layer_norms", "--use_single_adapter"],
    # per-task compacter, no sharing at all: each task owns W AND phm_rule
    "compacter_per_task": [
        "--use_compacter", "--hypercomplex_division", "4",
        "--reduction_factor", "8", "--shared_phm_rule", "False",
        "--unfreeze_layer_norms"],
    # low-rank adapter with cross-task sampler sharing
    "lradapter_shared_samplers": [
        "--use_lradapter", "--reduction_factor", "8",
        "--low_rank_rank", "1", "--share_down_sampler",
        "--share_up_sampler", "--unfreeze_layer_norms"],
    # low-rank adapter baseline (reference: LRAdapterConfig)
    "single_lradapter": ["--use_lradapter", "--reduction_factor", "8",
                         "--low_rank_rank", "1", "--unfreeze_layer_norms",
                         "--use_single_adapter"],
    # single_lora.sh
    "single_lora": ["--use_lora", "--lora_dim", "4", "--use_single_lora"],
    # single_prompt.sh
    "single_prompt": ["--encoder_prompt_len", "6", "--mid_dim", "16",
                      "--use_single_prompt"],
    # bitfit.sh
    "bitfit": ["--unfreeze_bias"],
    # full_finetuning.sh
    "full_finetuning": ["--unfreeze_language_model"],
    # hyperformer.sh
    "hyperformer": ["--use_hyperformer", "--unique_hyper_net",
                    "--unfreeze_layer_norms",
                    "--projected_task_embedding_dim", "16",
                    "--reduction_factor", "8"],
    # IA3 ablation (reference flag family)
    "ia3": ["--use_decoder_enc_attn_value_ia3",
            "--use_decoder_enc_attn_value_ia3_add",
            "--use_decoder_enc_attn_value_ia3_one_init",
            "--use_decoder_ff_ia3", "--use_decoder_ff_ia3_add",
            "--use_decoder_ff_ia3_one_init"],
    # KPA / sequential-VA ablations
    "key_parallel": ["--use_decoder_enc_attn_key_parallel_adapter_down_dim",
                     "--decoder_enc_attn_key_parallel_adapter_down_dim", "8"],
    "sequential_va": ["--use_decoder_enc_attn_value_sequential_adapter_down_dim",
                      "--decoder_enc_attn_value_sequential_adapter_down_dim", "8",
                      "--use_decoder_enc_attn_value_residual_connection"],
    # standalone encoder gating replacing the adapter (reference :1014-1024)
    "standalone_gating": ["--use_encoder_gating_large_x_lowrank",
                          "--gating_down_dim", "8",
                          "--unfreeze_encoder_layer_norms"],
    "standalone_gating_add_x2": ["--use_encoder_gating_large_x_lowrank",
                                 "--gating_down_dim", "8",
                                 "--use_encoder_gating_large_x_lowrank_add_x2_deltay"],
    # gate-ADD combination (reference: use_encoder_adapter_gating_add)
    "vlpet_large_gating_add": [
        "--use_adapter", "--use_single_adapter", "--no_encoder_adapter",
        "--use_adapter_down_dim", "--use_encoder_adapter_down_multihead",
        "--adapter_down_dim", "8", "--encoder_adapter_multihead_num_head", "4",
        "--use_encoder_adapter_gating_large_x_lowrank",
        "--adapter_gating_down_dim", "8", "--use_encoder_adapter_gating_add",
        "--no_decoder_adapter",
        "--use_decoder_enc_attn_value_parallel_adapter_down_dim",
        "--decoder_enc_attn_value_parallel_adapter_down_dim", "8"],
    # LayerNorm / L2-norm gate ablations (reference :953-967)
    "gating_layernorm": ["--use_adapter", "--use_single_adapter",
                         "--no_encoder_adapter", "--use_adapter_down_dim",
                         "--use_encoder_adapter_down_multihead",
                         "--adapter_down_dim", "8",
                         "--encoder_adapter_multihead_num_head", "4",
                         "--use_encoder_adapter_gating_layernorm",
                         "--no_decoder_adapter"],
    "gating_l2norm": ["--use_adapter", "--use_single_adapter",
                      "--no_encoder_adapter", "--use_adapter_down_dim",
                      "--use_encoder_adapter_down_multihead",
                      "--adapter_down_dim", "8",
                      "--encoder_adapter_multihead_num_head", "4",
                      "--use_encoder_adapter_gating_l2norm",
                      "--no_decoder_adapter"],
    # other multihead shapes (reference :1058-1113)
    "mh_up": ["--use_adapter", "--use_single_adapter", "--no_encoder_adapter",
              "--use_adapter_down_dim", "--use_encoder_adapter_up_multihead",
              "--adapter_down_dim", "8",
              "--encoder_adapter_multihead_num_head", "4",
              "--no_decoder_adapter"],
    "mh_down_up": ["--use_adapter", "--use_single_adapter",
                   "--no_encoder_adapter", "--use_adapter_down_dim",
                   "--use_encoder_adapter_down_up_multihead",
                   "--adapter_down_dim", "8",
                   "--encoder_adapter_multihead_num_head", "4",
                   "--no_decoder_adapter"],
    "mh_pair": ["--use_adapter", "--use_single_adapter", "--no_encoder_adapter",
                "--use_adapter_down_dim",
                "--use_encoder_adapter_down_up_pair_multihead",
                "--adapter_down_dim", "8",
                "--encoder_adapter_multihead_num_head", "4",
                "--no_decoder_adapter"],
    # decoder-side down-dim adapters + cross gate (reference :1536-1581)
    "decoder_adapters": [
        "--use_decoder_self_attn_adapter_down_dim",
        "--decoder_self_attn_adapter_down_dim", "8",
        "--use_decoder_enc_attn_adapter_down_dim",
        "--decoder_enc_attn_adapter_down_dim", "8",
        "--use_decoder_enc_attn_adapter_gating_large_x_lowrank",
        "--decoder_enc_attn_adapter_gating_large_x_lowrank_down_dim", "8",
        "--use_decoder_ff_adapter_down_dim",
        "--decoder_ff_adapter_down_dim", "8"],
    "decoder_mh_kv_adapter": [
        "--use_decoder_adapter_down_multihead",
        "--decoder_adapter_multihead_num_head", "4",
        "--adapter_down_dim", "8",
        "--use_decoder_enc_attn_key_value_adapter_down_dim",
        "--decoder_enc_attn_key_value_adapter_down_dim", "8"],
    # VL-PET lightweight visual projector
    "lowrank_visual_projector": [
        "--use_lowrank_visual_projector", "--visual_projector_down_dim", "8",
        "--visual_projector_multihead_num_head", "4",
        "--use_visual_projector_gating_large_x_lowrank",
        "--visual_projector_gating_down_dim", "8"],
}


def build_trainer(argv, tmp_path):
    args = parse_args(BASE + argv)
    tok = WhitespaceTokenizer(vocab_size=512)
    cfg = build_model_config(args, TASKS, vocab_size=512)
    cfg = dataclasses.replace(
        cfg, backbone=BartConfig(vocab_size=512, d_model=32, encoder_layers=2,
                                 decoder_layers=2, encoder_attention_heads=4,
                                 decoder_attention_heads=4, encoder_ffn_dim=64,
                                 decoder_ffn_dim=64, max_position_embeddings=64,
                                 dropout=0.0))
    loaders = []
    for task in TASKS:
        examples, source = synthetic_task_data(task, 8, n_boxes=4, feat_dim=8)
        ds = TaskDataset(DatasetConfig(task=task, max_text_length=12,
                                       gen_max_length=6, n_boxes=4, feat_dim=8),
                         examples, source, tok)
        loaders.append(Loader(ds, 4))
    trainer = Trainer(cfg, TASKS, lr=1e-3, total_steps=10, tokenizer=tok,
                      verbose=False)
    return trainer, loaders


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_variant_trains_and_generates(name, tmp_path):
    trainer, loaders = build_trainer(VARIANTS[name], tmp_path)
    assert trainer.report["trainable"] > 0, "variant trains nothing"
    # hypernet generators dwarf a 32-dim toy backbone, so exempt hyperformer
    if name not in ("full_finetuning", "hyperformer"):
        assert trainer.report["percentage"] < 60
    for loader in loaders:
        batch = next(iter(loader))
        m = trainer.do_train_step(batch)
        assert np.isfinite(float(m["loss"])), name
    # generation path must work with the variant's hooks
    res = trainer.predict(loaders[1], num_beams=2, max_length=6)
    assert len(res["predictions"]) > 0


def test_compacter_shared_W_structure(tmp_path):
    """shared_W_phm: ONE factorized W_down/W_up pair lives at the model root
    (trainable), and the per-layer PHM samplers own no slow weights."""
    import jax

    trainer, loaders = build_trainer(VARIANTS["compacter_shared_W"], tmp_path)
    names = [jax.tree_util.keystr(p) for p, _ in
             jax.tree_util.tree_flatten_with_path(trainer.merged_params)[0]]
    root_w = sorted(n for n in names if "phm_W_" in n)
    assert len(root_w) == 4, root_w  # {down,up} × {left,right} (factorized)
    sampler_w = [n for n in names if "sampler" in n
                 and ("W_left" in n or "W_right" in n or n.endswith("['W']"))]
    assert not sampler_w, sampler_w
    # the shared weights actually train (freezing rule picks them up)
    trainable = [jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(
                     trainer.state.params)[0]]
    assert sum("phm_W_" in n for n in trainable) == 4


def test_attn_prefix_trains_and_generates(tmp_path):
    """Prefix tuning: encoder + decoder per-layer KV prefixes
    (reference: src/modeling_prefix_bart.py)."""
    argv = ["--use_attn_prefix", "--encoder_prompt_len", "5",
            "--decoder_prompt_len", "4", "--mid_dim", "16"]
    trainer, loaders = build_trainer(argv, tmp_path)
    assert trainer.report["trainable"] > 0
    for loader in loaders:
        batch = next(iter(loader))
        m = trainer.do_train_step(batch)
        assert np.isfinite(float(m["loss"]))
    res = trainer.predict(loaders[1], num_beams=1, max_length=6)
    assert len(res["predictions"]) > 0


def test_attn_prefix_cache_parity():
    """Incremental decode with prefilled prefix cache must equal the
    full-sequence forward with prefix KVs."""
    import jax
    import jax.numpy as jnp
    from vlpet_tpu.config import PetConfig, VisConfig, VLModelConfig
    from vlpet_tpu.models.generate import init_self_cache
    from vlpet_tpu.models.vlbart import VLBart
    from vlpet_tpu.pet.modules import PetContext

    P = 3
    pet = PetConfig(use_attn_prefix=True, decoder_prompt_len=P, mid_dim=8)
    cfg = VLModelConfig(
        backbone=BartConfig(vocab_size=50, d_model=32, encoder_layers=2,
                            decoder_layers=2, encoder_attention_heads=4,
                            decoder_attention_heads=4, encoder_ffn_dim=64,
                            decoder_ffn_dim=64, max_position_embeddings=64,
                            dropout=0.0),
        vis=VisConfig(no_vis=True), pet=pet)
    m = VLBart(cfg)
    rng = np.random.default_rng(0)
    B, L, T = 2, 5, 4
    input_ids = jnp.asarray(rng.integers(3, 50, (B, L)), jnp.int32)
    attn = jnp.ones((B, L), jnp.int32)
    dec_ids = jnp.asarray(rng.integers(3, 50, (B, T)), jnp.int32)
    ctx = PetContext()
    params = m.init(jax.random.PRNGKey(0), input_ids, attn,
                    labels=dec_ids, ctx=ctx)["params"]
    enc_out, joint_mask = m.apply({"params": params}, input_ids, attn,
                                  None, None, None, None, None, ctx,
                                  method=VLBart.encode)
    full = m.apply({"params": params}, dec_ids, enc_out, joint_mask, ctx,
                   method=VLBart.decode_train)
    cross_kvs = m.apply({"params": params}, enc_out, ctx,
                        method=VLBart.init_decode)
    prefix_kvs = m.apply({"params": params}, B,
                         method=VLBart.init_decoder_prefix)
    cache = init_self_cache(cfg, B, T + P)  # time-major rank-3 (L, B, H*Dh)
    tm = lambda x: x.swapaxes(0, 1).reshape(x.shape[1], x.shape[0], -1)
    cache = tuple({"k": l["k"].at[:P].set(tm(pk)),
                   "v": l["v"].at[:P].set(tm(pv))}
                  for l, (pk, pv) in zip(cache, prefix_kvs))
    steps = []
    for t in range(T):
        lg, cache = m.apply({"params": params}, dec_ids[:, t:t + 1], joint_mask,
                            cross_kvs, cache, t + P, ctx,
                            method=VLBart.decode_step)
        steps.append(lg)
    got = np.asarray(jnp.stack(steps, 1))
    np.testing.assert_allclose(got, np.asarray(full), rtol=2e-4, atol=2e-4)


def test_visual_prefix_encoder():
    """PrefixJointEncoder semantics: visual features become per-layer KV
    prefixes, sequence length stays text-only."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from vlpet_tpu.config import PetConfig, VisConfig, VLModelConfig
    from vlpet_tpu.models.vlbart import VLBart
    from vlpet_tpu.pet.modules import PetContext

    cfg = VLModelConfig(
        backbone=BartConfig(vocab_size=50, d_model=32, encoder_layers=2,
                            decoder_layers=2, encoder_attention_heads=4,
                            decoder_attention_heads=4, encoder_ffn_dim=64,
                            decoder_ffn_dim=64, max_position_embeddings=32,
                            dropout=0.0),
        vis=VisConfig(feat_dim=16, n_boxes=4, use_vis_prefix=True),
        pet=PetConfig())
    m = VLBart(cfg)
    rng = np.random.default_rng(0)
    kw = dict(input_ids=jnp.asarray(rng.integers(3, 50, (2, 5)), jnp.int32),
              attention_mask=jnp.ones((2, 5), jnp.int32),
              vis_feats=jnp.asarray(rng.normal(size=(2, 4, 16)), jnp.float32),
              boxes=jnp.zeros((2, 4, 4)),
              labels=jnp.asarray(rng.integers(3, 50, (2, 3)), jnp.int32))
    ctx = PetContext()
    params = m.init(jax.random.PRNGKey(0), **kw, ctx=ctx)["params"]
    out = m.apply({"params": params}, **kw, ctx=ctx)
    # encoder output length == text length (no vis concat)
    assert out["encoder_last_hidden_state"].shape[1] == 5
    assert np.isfinite(np.asarray(out["loss"])).all()
    # visual features must influence the output: change feats, logits change
    kw2 = dict(kw, vis_feats=kw["vis_feats"] + 1.0)
    out2 = m.apply({"params": params}, **kw2, ctx=ctx)
    assert not np.allclose(np.asarray(out["logits"]), np.asarray(out2["logits"]))


def test_expand_visual_embedding_variant():
    """Frozen-style expand_vis_embedding: one pooled feature → n tokens."""
    import jax
    import jax.numpy as jnp
    from vlpet_tpu.config import PetConfig, VisConfig, VLModelConfig
    from vlpet_tpu.models.vlbart import VLBart
    from vlpet_tpu.pet.modules import PetContext

    cfg = VLModelConfig(
        backbone=BartConfig(vocab_size=50, d_model=32, encoder_layers=1,
                            decoder_layers=1, encoder_attention_heads=4,
                            decoder_attention_heads=4, encoder_ffn_dim=64,
                            decoder_ffn_dim=64, max_position_embeddings=32,
                            dropout=0.0),
        vis=VisConfig(feat_dim=16, n_boxes=1, expand_vis_embedding=True,
                      n_image_tokens=3, use_vis_order_embedding=False),
        pet=PetConfig())
    m = VLBart(cfg)
    kw = dict(input_ids=jnp.ones((2, 5), jnp.int32),
              attention_mask=jnp.ones((2, 5), jnp.int32),
              vis_feats=jnp.ones((2, 1, 16)), boxes=jnp.zeros((2, 1, 4)),
              labels=jnp.ones((2, 3), jnp.int32))
    params = m.init(jax.random.PRNGKey(0), **kw, ctx=PetContext())["params"]
    out = m.apply({"params": params}, **kw, ctx=PetContext())
    # 5 text + 3 expanded vis tokens
    assert out["encoder_last_hidden_state"].shape[1] == 8


def test_decoder_input_prompt_tuning(tmp_path):
    """Decoder prompt tuning (non-prefix): trains, output length unchanged."""
    argv = ["--decoder_prompt_len", "4", "--mid_dim", "16",
            "--use_single_prompt"]
    trainer, loaders = build_trainer(argv, tmp_path)
    assert trainer.report["trainable"] > 0
    batch = next(iter(loaders[0]))
    m = trainer.do_train_step(batch)
    assert np.isfinite(float(m["loss"]))


@pytest.mark.parametrize("backbone", ["bart", "t5"])
def test_decoder_input_prompt_cache_parity(backbone):
    """Decoder INPUT-prompt tuning: incremental decode from a cache
    prefilled with the dry-run prompt KV (init_decoder_prompt — the
    reference's past_key_values mechanism, modeling_bart.py:1421-1424 /
    modeling_t5.py:642-645) must equal the single-pass teacher-forcing
    forward, whose prompt semantics are oracle-pinned
    (test_reference_parity.py::test_prompt_tuning_model_parity)."""
    import jax
    import jax.numpy as jnp
    from vlpet_tpu.config import (PetConfig, T5Config, VisConfig,
                                  VLModelConfig)
    from vlpet_tpu.models.generate import init_self_cache
    from vlpet_tpu.pet.modules import PetContext

    P = 3
    pet = PetConfig(decoder_prompt_len=P, mid_dim=8, use_single_prompt=True)
    if backbone == "bart":
        from vlpet_tpu.models.vlbart import VLBart as Model
        bk = BartConfig(vocab_size=50, d_model=32, encoder_layers=2,
                        decoder_layers=2, encoder_attention_heads=4,
                        decoder_attention_heads=4, encoder_ffn_dim=64,
                        decoder_ffn_dim=64, max_position_embeddings=64,
                        dropout=0.0)
    else:
        from vlpet_tpu.models.t5 import VLT5 as Model
        bk = T5Config(vocab_size=50, d_model=32, d_kv=8, d_ff=64,
                      num_layers=2, num_decoder_layers=2, num_heads=4,
                      dropout_rate=0.0)
    cfg = VLModelConfig(backbone=bk, vis=VisConfig(no_vis=True), pet=pet)
    m = Model(cfg)
    rng = np.random.default_rng(3)
    B, L, T = 2, 5, 4
    input_ids = jnp.asarray(rng.integers(3, 50, (B, L)), jnp.int32)
    attn = jnp.ones((B, L), jnp.int32)
    dec_ids = jnp.asarray(rng.integers(3, 50, (B, T)), jnp.int32)
    ctx = PetContext()
    params = m.init(jax.random.PRNGKey(0), input_ids, attn,
                    labels=dec_ids, ctx=ctx)["params"]
    enc_out, joint_mask = m.apply({"params": params}, input_ids, attn,
                                  None, None, None, None, None, ctx,
                                  method=Model.encode)
    full = m.apply({"params": params}, dec_ids, enc_out, joint_mask, ctx,
                   method=Model.decode_train)
    cross_kvs = m.apply({"params": params}, enc_out, ctx,
                        method=Model.init_decode)
    prompt_kvs = m.apply({"params": params}, B, ctx,
                         method=Model.init_decoder_prompt)
    assert prompt_kvs is not None and prompt_kvs[0][0].shape[1] == P
    cache = init_self_cache(cfg, B, T + P)
    tm = lambda x: x.swapaxes(0, 1).reshape(x.shape[1], x.shape[0], -1)
    cache = tuple({"k": l["k"].at[:P].set(tm(pk)),
                   "v": l["v"].at[:P].set(tm(pv))}
                  for l, (pk, pv) in zip(cache, prompt_kvs))
    steps = []
    for t in range(T):
        lg, cache = m.apply({"params": params}, dec_ids[:, t:t + 1],
                            joint_mask, cross_kvs, cache, t + P, ctx,
                            method=Model.decode_step)
        steps.append(lg)
    got = np.asarray(jnp.stack(steps, 1))
    np.testing.assert_allclose(got, np.asarray(full), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("backbone", ["bart", "t5"])
def test_decoder_input_prompt_generation(backbone):
    """seq2seq_generate with decoder input prompts: greedy equals the
    manual TF-argmax rollout (generation really consumes the prompt —
    before r5 the decode path silently ignored it), and beam-5 runs."""
    import jax
    import jax.numpy as jnp
    from vlpet_tpu.config import (PetConfig, T5Config, VisConfig,
                                  VLModelConfig)
    from vlpet_tpu.models.generate import seq2seq_generate
    from vlpet_tpu.pet.modules import PetContext

    P = 3
    pet = PetConfig(decoder_prompt_len=P, mid_dim=8, use_single_prompt=True)
    if backbone == "bart":
        from vlpet_tpu.models.vlbart import VLBart as Model
        bk = BartConfig(vocab_size=50, d_model=32, encoder_layers=2,
                        decoder_layers=2, encoder_attention_heads=4,
                        decoder_attention_heads=4, encoder_ffn_dim=64,
                        decoder_ffn_dim=64, max_position_embeddings=64,
                        dropout=0.0)
    else:
        from vlpet_tpu.models.t5 import VLT5 as Model
        bk = T5Config(vocab_size=50, d_model=32, d_kv=8, d_ff=64,
                      num_layers=2, num_decoder_layers=2, num_heads=4,
                      dropout_rate=0.0)
    cfg = VLModelConfig(backbone=bk, vis=VisConfig(no_vis=True), pet=pet)
    m = Model(cfg)
    rng = np.random.default_rng(5)
    B, L, maxlen = 2, 5, 6
    input_ids = jnp.asarray(rng.integers(3, 50, (B, L)), jnp.int32)
    attn = jnp.ones((B, L), jnp.int32)
    ctx = PetContext()
    params = m.init(jax.random.PRNGKey(0), input_ids, attn,
                    labels=jnp.ones((B, 3), jnp.int32), ctx=ctx)["params"]
    # randomize so prompts influence the rollout (init zero-inits nothing
    # here, but HF-scale weights make every step near-uniform)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    params = jax.tree_util.tree_unflatten(treedef, [
        jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(11), i),
                          l.shape, l.dtype) * 0.25
        for i, l in enumerate(leaves)])
    variables = {"params": params}
    seqs = np.asarray(seq2seq_generate(
        m, variables, input_ids=input_ids, attention_mask=attn, ctx=ctx,
        num_beams=1, max_length=maxlen))

    # manual rollout through the teacher-forcing forward (prompt concat)
    enc_out, joint_mask = m.apply(variables, input_ids, attn,
                                  None, None, None, None, None, ctx,
                                  method=Model.encode)
    start = cfg.backbone.decoder_start_token_id
    cur = np.full((B, 1), start, np.int32)
    for _ in range(maxlen - 1):
        lg = m.apply(variables, jnp.asarray(cur), enc_out, joint_mask, ctx,
                     method=Model.decode_train)
        nxt = np.asarray(lg[:, -1].argmax(-1)).astype(np.int32)
        cur = np.concatenate([cur, nxt[:, None]], axis=1)
    eos = cfg.backbone.eos_token_id
    pad = cfg.backbone.pad_token_id
    for b in range(B):
        want = cur[b]
        got = seqs[b]
        done = False
        for t in range(maxlen):
            if done:
                assert got[t] == pad
            else:
                assert got[t] == want[t], (b, t, got, want)
                if t > 0 and want[t] == eos:
                    done = True

    # beam path exercises the prefilled-cache + pos_offset machinery
    seqs5 = np.asarray(seq2seq_generate(
        m, variables, input_ids=input_ids, attention_mask=attn, ctx=ctx,
        num_beams=3, max_length=maxlen))
    assert seqs5.shape == (B, maxlen)
