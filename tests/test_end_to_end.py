"""End-to-end smoke: the full multitask CLI path on synthetic data with a
tiny model — data → multitask train loop → all four evaluators → save."""

import dataclasses

import jax
import numpy as np
import pytest

from vlpet_tpu.cli.multitask import build_loaders, main
from vlpet_tpu.cli.param import build_model_config, parse_args
from vlpet_tpu.config import BartConfig, T5Config
from vlpet_tpu.data.multitask import MultitaskLoader
from vlpet_tpu.data.tokenization import get_tokenizer
from vlpet_tpu.train.trainer import Trainer

TASKS = ("vqa", "gqa", "nlvr", "caption")

ARGV = [
    "--tasks", "vqa,gqa,nlvr,caption", "--use_tasks_prompts",
    "--batch_size", "4", "--epochs", "1", "--lr", "1e-3",
    "--clip_grad_norm", "5", "--warmup_ratio", "0.1",
    "--feat_dim", "8", "--n_boxes", "4",
    "--synthetic_examples", "12",
    # VL-PET-large recipe flags (scripts/image-text/VL-PET-large.sh)
    "--use_adapter", "--use_single_adapter", "--no_encoder_adapter",
    "--use_adapter_down_dim", "--use_encoder_adapter_down_multihead",
    "--adapter_down_dim", "8", "--encoder_adapter_multihead_num_head", "4",
    "--use_encoder_adapter_gating_large_x_lowrank",
    "--adapter_gating_down_dim", "8", "--unfreeze_encoder_layer_norms",
    "--no_decoder_adapter",
    "--use_decoder_enc_attn_value_parallel_adapter_down_dim",
    "--decoder_enc_attn_value_parallel_adapter_down_dim", "8",
]


def tiny_backbone(cfg):
    if cfg.is_t5:
        backbone = T5Config(vocab_size=512, d_model=32, d_kv=8, d_ff=64,
                            num_layers=2, num_decoder_layers=2, num_heads=4,
                            dropout_rate=0.0)
    else:
        backbone = BartConfig(vocab_size=512, d_model=32, encoder_layers=2,
                              decoder_layers=2, encoder_attention_heads=4,
                              decoder_attention_heads=4, encoder_ffn_dim=64,
                              decoder_ffn_dim=64, max_position_embeddings=64,
                              dropout=0.0)
    return dataclasses.replace(cfg, backbone=backbone)


@pytest.mark.parametrize("backbone", ["facebook/bart-base", "t5-base"])
def test_multitask_end_to_end(tmp_path, backbone):
    args = parse_args(ARGV + ["--backbone", backbone,
                              "--output", str(tmp_path / "run")])
    tokenizer, _ = get_tokenizer(args.backbone, None)
    tokenizer.vocab_size = 512
    cfg = tiny_backbone(build_model_config(args, TASKS, vocab_size=512))

    train_loaders = build_loaders(args, TASKS, tokenizer, "train", "train")
    val_loaders = build_loaders(args, TASKS, tokenizer, "valid", "val")
    mt = MultitaskLoader(train_loaders)
    trainer = Trainer(cfg, TASKS, lr=args.lr, total_steps=len(mt),
                      clip_grad_norm=5.0, tokenizer=tokenizer,
                      output_dir=str(tmp_path / "run"), verbose=False)

    # param report sanity: PET-only training
    assert trainer.report["percentage"] < 50

    history = trainer.train(mt, epochs=1, val_loaders=val_loaders)
    metrics = history[0]
    assert np.isfinite(metrics["train_loss"])
    # every task produced eval numbers
    assert any(k.startswith("vqa/") for k in metrics)
    assert any(k.startswith("nlvr/") for k in metrics)
    assert any(k.startswith("caption/") for k in metrics)
    assert (tmp_path / "run" / "LAST.npz").exists()


def test_checkpoint_resume(tmp_path):
    args = parse_args(ARGV + ["--backbone", "facebook/bart-base",
                              "--output", str(tmp_path / "run")])
    tokenizer, _ = get_tokenizer(args.backbone, None)
    tokenizer.vocab_size = 512
    cfg = tiny_backbone(build_model_config(args, TASKS, vocab_size=512))
    train_loaders = build_loaders(args, TASKS, tokenizer, "train", "train")
    mt = MultitaskLoader(train_loaders)
    trainer = Trainer(cfg, TASKS, lr=1e-3, total_steps=10, tokenizer=tokenizer,
                      output_dir=str(tmp_path / "run"), verbose=False)
    for batch in mt:
        trainer.do_train_step(batch)
        break
    trainer.save(1)
    trainer.ckpt.wait()

    trainer2 = Trainer(cfg, TASKS, lr=1e-3, total_steps=10, tokenizer=tokenizer,
                       output_dir=str(tmp_path / "run"), verbose=False)
    step = trainer2.restore()
    assert step == 1
    a = jax.tree_util.tree_leaves(trainer.state.params)
    b = jax.tree_util.tree_leaves(trainer2.state.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)
    # opt_state must come back with its optax namedtuple structure intact
    # (restoring without a template yields plain dicts that crash tx.update)
    assert (jax.tree_util.tree_structure(trainer.state.opt_state)
            == jax.tree_util.tree_structure(trainer2.state.opt_state))
    # and the restored state must actually be usable: take a train step
    for batch in mt:
        metrics = trainer2.do_train_step(batch)
        break
    assert np.isfinite(float(metrics["loss"]))
