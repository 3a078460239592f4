"""Video-text path: prompt construction, loaders, end-to-end training."""

import numpy as np
import pytest

from vlpet_tpu.cli.param import build_model_config, parse_args
from vlpet_tpu.data.multitask import MultitaskLoader
from vlpet_tpu.data.tokenization import WhitespaceTokenizer
from vlpet_tpu.data.video import (
    build_qa_prompt,
    build_video_loader,
    synthetic_video_data,
)


def test_qa_prompt_format():
    d = {"vid_name": "v1", "q": "who is there?", "ts": "1.1-2.2",
         "a0": "alice.", "a1": "bob", "a2": "c", "a3": "d", "a4": "e"}
    subs = {"v1": [{"text": "hello "}, {"text": "world"}]}
    p = build_qa_prompt(d, subs)
    assert p.startswith("[Subs] hello world")
    assert "[Q] who is there?" in p
    assert "[TS] (1.1-2.2)" in p
    assert "[Choices] a0: alice. a1: bob." in p


def test_video_loader_shapes():
    argv = ["--tasks", "tvqa", "--batch_size", "2", "--n_boxes", "8",
            "--feat_dim", "16", "--synthetic_examples", "6",
            "--gen_max_length", "4"]
    args = parse_args(argv)
    loader = build_video_loader("tvqa", args, WhitespaceTokenizer(), "train",
                                "train")
    batch = next(iter(loader))
    assert batch["vis_feats"].shape == (2, 8, 16)
    assert batch["target_ids"].shape[1] == 4
    assert batch["task"] == "tvqa"


def test_video_multitask_end_to_end(tmp_path):
    import dataclasses
    from vlpet_tpu.config import BartConfig
    from vlpet_tpu.train.trainer import Trainer

    tasks = ("tvqa", "tvc")
    argv = ["--tasks", "tvqa,tvc", "--backbone", "facebook/bart-base",
            "--batch_size", "2", "--n_boxes", "8", "--feat_dim", "16",
            "--synthetic_examples", "6", "--gen_max_length", "4",
            "--use_adapter", "--use_single_adapter", "--no_encoder_adapter",
            "--use_adapter_down_dim", "--use_encoder_adapter_down_multihead",
            "--adapter_down_dim", "8", "--encoder_adapter_multihead_num_head", "4",
            "--use_encoder_adapter_gating_small_xy_cat",
            "--unfreeze_encoder_layer_norms", "--no_decoder_adapter",
            "--use_decoder_enc_attn_value_parallel_adapter_down_dim",
            "--decoder_enc_attn_value_parallel_adapter_down_dim", "8"]
    args = parse_args(argv)
    args.feat_dim = 16
    tok = WhitespaceTokenizer(vocab_size=512)
    cfg = build_model_config(args, tasks, vocab_size=512)
    cfg = dataclasses.replace(
        cfg, backbone=BartConfig(vocab_size=512, d_model=32, encoder_layers=2,
                                 decoder_layers=2, encoder_attention_heads=4,
                                 decoder_attention_heads=4, encoder_ffn_dim=64,
                                 decoder_ffn_dim=64, max_position_embeddings=768,
                                 dropout=0.0))
    train = [build_video_loader(t, args, tok, "train", "train") for t in tasks]
    val = [build_video_loader(t, args, tok, "valid", "val") for t in tasks]
    mt = MultitaskLoader(train)
    trainer = Trainer(cfg, tasks, lr=1e-3, total_steps=len(mt),
                      tokenizer=tok, output_dir=str(tmp_path), verbose=False)
    hist = trainer.train(mt, epochs=1, val_loaders=val)
    m = hist[0]
    assert np.isfinite(m["train_loss"])
    assert "tvqa/overall" in m
    assert "tvc/CIDEr" in m


def test_matching_variant():
    """TVQA matching formulation: 5 true/false rows per question, argmax
    scoring (reference: video_matching_model.py + tvqa_matching_data.py)."""
    from vlpet_tpu.data.video import (
        MatchingEvaluator,
        expand_matching_examples,
        synthetic_video_data,
    )
    from vlpet_tpu.data.datasets import DatasetConfig, Loader, TaskDataset
    from vlpet_tpu.train.trainer import Trainer, predict_matching
    import dataclasses
    from vlpet_tpu.config import BartConfig
    from vlpet_tpu.cli.param import build_model_config, parse_args

    examples, source, _ = synthetic_video_data("tvqa", 4, n_frames=4,
                                               feat_dim=8)
    rows = expand_matching_examples(examples)
    assert len(rows) == 20
    assert sum(r["answer"] == "true" for r in rows) == 4

    tok = WhitespaceTokenizer(vocab_size=512)
    args = parse_args(["--tasks", "tvqa", "--backbone", "facebook/bart-base",
                       "--feat_dim", "8", "--n_boxes", "4"])
    cfg = dataclasses.replace(
        build_model_config(args, ("tvqa",), vocab_size=512),
        backbone=BartConfig(vocab_size=512, d_model=32, encoder_layers=1,
                            decoder_layers=1, encoder_attention_heads=4,
                            decoder_attention_heads=4, encoder_ffn_dim=64,
                            decoder_ffn_dim=64, max_position_embeddings=768,
                            dropout=0.0))
    ds = TaskDataset(DatasetConfig(task="tvqa", max_text_length=64,
                                   gen_max_length=4, n_boxes=4, feat_dim=8),
                     rows, source, tok)
    loader = Loader(ds, 5, shuffle=False, drop_last=False)
    trainer = Trainer(cfg, ("tvqa",), lr=1e-3, total_steps=2, tokenizer=tok,
                      verbose=False)
    groups = predict_matching(trainer, loader)
    assert len(groups) == 4 and all(len(v) == 5 for v in groups.values())
    ev = MatchingEvaluator(examples)
    res = ev.evaluate(groups)
    assert 0.0 <= res["overall"] <= 1.0
