"""raw_* feature-type path: ImageFolderSource → batch['images'] → CLIP trunk
inside the train step (RawInputVLModel) → generation/eval.

Covers the full wiring the reference's raw feature_type provides
(multitask.py:648-660 + vis_forward): CLI source routing, dataset/collation
image handling, the raw Trainer mode, and generation through the CLIP trunk.
"""

import dataclasses
import json

import numpy as np
import pytest

from vlpet_tpu.cli.param import build_model_config, parse_args
from vlpet_tpu.config import BartConfig
from vlpet_tpu.data.tokenization import get_tokenizer


def make_data_root(tmp_path, n=6):
    from PIL import Image

    root = tmp_path / "data"
    (root / "images").mkdir(parents=True)
    rng = np.random.default_rng(0)
    examples = []
    for i in range(n):
        arr = rng.integers(0, 255, (80, 96, 3)).astype(np.uint8)
        Image.fromarray(arr).save(root / "images" / f"img{i}.png")
        examples.append({"img_id": f"img{i}", "sent": "what color is this",
                         "question_id": i, "label": {"red": 1.0}})
    (root / "vqa_train.json").write_text(json.dumps(examples))
    (root / "vqa_valid.json").write_text(json.dumps(examples[:2]))
    return root


ARGV = ["--tasks", "vqa", "--feature_type", "raw_RN50",
        "--image_size", "(64,64)", "--feat_dim", "2048", "--n_boxes", "4",
        "--batch_size", "2", "--valid_batch_size", "2", "--epochs", "1",
        "--train_topk", "4", "--valid_topk", "2", "--lr", "1e-3",
        "--use_adapter", "--use_single_adapter", "--use_adapter_down_dim",
        "--adapter_down_dim", "8", "--use_vis_adapter",
        "--vis_adapter_type", "middle-bottleneck",
        "--vis_reduction_factor", "2"]


def tiny(cfg):
    backbone = BartConfig(vocab_size=512, d_model=32, encoder_layers=2,
                          decoder_layers=2, encoder_attention_heads=4,
                          decoder_attention_heads=4, encoder_ffn_dim=64,
                          decoder_ffn_dim=64, max_position_embeddings=64,
                          dropout=0.0)
    return dataclasses.replace(cfg, backbone=backbone)


def test_feature_source_routes_raw(tmp_path):
    from vlpet_tpu.cli.multitask import feature_source_for
    from vlpet_tpu.data.features import ImageFolderSource

    root = make_data_root(tmp_path)
    args = parse_args(ARGV + ["--data_root", str(root)])
    src = feature_source_for(args, "vqa")
    assert isinstance(src, ImageFolderSource)
    img = src.get_image("img0")
    assert img.shape == (64, 64, 3)


def make_nlvr_data_root(tmp_path, n=6):
    """Reference-format NLVR split json (img0/img1 keys,
    reference: nlvr_raw_data.py:133, nlvr_data.py:360-361) + raw images."""
    from PIL import Image

    root = tmp_path / "data"
    (root / "images").mkdir(parents=True)
    rng = np.random.default_rng(0)
    examples = []
    for i in range(n):
        for k in (0, 1):
            arr = rng.integers(0, 255, (80, 96, 3)).astype(np.uint8)
            Image.fromarray(arr).save(root / "images" / f"ex{i}-img{k}.png")
        examples.append({"img0": f"ex{i}-img0", "img1": f"ex{i}-img1",
                         "sent": "the left image has a red ball",
                         "uid": f"nlvr-{i}",
                         "identifier": f"test1-{i // 2}-{i % 2}-0",
                         "label": int(rng.integers(0, 2))})
    (root / "nlvr_train.json").write_text(json.dumps(examples))
    (root / "nlvr_valid.json").write_text(json.dumps(examples[:2]))
    return root


def test_raw_nlvr_end_to_end(tmp_path):
    """raw-image NLVR: two images per example through the CLIP trunk
    in-step → 2·V_L visual tokens with img_order_ids 0/1 (reference:
    nlvr_raw_data.py:132-144, nlvr_model.py:17-45, multitask.py:664)."""
    from vlpet_tpu.cli.multitask import build_loaders, parse_image_size
    from vlpet_tpu.data.multitask import MultitaskLoader
    from vlpet_tpu.train.trainer import Trainer

    root = make_nlvr_data_root(tmp_path)
    argv = [a for a in ARGV]
    argv[argv.index("--tasks") + 1] = "nlvr"
    args = parse_args(argv + ["--data_root", str(root),
                              "--output", str(tmp_path / "run")])
    tokenizer, _ = get_tokenizer("facebook/bart-base", None)
    cfg = tiny(build_model_config(args, ("nlvr",), vocab_size=tokenizer.vocab_size))
    cfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone,
                                          vocab_size=tokenizer.vocab_size))

    train_loaders = build_loaders(args, ("nlvr",), tokenizer, "train", "train")
    val_loaders = build_loaders(args, ("nlvr",), tokenizer, "valid", "val")
    batch = next(iter(train_loaders[0]))
    # (B, 2, H, W, 3): two raw images per example
    assert batch["images"].shape[1:] == (2, 64, 64, 3)
    assert "vis_feats" not in batch

    mt = MultitaskLoader(train_loaders)
    trainer = Trainer(cfg, ("nlvr",), lr=1e-3, total_steps=len(mt),
                      tokenizer=tokenizer, verbose=False,
                      raw_vis_backbone="RN50",
                      image_size=parse_image_size(args.image_size),
                      vis_adapter_type=args.vis_adapter_type)
    history = trainer.train(mt, epochs=1)
    assert np.isfinite(history[0]["train_loss"])

    quesid2ans = trainer.predict_nlvr(val_loaders[0])
    assert len(quesid2ans) == 2
    assert all(p in (0, 1) for p in quesid2ans.values())
    res = val_loaders[0].evaluator.evaluate(quesid2ans)
    assert 0.0 <= res["accuracy"] <= 100.0 and "consistency" in res


def test_raw_end_to_end(tmp_path):
    from vlpet_tpu.cli.multitask import build_loaders, parse_image_size
    from vlpet_tpu.data.multitask import MultitaskLoader
    from vlpet_tpu.train.trainer import Trainer

    root = make_data_root(tmp_path)
    args = parse_args(ARGV + ["--data_root", str(root),
                              "--output", str(tmp_path / "run")])
    tokenizer, _ = get_tokenizer(args.backbone.replace("t5-base",
                                                       "facebook/bart-base"),
                                 None)
    tokenizer.vocab_size = 512
    cfg = tiny(build_model_config(args, ("vqa",), vocab_size=512))

    train_loaders = build_loaders(args, ("vqa",), tokenizer, "train", "train")
    val_loaders = build_loaders(args, ("vqa",), tokenizer, "valid", "val")
    batch = next(iter(train_loaders[0]))
    assert "images" in batch and batch["images"].shape[1:] == (64, 64, 3)
    assert "vis_feats" not in batch

    mt = MultitaskLoader(train_loaders)
    trainer = Trainer(cfg, ("vqa",), lr=1e-3, total_steps=len(mt),
                      tokenizer=tokenizer, verbose=False,
                      raw_vis_backbone="RN50",
                      image_size=parse_image_size(args.image_size),
                      vis_adapter_type=args.vis_adapter_type)
    # vis adapter must be trainable, CLIP trunk frozen
    assert trainer.report["percentage"] < 50
    history = trainer.train(mt, epochs=1)
    assert np.isfinite(history[0]["train_loss"])

    res = trainer.predict(val_loaders[0], num_beams=1, max_length=4)
    assert len(res["quesid2ans"]) == 2
