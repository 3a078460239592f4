"""Image-text multitask entry point (reference: src/multitask.py).

Reproduces the reference's run layout: per-task batch-size scaling
(gqa bs·100/60, nlvr bs·20/60, caption bs·50/60 — multitask.py:682-695),
task prompts ("vqa: " etc. — :697-706), roundrobin multitask training, and
per-epoch VQA/GQA/NLVR/caption eval.

Run:  python -m vlpet_tpu.cli.multitask --tasks vqa,gqa,nlvr,caption ...
(the bash scripts under scripts/image-text pass the same flags as the
reference's).
"""

from __future__ import annotations

import math
import os
import re
from typing import Dict, List, Optional, Tuple

import numpy as np

from vlpet_tpu.cli.param import build_model_config, parse_args
from vlpet_tpu.data.datasets import (
    TASK_PROMPTS,
    DatasetConfig,
    Loader,
    TaskDataset,
    build_image_text_dataset,
    synthetic_task_data,
)
from vlpet_tpu.data.features import (
    DictFeatureSource,
    MonolithicH5Source,
    PackedFeatureSource,
    PerImageH5Source,
)
from vlpet_tpu.data.multitask import MultitaskLoader
from vlpet_tpu.data.tokenization import effective_vocab_size, get_tokenizer
from vlpet_tpu.evalsuite import (
    COCOCaptionEvaluator,
    GQAEvaluator,
    NLVR2Evaluator,
    VQAEvaluator,
)

# per-task batch scaling (reference: multitask.py:682-695)
BATCH_SCALE = {"vqa": 1.0, "gqa": 100 / 60, "nlvr": 20 / 60, "caption": 50 / 60}
# per-task max text lengths (reference: multitask.py:683-695)
TEXT_LEN = {"vqa": 20, "gqa": 20, "nlvr": 30, "caption": 40}
GEN_LEN = {"vqa": 10, "gqa": 10, "nlvr": 10, "caption": 40}


def task_batch_size(task: str, base: int) -> int:
    return max(1, int(base * BATCH_SCALE.get(task, 1.0)))


def parse_image_size(s) -> int:
    """--image_size is reference-format: '(448,448)' or an int string."""
    if isinstance(s, int):
        return s
    digits = [int(x) for x in re.findall(r"\d+", str(s))]
    return digits[0] if digits else 224


def feature_source_for(args, task: str):
    """Pick the loader family by --feature_type (reference: multitask.py:638-680):
    'butd' → monolithic h5 with boxes; 'raw_*' → raw images (on-the-fly CLIP
    trunk inside the train step, vision.vis_encoder.RawInputVLModel); else →
    per-image clip-feature h5 (or a packed mmap if present)."""
    root = args.data_root
    if root is None:
        return None
    if args.feature_type.startswith("raw_"):
        from vlpet_tpu.data.features import ImageFolderSource

        return ImageFolderSource(
            os.path.join(root, "images"),
            image_size=parse_image_size(getattr(args, "image_size", 224)))
    packed = os.path.join(root, f"{task}_features")
    if os.path.exists(packed + ".npy"):
        return PackedFeatureSource(packed)
    if args.feature_type == "butd":
        return MonolithicH5Source(os.path.join(root, f"{task}_obj36.h5"))
    return PerImageH5Source(os.path.join(root, "clip_features",
                                         args.feature_type))


def load_ans2label(args) -> Dict[str, int]:
    """Topk answer vocabulary for the classifier head (reference:
    vqa_data.py trainval_ans2label.json). With no data_root (synthetic
    runs) a small fixed vocabulary is used."""
    if args.data_root:
        import json

        path = os.path.join(args.data_root, "trainval_ans2label.json")
        with open(path) as f:
            return json.load(f)
    return {a: i for i, a in enumerate(["yes", "no", "0", "1", "2", "3"])}


def make_evaluator(task: str, examples: List[Dict]):
    if task == "vqa":
        id2datum = {e.get("question_id"): e for e in examples}
        id2gt = {e.get("question_id"): e for e in examples if "answers" in e}
        return VQAEvaluator(id2datum, id2gt)
    if task == "gqa":
        return GQAEvaluator({e.get("question_id"): e for e in examples})
    if task == "nlvr":
        id2uid = {e["identifier"]: e.get("uid", i)
                  for i, e in enumerate(examples)}
        return NLVR2Evaluator(examples, id2uid,
                              {e.get("uid", i): e for i, e in enumerate(examples)})
    if task == "caption":
        return COCOCaptionEvaluator()
    return None


def build_loaders(args, tasks: Tuple[str, ...], tokenizer, split: str,
                  mode: str) -> List[Loader]:
    loaders = []
    for task in tasks:
        cfg = DatasetConfig(
            task=task,
            max_text_length=TEXT_LEN.get(task, args.max_text_length),
            gen_max_length=GEN_LEN.get(task, args.gen_max_length),
            n_boxes=args.n_boxes, feat_dim=int(args.feat_dim),
            prompt=TASK_PROMPTS.get(task, "") if args.use_tasks_prompts else "",
            post_prompt=args.post_prompt,
            raw_label=args.raw_label, answer_normalize=args.answer_normalize,
            classifier=bool(args.classifier and task == "vqa"),
            ans2label=(load_ans2label(args) if args.classifier
                       and task == "vqa" else None),
            use_vision=args.use_vision and not args.no_vis)
        if args.data_root:
            source = feature_source_for(args, task)
            split_json = os.path.join(args.data_root, f"{task}_{split}.json")
            ds = build_image_text_dataset(
                task, split_json, source, tokenizer, cfg, mode=mode,
                topk=int(args.train_topk if mode == "train" else args.valid_topk),
                seed=args.seed)
        else:
            n = args.synthetic_examples or 64
            grid = None
            if args.downsample:
                grid = int(math.isqrt(args.n_boxes)) * 2  # pre-pool grid
            examples, source = synthetic_task_data(
                task, n, n_boxes=args.n_boxes, feat_dim=int(args.feat_dim),
                grid=grid, seed=args.seed)
            ds = TaskDataset(cfg, examples, source, tokenizer, mode=mode,
                             seed=args.seed)
        bs = task_batch_size(task, args.batch_size if mode == "train"
                             else args.valid_batch_size)
        # per-host disjoint shards (the reference's DistributedSampler role,
        # caption_clip_data.py:372-377); eval shards too — Trainer.predict
        # merges across hosts via process_allgather
        from vlpet_tpu.parallel.multihost import host_shard

        shard, num_shards = host_shard()
        loaders.append(Loader(ds, bs, shuffle=(mode == "train"),
                              drop_last=(mode == "train"),
                              evaluator=make_evaluator(task, ds.examples),
                              shard=shard, num_shards=num_shards))
    return loaders


def main(argv=None):
    args = parse_args(argv)
    # multi-host: must run before any backend-initializing jax call
    from vlpet_tpu.parallel.multihost import maybe_initialize_distributed
    maybe_initialize_distributed(args)
    tasks = tuple(t for t in args.tasks.split(",") if t) or ("vqa",)
    tokenizer, added = get_tokenizer(args.backbone, args.tokenizer_path)
    cfg = build_model_config(args, tasks,
                             vocab_size=effective_vocab_size(tokenizer, added))
    if args.classifier:
        import dataclasses

        cfg = dataclasses.replace(cfg,
                                  num_answers=len(load_ans2label(args)))

    train_loaders = build_loaders(args, tasks, tokenizer, args.train, "train")
    val_loaders = build_loaders(args, tasks, tokenizer, args.valid, "val")
    mt = MultitaskLoader(train_loaders, sampling=args.multitask_sampling)
    total_steps = max(1, len(mt) * args.epochs)

    from vlpet_tpu.train.trainer import Trainer

    raw_kw = {}
    if args.feature_type.startswith("raw_"):
        # 'raw_RN101' etc. — CLIP trunk inside the model (multitask.py:648-660)
        raw_kw = dict(raw_vis_backbone=args.feature_type[len("raw_"):],
                      image_size=parse_image_size(args.image_size),
                      vis_adapter_type=args.vis_adapter_type,
                      vis_pooling_output=args.vis_pooling_output,
                      clip_ckpt=getattr(args, "clip_ckpt", None))
    trainer = Trainer(
        cfg, tasks, lr=args.lr, total_steps=total_steps,
        warmup_ratio=args.warmup_ratio, weight_decay=args.weight_decay,
        clip_grad_norm=args.clip_grad_norm, adam_eps=args.adam_eps,
        adam_beta1=args.adam_beta1, adam_beta2=args.adam_beta2,
        seed=args.seed, output_dir=args.output, tokenizer=tokenizer,
        backbone_ckpt=args.backbone_ckpt, load=args.load,
        mesh_model_axis=args.mesh_model_axis,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        **raw_kw)
    if args.resume:
        step = trainer.restore()
        if step is not None:
            print(f"resumed from step {step}")

    if args.infer_only or args.test_only:
        if args.load_trained_model_path:
            from vlpet_tpu.train.checkpoint import load_params_npz

            merged = trainer.merged_params
            merged, n = load_params_npz(args.load_trained_model_path, merged)
            from vlpet_tpu.train.freezing import split_params

            trainer.state = trainer.state.replace(
                params=split_params(merged, trainer.mask)[0])
            trainer.frozen = split_params(merged, trainer.mask)[1]
        for loader in val_loaders:
            scores = trainer.evaluate(loader, num_beams=args.num_beams,
                                      max_length=args.gen_max_length)
            print(loader.task, scores)
            if loader.task == "caption":
                print(f"[caption metric basis] {COCOCaptionEvaluator.BASIS}")
        return trainer

    history = trainer.train(mt, epochs=args.epochs, val_loaders=val_loaders)
    return trainer, history


if __name__ == "__main__":
    main()
