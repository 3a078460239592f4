"""Single-task entry points (reference: src/{vqa,gqa,nlvr,caption}.py and
src/{tvqa,how2qa,tvc,yc2c}.py — same Trainer pattern for one task each).

Run: python -m vlpet_tpu.cli.single_task vqa --batch_size ... (or use the
task-named console wrappers in scripts/)."""

from __future__ import annotations

import sys

from vlpet_tpu.cli.multitask import build_loaders
from vlpet_tpu.cli.param import build_model_config, parse_args
from vlpet_tpu.data.multitask import MultitaskLoader
from vlpet_tpu.data.tokenization import effective_vocab_size, get_tokenizer
from vlpet_tpu.data.video import VIDEO_CAP_TASKS, VIDEO_QA_TASKS, build_video_loader

IMAGE_TASKS = ("vqa", "gqa", "nlvr", "caption")


def main(task: str, argv=None):
    args = parse_args(argv)
    # multi-host: must run before any backend-initializing jax call
    from vlpet_tpu.parallel.multihost import maybe_initialize_distributed
    maybe_initialize_distributed(args)
    args.tasks = task
    tasks = (task,)
    if task in VIDEO_QA_TASKS or task in VIDEO_CAP_TASKS:
        args.feat_dim = 512
    tokenizer, added = get_tokenizer(args.backbone, args.tokenizer_path)
    cfg = build_model_config(args, tasks,
                             vocab_size=effective_vocab_size(tokenizer, added))

    if task in IMAGE_TASKS:
        train_loaders = build_loaders(args, tasks, tokenizer, args.train, "train")
        val_loaders = build_loaders(args, tasks, tokenizer, args.valid, "val")
    else:
        train_loaders = [build_video_loader(task, args, tokenizer, args.train,
                                            "train", args.data_root)]
        val_loaders = [build_video_loader(task, args, tokenizer, args.valid,
                                          "val", args.data_root)]
    mt = MultitaskLoader(train_loaders)
    total_steps = max(1, len(mt) * args.epochs)

    from vlpet_tpu.train.trainer import Trainer

    trainer = Trainer(
        cfg, tasks, lr=args.lr, total_steps=total_steps,
        warmup_ratio=args.warmup_ratio, weight_decay=args.weight_decay,
        clip_grad_norm=args.clip_grad_norm, seed=args.seed,
        output_dir=args.output, tokenizer=tokenizer,
        backbone_ckpt=args.backbone_ckpt, load=args.load,
        mesh_model_axis=args.mesh_model_axis,
        gradient_accumulation_steps=args.gradient_accumulation_steps)
    if args.resume:
        step = trainer.restore()
        if step is not None:
            print(f"resumed from step {step}")
    if args.test_only or args.infer_only:
        for loader in val_loaders:
            print(loader.task, trainer.evaluate(loader,
                                                num_beams=args.num_beams,
                                                max_length=args.gen_max_length))
        return trainer
    history = trainer.train(mt, epochs=args.epochs, val_loaders=val_loaders)
    return trainer, history


if __name__ == "__main__":
    task = sys.argv[1]
    main(task, sys.argv[2:])
