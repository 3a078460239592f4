"""Video-text multitask entry point (reference: src/multitask_video.py).

Reproduces: tvqa+how2qa+tvc+yc2c on CLIP-ViT frame features (feat_dim forced
to 512, reference: multitask_video.py:738), n_boxes=64 time-resized frames,
qa-predict + caption-predict evaluation (:628-723).

Run: python -m vlpet_tpu.cli.multitask_video --tasks tvqa,how2qa,tvc,yc2c ...
"""

from __future__ import annotations

from vlpet_tpu.cli.param import build_model_config, parse_args
from vlpet_tpu.data.multitask import MultitaskLoader
from vlpet_tpu.data.tokenization import effective_vocab_size, get_tokenizer
from vlpet_tpu.data.video import build_video_loader

VIDEO_TASKS = ("tvqa", "how2qa", "tvc", "yc2c")


def main(argv=None):
    args = parse_args(argv)
    # multi-host: must run before any backend-initializing jax call
    from vlpet_tpu.parallel.multihost import maybe_initialize_distributed
    maybe_initialize_distributed(args)
    args.feat_dim = 512  # CLIP-ViT frame features (reference: :738)
    tasks = tuple(t for t in args.tasks.split(",") if t) or VIDEO_TASKS
    tokenizer, added = get_tokenizer(args.backbone, args.tokenizer_path)
    cfg = build_model_config(args, tasks,
                             vocab_size=effective_vocab_size(tokenizer, added))

    train_loaders = [build_video_loader(t, args, tokenizer, args.train,
                                        "train", args.data_root)
                     for t in tasks]
    val_loaders = [build_video_loader(t, args, tokenizer, args.valid, "val",
                                      args.data_root)
                   for t in tasks]
    mt = MultitaskLoader(train_loaders, sampling=args.multitask_sampling)
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

    if args.infer_only or args.test_only:
        for loader in val_loaders:
            print(loader.task, trainer.evaluate(loader,
                                                num_beams=args.num_beams,
                                                max_length=args.gen_max_length))
        return trainer

    history = trainer.train(mt, epochs=args.epochs, val_loaders=val_loaders)
    return trainer, history


if __name__ == "__main__":
    main()
