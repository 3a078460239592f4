"""Inference-only entry (reference: src/multitask_infer.py): load a trained
checkpoint (--load_trained_model_path <dir-or-npz>) and run test-only eval;
also hosts the gate-heatmap dump path (--use_store_gate_large
--store_gate_path, reference: my_transformers/modeling_bart.py:1200-1205) —
here the VL-PET-large gate activations are captured per layer via flax
``sow`` and written as .npy files instead of torch.save+exit.
"""

from __future__ import annotations

import os

import numpy as np

from vlpet_tpu.cli.multitask import build_loaders
from vlpet_tpu.cli.param import build_model_config, parse_args
from vlpet_tpu.data.tokenization import effective_vocab_size, get_tokenizer


def dump_gates(trainer, loader, store_path: str):
    """Run one batch through the encoder capturing the large-gate activations
    (the reference's heatmap dump)."""
    import jax

    from vlpet_tpu.pet.modules import PetContext
    from vlpet_tpu.train.trainer import array_batch

    os.makedirs(store_path, exist_ok=True)
    batch = next(iter(loader))
    arr = array_batch(batch)
    ctx = PetContext(task=loader.task, task_idx=trainer.task_idx(loader.task))
    _, state = trainer.model.apply(
        {"params": trainer.merged_params}, arr["input_ids"],
        arr["attention_mask"], vis_feats=arr.get("vis_feats"),
        boxes=arr.get("boxes"), labels=arr.get("target_ids"), ctx=ctx,
        deterministic=True, mutable=["intermediates"])
    inter = state.get("intermediates", {})
    n = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(inter)[0]:
        name = "_".join(str(getattr(k, "key", k)) for k in path)
        if "gate" in name:
            np.save(os.path.join(store_path,
                                 f"{loader.task}_{name}.npy"), np.asarray(leaf))
            n += 1
    print(f"stored {n} gate tensors to {store_path}")


def main(argv=None):
    args = parse_args(argv)
    # multi-host: must run before any backend-initializing jax call
    from vlpet_tpu.parallel.multihost import maybe_initialize_distributed
    maybe_initialize_distributed(args)
    args.test_only = True
    tasks = tuple(t for t in args.tasks.split(",") if t) or ("vqa",)
    tokenizer, added = get_tokenizer(args.backbone, args.tokenizer_path)
    cfg = build_model_config(args, tasks,
                             vocab_size=effective_vocab_size(tokenizer, added))
    val_loaders = build_loaders(args, tasks, tokenizer, args.valid, "val")

    from vlpet_tpu.train.trainer import Trainer

    trainer = Trainer(cfg, tasks, lr=args.lr, total_steps=1,
                      tokenizer=tokenizer, output_dir=args.output,
                      backbone_ckpt=args.backbone_ckpt,
                      load=args.load_trained_model_path or args.load,
                      mesh_model_axis=args.mesh_model_axis)
    if args.use_store_gate_large and args.store_gate_path:
        for loader in val_loaders:
            dump_gates(trainer, loader, args.store_gate_path)
        return trainer
    for loader in val_loaders:
        print(loader.task, trainer.evaluate(loader, num_beams=args.num_beams,
                                            max_length=args.gen_max_length))
    return trainer


if __name__ == "__main__":
    main()
