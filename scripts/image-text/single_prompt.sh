#!/bin/bash
# Prompt-tuning baseline (reference: scripts/image-text/single_prompt.sh)
# usage: bash single_prompt.sh <lr> <seed>
python -m vlpet_tpu.cli.multitask \
    --optim adamw --warmup_ratio 0.1 --clip_grad_norm 5 --lr $1 --epochs 20 \
    --backbone facebook/bart-base --output snap/VLBart_multitask/single_prompt_lr$1_seed$2 \
    --num_beams 5 --batch_size 500 --valid_batch_size 500 \
    --use_tasks_prompts --tasks "vqa,gqa,nlvr,caption" \
    --feature_type RN101 --n_boxes 36 --downsample --image_size "(224,224)" \
    --encoder_prompt_len 40 --mid_dim 800 --use_single_prompt \
    --seed $2
