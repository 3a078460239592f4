#!/bin/bash
# LoRA baseline (reference: scripts/image-text/single_lora.sh)
# usage: bash single_lora.sh <lr> <lora_dim> <seed>
python -m vlpet_tpu.cli.multitask_video \
    --optim adamw --warmup_ratio 0.1 --clip_grad_norm 5 --lr $1 --epochs 20 \
    --backbone facebook/bart-base --output snap/VLBart_video_multitask/single_lora_lr$1_seed$3 \
    --num_beams 5 --batch_size 50 --valid_batch_size 50 \
    --use_tasks_prompts --tasks "tvqa,how2qa,tvc,yc2c" \
    --feature_type RN101 --n_boxes 64 --image_size "(224,224)" \
    --use_lora --lora_dim $2 --use_single_lora \
    --seed $3
