#!/bin/bash
# Compacter baseline (reference: scripts/image-text/single_compacter.sh)
# usage: bash single_compacter.sh <lr> <hypercomplex_division> <seed>
python -m vlpet_tpu.cli.multitask_video \
    --optim adamw --warmup_ratio 0.1 --clip_grad_norm 5 --lr $1 --epochs 20 \
    --backbone facebook/bart-base --output snap/VLBart_video_multitask/single_compacter_lr$1_seed$3 \
    --num_beams 5 --batch_size 50 --valid_batch_size 50 \
    --use_tasks_prompts --tasks "tvqa,how2qa,tvc,yc2c" \
    --feature_type RN101 --n_boxes 64 --image_size "(224,224)" \
    --hypercomplex_division $2 --reduction_factor 8 --use_compacter \
    --shared_phm_rule False --factorized_phm False \
    --unfreeze_layer_norms --use_single_adapter \
    --seed $3
