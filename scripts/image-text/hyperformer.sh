#!/bin/bash
# Hyperformer baseline (reference: scripts/image-text/hyperformer.sh)
# usage: bash hyperformer.sh <lr> <projected_task_embedding_dim> <seed>
python -m vlpet_tpu.cli.multitask \
    --optim adamw --warmup_ratio 0.1 --clip_grad_norm 5 --lr $1 --epochs 20 \
    --backbone facebook/bart-base --output snap/VLBart_multitask/hyperformer_lr$1_seed$3 \
    --num_beams 5 --batch_size 500 --valid_batch_size 500 \
    --tasks "vqa,gqa,nlvr,caption" \
    --feature_type RN101 --n_boxes 36 --downsample --image_size "(224,224)" \
    --use_hyperformer --unique_hyper_net --unfreeze_layer_norms \
    --projected_task_embedding_dim $2 --reduction_factor 8 \
    --seed $3
