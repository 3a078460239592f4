#!/bin/bash
# VL-PET-large on BART-base, image-text multitask (mirrors the reference
# scripts/image-text/VL-PET-large.sh flag recipe; torch.distributed.launch
# is replaced by SPMD over the TPU mesh).
# usage: bash VL-PET-large.sh <port-unused> <r> <Nh> <gate_r> <dec_r> <lr> <seed>
model="bart"
backbone="facebook/bart-base"
batch_size=50
feature=RN101
lr=$6
name=Encoder_MultiheadDownAdapter_dim$2_head$3_Gating_middleX_Decoder_VPAdapter_dim$5_lr$6_seed$7
output=snap/VLBart_video_multitask/$name

python -m vlpet_tpu.cli.multitask_video \
    --optim adamw \
    --warmup_ratio 0.1 \
    --clip_grad_norm 5 \
    --lr ${lr} \
    --epochs 20 \
    --backbone ${backbone} \
    --output $output \
    --num_beams 5 \
    --batch_size ${batch_size} \
    --valid_batch_size ${batch_size} \
    --reduction_factor 8 \
    --use_tasks_prompts \
    --tasks "tvqa,how2qa,tvc,yc2c" \
    --feature_type ${feature} --n_boxes 64 \
    --image_size "(224,224)" \
    --run_name $name \
    --use_adapter \
    --use_single_adapter \
    --no_encoder_adapter \
    --use_adapter_down_dim \
    --use_encoder_adapter_down_multihead \
    --adapter_down_dim $2 \
    --encoder_adapter_multihead_num_head $3 \
    --use_encoder_adapter_gating_middle_xy_add \
    --unfreeze_encoder_layer_norms \
    --no_decoder_adapter \
    --use_decoder_enc_attn_value_parallel_adapter_down_dim \
    --decoder_enc_attn_value_parallel_adapter_down_dim $5 \
    --seed $7
