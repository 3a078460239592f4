"""vlpet_tpu — TPU-native VL-PET framework.

A from-scratch JAX/Flax/pjit re-implementation of the capabilities of
HenryHZY/VL-PET (ICCV 2023): parameter-efficient tuning of vision-augmented
BART/T5 encoder-decoders on image-text and video-text tasks, designed for
TPU (SPMD over a device mesh, XLA-compiled train/eval steps, fused PET
epilogues) rather than a port of the PyTorch reference.

Layering (mirrors SURVEY.md §1):
  pet/       PET module library (adapters, gates, LoRA, IA3, PHM, prompts, hypernets)
  models/    Flax BART/T5 backbones with typed PET hook points + VL glue
  vision/    CLIP visual encoder (Flax) for the raw-image path
  data/      feature readers, per-task datasets, multitask mixing, tokenization
  evalsuite/ VQA/GQA/NLVR2/COCO-caption/video evaluators
  train/     trainer, freezing engine, optimizer, checkpointing
  parallel/  mesh + sharding rules (data/model axes)
  ops/       Pallas TPU kernels for hot PET epilogues
  cli/       argparse surface compatible with the reference scripts
"""

__version__ = "0.1.0"
