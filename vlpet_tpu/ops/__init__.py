"""Pallas TPU kernels for hot PET ops."""

from vlpet_tpu.ops.attention import fused_attention, fused_attention_reference
