"""Pallas TPU kernels for hot PET ops."""

from vlpet_tpu.ops.fused_pet import fused_multihead_adapter_gate
