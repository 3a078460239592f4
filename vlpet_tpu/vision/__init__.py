"""CLIP visual encoders (Flax) for the raw-image ("raw_*" feature_type) path."""

from vlpet_tpu.vision.clip import (
    AttentionPool2d,
    CLIPVisualEncoder,
    ModifiedResNet,
    VisualAdapter,
    VisualTransformer,
    get_vis_encoder,
)
