"""Raw-image path: run the CLIP encoder inside the model forward.

Reference: src/vis_encoder.py (get_vis_encoder) + VLBart.vis_forward
(src/modeling_bart.py:1604-1620) — with --feature_type raw_<backbone> the
batch carries raw images and the visual features are computed on the fly,
optionally end-to-end trainable (--unfreeze_vis_encoder / --use_vis_adapter).

Here the encoder and the VL model live in ONE flax module so the whole
raw-image step jits as a single XLA program and the freezing engine sees
'vis_encoder.*' paths.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vlpet_tpu.config import VLModelConfig
from vlpet_tpu.pet.modules import PetContext
from vlpet_tpu.vision.clip import RAW_FEAT_DIMS, CLIPVisualEncoder


class RawInputVLModel(nn.Module):
    """CLIP visual trunk + VLBart/VLT5 in one module.

    __call__ accepts ``images`` (B, H, W, 3) instead of precomputed
    vis_feats; boxes are zeros (reference: vis_forward sets vis_pos zeros).
    """

    cfg: VLModelConfig
    vis_backbone: str = "RN101"
    image_size: int = 224
    vis_adapter_type: Optional[str] = None
    vis_reduction_factor: int = 2
    use_bn: bool = True
    vis_pooling_output: bool = False

    def setup(self):
        from vlpet_tpu.models.t5 import VLT5
        from vlpet_tpu.models.vlbart import VLBart

        self.vis_encoder = CLIPVisualEncoder(
            backbone=self.vis_backbone, image_size=self.image_size,
            adapter_type=self.vis_adapter_type,
            reduction_factor=self.vis_reduction_factor, use_bn=self.use_bn,
            dtype=jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32,
            name="vis_encoder")
        self.vl = (VLT5(self.cfg, name="vl") if self.cfg.is_t5
                   else VLBart(self.cfg, name="vl"))

    def vis_forward(self, images, train: bool = False):
        """(B, H, W, 3) → single-image features, or (B, n, H, W, 3) →
        n-image features laid out as n·V_L tokens per example with
        img_order_ids 0..n-1 and duplicated obj_order_ids (the NLVR
        two-image layout; reference: nlvr_model.py:17-45 flattens
        (B, 2, ...) → (2B, ...) through the trunk then views the features
        back to (B, 2·V_L, -1)).

        Returns (feats, boxes, img_order_ids, obj_order_ids); the order ids
        are None for the single-image case."""
        n_images = images.shape[1] if images.ndim == 5 else 1
        if n_images > 1:
            B = images.shape[0]
            images = images.reshape((B * n_images,) + images.shape[2:])
        grid, pooled = self.vis_encoder(images, train=train)
        feats = pooled if self.vis_pooling_output else grid
        if n_images > 1:
            V_L = feats.shape[1]
            feats = feats.reshape(B, n_images * V_L, feats.shape[-1])
            img_order_ids = jnp.repeat(
                jnp.arange(n_images, dtype=jnp.int32), V_L)[None]
            obj_order_ids = jnp.tile(jnp.arange(V_L, dtype=jnp.int32),
                                     n_images)[None]
        else:
            img_order_ids = obj_order_ids = None
        B, L, _ = feats.shape
        boxes = jnp.zeros((B, L, 4), feats.dtype)
        return feats, boxes, img_order_ids, obj_order_ids

    def __call__(self, input_ids, attention_mask, images, labels=None,
                 decoder_input_ids=None, ctx: PetContext = None,
                 deterministic: bool = True, reduce_loss: bool = False,
                 train_vis: bool = False) -> Dict[str, Any]:
        feats, boxes, img_order_ids, obj_order_ids = self.vis_forward(
            images, train=train_vis)
        return self.vl(input_ids, attention_mask, vis_feats=feats, boxes=boxes,
                       img_order_ids=img_order_ids,
                       obj_order_ids=obj_order_ids, labels=labels,
                       decoder_input_ids=decoder_input_ids, ctx=ctx,
                       deterministic=deterministic, reduce_loss=reduce_loss)

    # --- generation-facing methods (vlpet_tpu.models.generate protocol) -----

    def encode(self, input_ids, attention_mask, images, boxes=None,
               img_order_ids=None, obj_order_ids=None, vis_attention_mask=None,
               ctx: PetContext = None):
        """Images ride in the vis_feats slot of the generation protocol —
        the CLIP trunk runs here, then the joint encoder."""
        feats, fboxes, f_img_order, f_obj_order = self.vis_forward(
            images, train=False)
        return self.vl.encode(input_ids, attention_mask, feats, fboxes,
                              f_img_order if img_order_ids is None
                              else img_order_ids,
                              f_obj_order if obj_order_ids is None
                              else obj_order_ids,
                              vis_attention_mask, ctx)

    def init_decode(self, encoder_hidden_states, ctx: PetContext = None):
        return self.vl.init_decode(encoder_hidden_states, ctx)

    def decode_step(self, decoder_input_ids, joint_mask, cross_kvs, cache,
                    decode_pos, ctx: PetContext = None, beam_anc=None):
        return self.vl.decode_step(decoder_input_ids, joint_mask, cross_kvs,
                                   cache, decode_pos, ctx, beam_anc)

    def decode_step_topk(self, decoder_input_ids, joint_mask, cross_kvs, cache,
                         decode_pos, k: int, ctx: PetContext = None,
                         beam_anc=None):
        return self.vl.decode_step_topk(decoder_input_ids, joint_mask,
                                        cross_kvs, cache, decode_pos, k, ctx,
                                        beam_anc)

    def init_decoder_prefix(self, batch_size: int):
        return self.vl.init_decoder_prefix(batch_size)


def raw_feat_dim(backbone: str) -> int:
    """feat_dim per raw backbone (reference: multitask.py:648-660)."""
    return RAW_FEAT_DIMS[backbone]
