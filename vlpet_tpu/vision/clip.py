"""CLIP visual encoders in Flax: ModifiedResNet (+ conv VisualAdapters) and
ViT, with the grid-feature wrapper used by the raw-image path.

Reference: src/clip/model.py (Bottleneck :9, VisualAdapter :178,
AttentionPool2d :119, ModifiedResNet :222, VisualTransformer :344) and
src/vis_encoder.py:254-322 (CLIPResNetEncoder: delete the text tower, resize
the attnpool positional embedding to the target grid, return (B, H·W, C)
grid features + pooled vector).

Layout note: convolutions run NHWC (TPU-native); weights imported from torch
NCHW checkpoints are transposed accordingly by ``clip_torch_to_flax``.
BatchNorms default to inference mode (frozen statistics) matching the
reference's frozen-encoder usage (trainer_base.py:272-306 partial_eval).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class VisualAdapter(nn.Module):
    """Conv1x1 bottleneck (down→BN→ReLU→up→BN) or basic conv adapter
    (reference: clip/model.py:178-218). Returns the delta."""

    input_dim: int
    output_dim: int
    adapter_kind: str = "bottleneck"
    reduction_factor: int = 16
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        conv = lambda f, name: nn.Conv(f, (1, 1), use_bias=False, dtype=self.dtype,
                                       name=name)
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, dtype=self.dtype, name=name)
        if self.adapter_kind == "bottleneck":
            down = self.input_dim // self.reduction_factor
            z = conv(down, "down_sampler")(x)
            if self.use_bn:
                z = bn("bn1")(z)
            z = jax.nn.relu(z)
            out = conv(self.output_dim, "up_sampler")(z)
            if self.use_bn:
                out = bn("bn2")(out)
            return out
        if self.adapter_kind == "basic":
            out = conv(self.output_dim, "conv")(x)
            if self.use_bn:
                out = bn("bn")(out)
            return out
        raise NotImplementedError(self.adapter_kind)


def avg_pool(x: Array, k: int) -> Array:
    if k <= 1:
        return x
    return nn.avg_pool(x, (k, k), strides=(k, k))


class Bottleneck(nn.Module):
    """CLIP anti-aliased ResNet bottleneck with optional adapters
    (reference: clip/model.py:9-117). Adapter positions: front (input→planes,
    added pre-ReLU around conv1), middle (around conv2), back (around conv3),
    transition (after the residual add)."""

    inplanes: int
    planes: int
    stride: int = 1
    adapter_type: Optional[str] = None
    reduction_factor: int = 16
    use_bn: bool = True
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        conv = lambda f, k, name: nn.Conv(f, (k, k), padding=[(k // 2,) * 2] * 2,
                                          use_bias=False, dtype=self.dtype,
                                          name=name)
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, dtype=self.dtype, name=name)
        pos = self.adapter_type.split("-")[0] if self.adapter_type else ""
        kind = self.adapter_type.split("-")[1] if self.adapter_type else ""
        mk_adapter = lambda i, o, name: VisualAdapter(
            i, o, kind, self.reduction_factor, self.use_bn, self.dtype, name=name)

        identity = x
        # conv1 (+front adapter)
        out = conv(self.planes, 1, "conv1")(x)
        if "front" in pos:
            a = mk_adapter(self.inplanes, self.planes, "front_adapter")(x, train)
            if self.use_bn:
                out = jax.nn.relu(a + bn("bn1")(out))
            else:
                out = jax.nn.relu(bn("bn1")(a + out))
        else:
            out = jax.nn.relu(bn("bn1")(out))
        # conv2 (+middle adapter)
        h = conv(self.planes, 3, "conv2")(out)
        if "middle" in pos:
            a = mk_adapter(self.planes, self.planes, "middle_adapter")(out, train)
            if self.use_bn:
                out = jax.nn.relu(a + bn("bn2")(h))
            else:
                out = jax.nn.relu(bn("bn2")(a + h))
        else:
            out = jax.nn.relu(bn("bn2")(h))
        out = avg_pool(out, self.stride)
        # conv3 (+back adapter)
        h = conv(self.planes * self.expansion, 1, "conv3")(out)
        if "back" in pos:
            a = mk_adapter(self.planes, self.planes * self.expansion,
                           "back_adapter")(out, train)
            if self.use_bn:
                out = a + bn("bn3")(h)
            else:
                out = bn("bn3")(a + h)
        else:
            out = bn("bn3")(h)
        # downsample path
        if self.stride > 1 or self.inplanes != self.planes * self.expansion:
            identity = avg_pool(x, self.stride)
            identity = conv(self.planes * self.expansion, 1,
                            "downsample_conv")(identity)
            identity = bn("downsample_bn")(identity)
        out = jax.nn.relu(out + identity)
        if "transition" in pos:
            a = mk_adapter(self.planes * self.expansion,
                           self.planes * self.expansion,
                           "transition_adapter")(out, train)
            out = jax.nn.relu(a + out)
        return out


class AttentionPool2d(nn.Module):
    """QKV attention pooling (reference: clip/model.py:119-155)."""

    embed_dim: int
    num_heads: int
    output_dim: Optional[int] = None
    num_positions: int = 50  # grid**2 + 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # x: (B, H, W, C)
        B, H, W, C = x.shape
        tokens = x.reshape(B, H * W, C)
        tokens = jnp.concatenate([tokens.mean(axis=1, keepdims=True), tokens],
                                 axis=1)  # (B, HW+1, C)
        pos = self.param("positional_embedding",
                         lambda k, s: jax.random.normal(k, s) / self.embed_dim ** 0.5,
                         (self.num_positions, self.embed_dim))
        if pos.shape[0] != tokens.shape[1]:
            pos = resize_pos_embed(pos, tokens.shape[1])
        tokens = tokens + pos[None].astype(tokens.dtype)
        dense = lambda f, name: nn.Dense(f, dtype=self.dtype, name=name)
        q = dense(self.embed_dim, "q_proj")(tokens[:, :1])
        k = dense(self.embed_dim, "k_proj")(tokens)
        v = dense(self.embed_dim, "v_proj")(tokens)
        hd = self.embed_dim // self.num_heads
        qh = q.reshape(B, 1, self.num_heads, hd)
        kh = k.reshape(B, -1, self.num_heads, hd)
        vh = v.reshape(B, -1, self.num_heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(hd)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(B, 1, self.embed_dim)
        return dense(self.output_dim or self.embed_dim, "c_proj")(out)[:, 0]


def resize_pos_embed(pos: Array, new_len: int) -> Array:
    """Bicubic grid resize keeping the CLS slot (the timm resize_pos_embed
    behavior the reference relies on, vis_encoder.py:271-274)."""
    old_len = pos.shape[0]
    if old_len == new_len:
        return pos
    cls, grid = pos[:1], pos[1:]
    old_g = int(round((old_len - 1) ** 0.5))
    new_g = int(round((new_len - 1) ** 0.5))
    grid = grid.reshape(old_g, old_g, -1)
    grid = jax.image.resize(grid, (new_g, new_g, grid.shape[-1]), "cubic")
    return jnp.concatenate([cls, grid.reshape(new_g * new_g, -1)], axis=0)


class ModifiedResNet(nn.Module):
    """CLIP ResNet trunk (reference: clip/model.py:222-293). Returns
    (grid NHWC, pooled)."""

    layers: Sequence[int]
    output_dim: int
    heads: int
    input_resolution: int = 224
    width: int = 64
    adapter_type: Optional[str] = None
    reduction_factor: int = 16
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(k // 2,) * 2] * 2,
            use_bias=False, dtype=self.dtype, name=name)
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, dtype=self.dtype, name=name)
        w = self.width
        # 3-conv stem
        x = jax.nn.relu(bn("bn1")(conv(w // 2, 3, 2, "conv1")(x)))
        x = jax.nn.relu(bn("bn2")(conv(w // 2, 3, 1, "conv2")(x)))
        x = jax.nn.relu(bn("bn3")(conv(w, 3, 1, "conv3")(x)))
        x = avg_pool(x, 2)
        # residual stages
        inplanes = w
        for stage, (planes_mult, blocks) in enumerate(
                zip((1, 2, 4, 8), self.layers), start=1):
            planes = w * planes_mult
            stride = 1 if stage == 1 else 2
            for b in range(blocks):
                x = Bottleneck(inplanes, planes, stride if b == 0 else 1,
                               self.adapter_type, self.reduction_factor,
                               self.use_bn, self.dtype,
                               name=f"layer{stage}_{b}")(x, train)
                inplanes = planes * 4
        pooled = AttentionPool2d(
            embed_dim=w * 32, num_heads=self.heads, output_dim=self.output_dim,
            num_positions=(self.input_resolution // 32) ** 2 + 1,
            dtype=self.dtype, name="attnpool")(x)
        return x, pooled


class QuickGELU(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    d_model: int
    n_head: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_head, dtype=self.dtype, name="attn")(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(self.d_model * 4, dtype=self.dtype, name="c_fc")(h)
        h = QuickGELU()(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="c_proj")(h)
        return x + h


class VisualTransformer(nn.Module):
    """CLIP ViT trunk; returns (grid tokens (B, g², C), pooled CLS)
    (reference: clip/model.py:344-381 — the fork returns ln_post over ALL
    tokens, no final projection)."""

    input_resolution: int
    patch_size: int
    width: int
    layers: int
    heads: int
    output_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        B = x.shape[0]
        x = nn.Conv(self.width, (self.patch_size,) * 2,
                    strides=(self.patch_size,) * 2, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = x.reshape(B, -1, self.width)
        scale = self.width ** -0.5
        cls = self.param("class_embedding",
                         lambda k, s: scale * jax.random.normal(k, s),
                         (self.width,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.width)), x], 1)
        n_pos = (self.input_resolution // self.patch_size) ** 2 + 1
        pos = self.param("positional_embedding",
                         lambda k, s: scale * jax.random.normal(k, s),
                         (n_pos, self.width))
        if pos.shape[0] != x.shape[1]:
            pos = resize_pos_embed(pos, x.shape[1])
        x = x + pos[None].astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(x)
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads, self.dtype,
                                       name=f"resblocks_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(x)
        return x[:, 1:], x[:, 0]


_RESNET_CONFIGS = {
    "RN50": dict(layers=(3, 4, 6, 3), width=64, output_dim=1024),
    "RN101": dict(layers=(3, 4, 23, 3), width=64, output_dim=512),
    "RN50x4": dict(layers=(4, 6, 10, 6), width=80, output_dim=640),
}
_VIT_CONFIGS = {
    "ViT-B/32": dict(patch_size=32, width=768, layers=12, heads=12,
                     output_dim=512),
    "ViT-B/16": dict(patch_size=16, width=768, layers=12, heads=12,
                     output_dim=512),
}


class CLIPVisualEncoder(nn.Module):
    """The raw-image feature extractor (= reference CLIPResNetEncoder,
    vis_encoder.py:254-322): grid features (B, H·W, C) + pooled (B, 1, C)."""

    backbone: str = "RN101"
    image_size: int = 224
    adapter_type: Optional[str] = None
    reduction_factor: int = 16
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: Array, train: bool = False):
        """images: (B, H, W, 3) NHWC."""
        if self.backbone.startswith("RN"):
            c = _RESNET_CONFIGS[self.backbone]
            heads = c["width"] * 32 // 64
            grid, pooled = ModifiedResNet(
                layers=c["layers"], output_dim=c["output_dim"], heads=heads,
                input_resolution=self.image_size, width=c["width"],
                adapter_type=self.adapter_type,
                reduction_factor=self.reduction_factor, use_bn=self.use_bn,
                dtype=self.dtype, name="visual")(images, train)
            B, H, W, C = grid.shape
            return grid.reshape(B, H * W, C), pooled[:, None, :]
        c = _VIT_CONFIGS[self.backbone]
        grid, pooled = VisualTransformer(
            input_resolution=self.image_size, patch_size=c["patch_size"],
            width=c["width"], layers=c["layers"], heads=c["heads"],
            output_dim=c["output_dim"], dtype=self.dtype,
            name="visual")(images, train)
        return grid, pooled[:, None, :]


def get_vis_encoder(backbone: str = "RN101", image_size: int = 224,
                    adapter_type: Optional[str] = None,
                    reduction_factor: int = 16, use_bn: bool = True,
                    dtype=jnp.float32) -> CLIPVisualEncoder:
    """Factory matching the reference's get_vis_encoder (vis_encoder.py:88)."""
    return CLIPVisualEncoder(backbone=backbone, image_size=image_size,
                             adapter_type=adapter_type,
                             reduction_factor=reduction_factor, use_bn=use_bn,
                             dtype=dtype)


# feat dims per raw backbone (reference: multitask.py:648-660)
RAW_FEAT_DIMS = {"RN50": 2048, "RN101": 2048, "RN50x4": 2560,
                 "ViT-B/32": 768, "ViT-B/16": 768}
