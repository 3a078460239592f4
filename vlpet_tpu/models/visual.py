"""Visual embedding modules + grid downsampling for the joint encoder.

Reference: src/modeling_bart.py:77-192 (VisualEmbedding), :195-336
(LowRankVisualEmbedding), :337-441 (ExpandVisualEmbedding), :556-670
(Downsample/OneDDownsample), :671-694 (SparseSample).

TPU notes: AdaptiveMaxPool2d with output (s, s) over a (g, g) grid where
g % s == 0 is an exact (g/s, g/s) max-pool window — implemented with
jax.lax.reduce_window (static shapes, fuses cleanly). The NLVR paired-image
split/concat is pure reshaping.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vlpet_tpu.config import VisConfig
from vlpet_tpu.pet.modules import (
    TaskDense,
    get_activation,
    normal_init,
    resolve_kernel_init,
)

Array = jax.Array


def adaptive_max_pool_grid(x: Array, out_hw: Tuple[int, int]) -> Array:
    """AdaptiveMaxPool2d over a square token grid.

    x: (B, L, D) with L = g*g; returns (B, s*s, D).
    Matches torch semantics for arbitrary g,s via per-output-bin windows.
    """
    B, L, D = x.shape
    g = int(round(L ** 0.5))
    assert g * g == L, f"grid length {L} is not square"
    s_h, s_w = out_hw
    xg = x.reshape(B, g, g, D)
    if g % s_h == 0 and g % s_w == 0:
        kh, kw = g // s_h, g // s_w
        pooled = jax.lax.reduce_window(
            xg, -jnp.inf, jax.lax.max,
            window_dimensions=(1, kh, kw, 1),
            window_strides=(1, kh, kw, 1),
            padding="VALID")
        return pooled.reshape(B, s_h * s_w, D)
    # general adaptive bins (torch: start=floor(i*g/s), end=ceil((i+1)*g/s))
    rows = []
    for i in range(s_h):
        r0, r1 = (i * g) // s_h, -(-((i + 1) * g) // s_h)
        cols = []
        for j in range(s_w):
            c0, c1 = (j * g) // s_w, -(-((j + 1) * g) // s_w)
            cols.append(jnp.max(xg[:, r0:r1, c0:c1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.concatenate(rows, axis=1)


def adaptive_max_pool_1d(x: Array, out_len: int) -> Array:
    """AdaptiveMaxPool1d along the token axis; x: (B, L, D) → (B, out_len, D)."""
    B, L, D = x.shape
    if L % out_len == 0:
        k = L // out_len
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            window_dimensions=(1, k, 1), window_strides=(1, k, 1),
            padding="VALID")
    bins = []
    for i in range(out_len):
        a, b = (i * L) // out_len, -(-((i + 1) * L) // out_len)
        bins.append(jnp.max(x[:, a:b, :], axis=1))
    return jnp.stack(bins, axis=1)


def downsample_vis(vis_inputs: tuple, n_boxes: int, oned: bool = False) -> tuple:
    """Downsample grid features to n_boxes tokens; NLVR 4-tuples split the
    paired images, pool each, and re-concat (reference: modeling_bart.py:582-613)."""

    def pool(feats):
        if oned:
            return adaptive_max_pool_1d(feats, n_boxes)
        s = int(round(n_boxes ** 0.5))
        return adaptive_max_pool_grid(feats, (s, s))

    if len(vis_inputs) == 4:
        feats, boxes, img_order_ids, obj_order_ids = vis_inputs
        B, L, D = feats.shape
        half = L // 2
        stacked = jnp.concatenate([feats[:, :half], feats[:, half:]], axis=0)
        pooled = pool(stacked)
        feats = jnp.concatenate([pooled[:B], pooled[B:]], axis=1)
        n = feats.shape[1] // 2

        def trim(a):
            return jnp.concatenate([a[:, :half][:, :n], a[:, half:][:, :n]], axis=1)

        return (feats, trim(boxes), trim(img_order_ids), trim(obj_order_ids))
    feats, boxes = vis_inputs[0], vis_inputs[1]
    feats = pool(feats)
    return (feats, boxes[:, : feats.shape[1]])


def sparse_sample(feats: Array, out_len: int, rng: Optional[jax.Array]) -> Array:
    """Random sorted token subsample at train time
    (reference: modeling_bart.py:671-694)."""
    if rng is None:
        return feats
    B, L, _ = feats.shape
    scores = jax.random.uniform(rng, (B, L))
    idx = jnp.sort(jnp.argsort(scores, axis=-1)[:, :out_len], axis=-1)
    return jnp.take_along_axis(feats, idx[..., None], axis=1)


def _pos_with_area(pos: Array) -> Array:
    """pos (B,N,4) as (x1,x2,y1,y2) → append area (reference: :129-141)."""
    height = pos[:, :, 3] - pos[:, :, 2]
    width = pos[:, :, 1] - pos[:, :, 0]
    area = (height * width)[..., None]
    return jnp.concatenate([pos, area], axis=2)


class VisualEmbedding(nn.Module):
    """Default visual projector: Linear(feat→d) (+LN) + box-position embedding
    + image-order embedding + object-order embedding reusing the tail of the
    text embedding table (reference: src/modeling_bart.py:77-192).

    ``embedding_table`` is the shared token-embedding matrix, passed in so the
    obj-order lookup uses the live (possibly resized) table.
    """

    vis: VisConfig
    d_model: int
    init_std: Optional[float] = 0.02
    t5_style_ln: bool = False  # T5 uses RMS LayerNorm in its visual embedding
    dtype: Any = jnp.float32

    def _ln(self, name):
        if self.t5_style_ln:
            return nn.RMSNorm(epsilon=1e-6, dtype=self.dtype, name=name)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, feats: Array, pos: Array, embedding_table: Array,
                 img_order_ids: Optional[Array] = None,
                 obj_order_ids: Optional[Array] = None) -> Array:
        v = self.vis
        B, N, _ = feats.shape
        feat_embedding = TaskDense(v.feat_dim, self.d_model, init_std=self.init_std,
                                   dtype=self.dtype, name="feat_embedding")(feats)
        if v.use_vis_layer_norm and v.individual_vis_layer_norm:
            feat_embedding = self._ln("feat_layer_norm")(feat_embedding)

        pos5 = _pos_with_area(pos.astype(self.dtype))
        abs_pos = TaskDense(v.pos_dim + 1, self.d_model, init_std=self.init_std,
                            dtype=self.dtype, name="absolute_vis_pos_embedding")(pos5)
        if v.use_vis_layer_norm and v.individual_vis_layer_norm:
            abs_pos = self._ln("absolute_vis_pos_layer_norm")(abs_pos)

        if v.use_vis_order_embedding:
            img_table = self.param("img_order_embedding",
                                   normal_init(self.init_std or 0.02),
                                   (v.n_images, self.d_model))
            if img_order_ids is None:
                img_order_ids = jnp.zeros((1, N), dtype=jnp.int32)
            img_order_embedding = jnp.take(img_table, img_order_ids, axis=0)
            if obj_order_ids is None:
                obj_order_ids = jnp.arange(N, dtype=jnp.int32)[None]
            # reverse-index into the text vocab tail (reference: :178)
            vocab = embedding_table.shape[0]
            obj_ids = vocab - obj_order_ids - 1
            obj_order_embedding = jnp.take(embedding_table, obj_ids, axis=0)
            vis = (feat_embedding + abs_pos + img_order_embedding.astype(self.dtype)
                   + obj_order_embedding.astype(self.dtype))
        else:
            vis = feat_embedding + abs_pos

        if v.use_vis_layer_norm and not v.individual_vis_layer_norm:
            vis = self._ln("layer_norm")(vis)
        return vis


class LowRankVisualEmbedding(nn.Module):
    """VL-PET lightweight visual projector: multihead down (feat→x/h, concat)
    → gelu_new → up (x→d), optional low-rank sigmoid gate on the raw features
    (reference: src/modeling_bart.py:195-336)."""

    vis: VisConfig
    d_model: int
    init_std: Optional[float] = 0.02
    t5_style_ln: bool = False
    dtype: Any = jnp.float32

    def _ln(self, name):
        if self.t5_style_ln:
            return nn.RMSNorm(epsilon=1e-6, dtype=self.dtype, name=name)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, feats: Array, pos: Array, embedding_table: Array,
                 img_order_ids: Optional[Array] = None,
                 obj_order_ids: Optional[Array] = None) -> Array:
        v = self.vis
        B, N, _ = feats.shape
        h = v.visual_projector_multihead_num_head
        x_dim = v.visual_projector_down_dim
        xh = x_dim // h
        kinit = resolve_kernel_init(self.init_std)
        wd = self.param("visual_projector_multihead_down_kernel", kinit,
                        (h, v.feat_dim, xh))
        bd = self.param("visual_projector_multihead_down_bias",
                        nn.initializers.zeros, (h, xh))
        wdf = jnp.transpose(wd, (1, 0, 2)).reshape(v.feat_dim, x_dim).astype(self.dtype)
        z = jnp.dot(feats.astype(self.dtype), wdf) + bd.reshape(x_dim).astype(self.dtype)
        z = get_activation("gelu_new")(z)
        feat_embedding = TaskDense(x_dim, self.d_model, init_std=self.init_std,
                                   dtype=self.dtype,
                                   name="visual_projector_multihead_up")(z)

        # visual gate maps feat_dim → gating_down_dim → d_model (non-square),
        # so it is built inline rather than via GateLargeXLowRank
        if v.use_visual_projector_gating_large_x_lowrank:
            gd = TaskDense(v.feat_dim, v.visual_projector_gating_down_dim,
                           init_std=self.init_std, dtype=self.dtype,
                           name="visual_projector_gating_large_x_down")(feats)
            gd = get_activation("gelu_new")(gd)
            gu = TaskDense(v.visual_projector_gating_down_dim, self.d_model,
                           init_std=self.init_std, dtype=self.dtype,
                           name="visual_projector_gating_large_x_up")(gd)
            gate = jax.nn.sigmoid(gu)
            if v.use_visual_projector_residual_connection:
                feat_embedding = feat_embedding + feat_embedding * gate
            else:
                feat_embedding = feat_embedding * gate

        if v.use_vis_layer_norm and v.individual_vis_layer_norm:
            feat_embedding = self._ln("visual_projector_layer_norm")(feat_embedding)

        pos5 = _pos_with_area(pos.astype(self.dtype))
        abs_pos = TaskDense(v.pos_dim + 1, self.d_model, init_std=self.init_std,
                            dtype=self.dtype, name="absolute_vis_pos_embedding")(pos5)
        if v.use_vis_layer_norm and v.individual_vis_layer_norm:
            abs_pos = self._ln("absolute_vis_pos_layer_norm")(abs_pos)

        if v.use_vis_order_embedding:
            img_table = self.param("img_order_embedding",
                                   normal_init(self.init_std or 0.02),
                                   (v.n_images, self.d_model))
            if img_order_ids is None:
                img_order_ids = jnp.zeros((1, N), dtype=jnp.int32)
            img_order_embedding = jnp.take(img_table, img_order_ids, axis=0)
            if obj_order_ids is None:
                obj_order_ids = jnp.arange(N, dtype=jnp.int32)[None]
            vocab = embedding_table.shape[0]
            obj_order_embedding = jnp.take(embedding_table, vocab - obj_order_ids - 1, axis=0)
            vis = (feat_embedding + abs_pos + img_order_embedding.astype(self.dtype)
                   + obj_order_embedding.astype(self.dtype))
        else:
            vis = feat_embedding + abs_pos
        if v.use_vis_layer_norm and not v.individual_vis_layer_norm:
            vis = self._ln("layer_norm")(vis)
        return vis


class ExpandVisualEmbedding(nn.Module):
    """Frozen-style: one pooled feature → n_image_tokens tokens
    (reference: src/modeling_bart.py:337-441). Unused by default recipes."""

    vis: VisConfig
    d_model: int
    init_std: Optional[float] = 0.02
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Array, pos: Array, embedding_table: Array,
                 img_order_ids: Optional[Array] = None,
                 obj_order_ids: Optional[Array] = None) -> Array:
        v = self.vis
        if feats.ndim == 2:
            feats = feats[:, None, :]
        B = feats.shape[0]
        out = TaskDense(v.feat_dim, self.d_model * v.n_image_tokens,
                        init_std=self.init_std, dtype=self.dtype,
                        name="feat_embedding")(feats.astype(self.dtype))
        out = out.reshape(B, -1, self.d_model)
        if v.use_vis_layer_norm:
            out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(out)
        return out
