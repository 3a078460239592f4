"""OpenAI CLIP torch checkpoint → flax CLIPVisualEncoder parameters.

Replaces the reference's jit-checkpoint patching loader
(reference: src/clip/clip.py:73-160). Works offline from a local state_dict
(torch .pt or the state_dict of a torchscript archive). Only the visual
trunk is mapped (the reference deletes the text transformer,
vis_encoder.py:259).

Layout conversions: torch conv weight (O, I, kh, kw) → flax (kh, kw, I, O);
torch Linear (O, I) → flax (I, O); BatchNorm stats map into batch_stats.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import jax
import numpy as np


def _np(t):
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def clip_torch_to_flax(state_dict: Dict[str, Any], variables: Dict[str, Any],
                       strict: bool = False):
    """Fill a CLIPVisualEncoder variables dict ({'params', 'batch_stats'})
    from an OpenAI CLIP state_dict. Returns (new_variables, report)."""
    params = {tuple(p): v for p, v in _flat(variables["params"])}
    stats = {tuple(p): v for p, v in _flat(variables.get("batch_stats", {}))}
    filled: List[str] = []
    skipped: List[str] = []

    def put(table, path, val, key):
        if path in table and tuple(table[path].shape) == tuple(val.shape):
            table[path] = val.astype(np.float32)
            filled.append(key)
            return True
        return False

    for key, val in state_dict.items():
        if not key.startswith("visual.") or key.endswith("num_batches_tracked"):
            continue
        v = _np(val)
        k = key[len("visual."):]
        base = ("visual",)
        # stem convs / bns
        m = re.match(r"(conv\d|bn\d)\.(weight|bias|running_mean|running_var)", k)
        if m:
            mod, leaf = m.groups()
            if mod.startswith("conv"):
                put(params, base + (mod, "kernel"), np.transpose(v, (2, 3, 1, 0)), key)
            else:
                if leaf == "weight":
                    put(params, base + (mod, "scale"), v, key)
                elif leaf == "bias":
                    put(params, base + (mod, "bias"), v, key)
                elif leaf == "running_mean":
                    put(stats, base + (mod, "mean"), v, key)
                else:
                    put(stats, base + (mod, "var"), v, key)
            continue
        # residual stages: layer{s}.{b}.<...>
        m = re.match(r"layer(\d)\.(\d+)\.(.*)", k)
        if m:
            stage, blk, rest = m.groups()
            bname = f"layer{stage}_{blk}"
            cm = re.match(r"(conv\d)\.weight", rest)
            if cm:
                put(params, base + (bname, cm.group(1), "kernel"),
                    np.transpose(v, (2, 3, 1, 0)), key)
                continue
            bm = re.match(r"(bn\d)\.(weight|bias|running_mean|running_var)", rest)
            if bm:
                mod, leaf = bm.groups()
                if leaf == "weight":
                    put(params, base + (bname, mod, "scale"), v, key)
                elif leaf == "bias":
                    put(params, base + (bname, mod, "bias"), v, key)
                elif leaf == "running_mean":
                    put(stats, base + (bname, mod, "mean"), v, key)
                else:
                    put(stats, base + (bname, mod, "var"), v, key)
                continue
            dm = re.match(r"downsample\.(0|1|-1)\.(weight|bias|running_mean|running_var)", rest)
            if dm:
                idx, leaf = dm.groups()
                if idx == "0":  # conv
                    put(params, base + (bname, "downsample_conv", "kernel"),
                        np.transpose(v, (2, 3, 1, 0)), key)
                elif idx == "1":
                    if leaf == "weight":
                        put(params, base + (bname, "downsample_bn", "scale"), v, key)
                    elif leaf == "bias":
                        put(params, base + (bname, "downsample_bn", "bias"), v, key)
                    elif leaf == "running_mean":
                        put(stats, base + (bname, "downsample_bn", "mean"), v, key)
                    else:
                        put(stats, base + (bname, "downsample_bn", "var"), v, key)
                continue
            skipped.append(key)
            continue
        # attnpool
        m = re.match(r"attnpool\.(positional_embedding|(?:q|k|v|c)_proj\.(?:weight|bias))", k)
        if m:
            if k == "attnpool.positional_embedding":
                if v.ndim == 3 and v.shape[0] == 1:
                    v = v[0]  # wrapper-patched (1, N, C) form
                tgt = params.get(base + ("attnpool", "positional_embedding"))
                if tgt is not None and tgt.shape != v.shape:
                    # grid-resize to the configured image size
                    from vlpet_tpu.vision.clip import resize_pos_embed
                    import jax.numpy as jnp

                    v = np.asarray(resize_pos_embed(jnp.asarray(v), tgt.shape[0]))
                put(params, base + ("attnpool", "positional_embedding"), v, key)
            else:
                proj, leaf = k.split(".")[1], k.split(".")[2]
                if leaf == "weight":
                    put(params, base + ("attnpool", proj, "kernel"), v.T, key)
                else:
                    put(params, base + ("attnpool", proj, "bias"), v, key)
            continue
        # ViT trunk
        if k == "class_embedding":
            put(params, base + ("class_embedding",), v, key)
            continue
        if k == "positional_embedding":
            put(params, base + ("positional_embedding",), v, key)
            continue
        if k == "conv1.weight":
            put(params, base + ("conv1", "kernel"), np.transpose(v, (2, 3, 1, 0)), key)
            continue
        if k in ("ln_pre.weight", "ln_pre.bias", "ln_post.weight", "ln_post.bias"):
            mod, leaf = k.split(".")
            put(params, base + (mod, "scale" if leaf == "weight" else "bias"), v, key)
            continue
        if k == "proj":  # unused by the grid-feature wrapper
            continue
        # ViT residual blocks: transformer.resblocks.{i}.<...> → resblocks_{i}
        m = re.match(r"transformer\.resblocks\.(\d+)\.(.*)", k)
        if m:
            blk, rest = m.groups()
            bname = f"resblocks_{blk}"
            lm = re.match(r"(ln_1|ln_2)\.(weight|bias)", rest)
            if lm:
                mod, leaf = lm.groups()
                put(params, base + (bname, mod,
                                    "scale" if leaf == "weight" else "bias"),
                    v, key)
                continue
            mm = re.match(r"mlp\.(c_fc|c_proj)\.(weight|bias)", rest)
            if mm:
                mod, leaf = mm.groups()
                if leaf == "weight":
                    put(params, base + (bname, mod, "kernel"), v.T, key)
                else:
                    put(params, base + (bname, mod, "bias"), v, key)
                continue
            # torch nn.MultiheadAttention fused qkv → flax MHA DenseGeneral:
            # query/key/value kernels are (d, heads, head_dim); out kernel
            # is (heads, head_dim, d)
            attn_tpl = params.get(base + (bname, "attn", "query", "kernel"))
            if attn_tpl is None:
                skipped.append(key)
                continue
            d, heads, hd = attn_tpl.shape
            if rest == "attn.in_proj_weight":
                for name, w in zip(("query", "key", "value"),
                                   np.split(v, 3, axis=0)):
                    put(params, base + (bname, "attn", name, "kernel"),
                        w.T.reshape(d, heads, hd), key)
                continue
            if rest == "attn.in_proj_bias":
                for name, b in zip(("query", "key", "value"),
                                   np.split(v, 3, axis=0)):
                    put(params, base + (bname, "attn", name, "bias"),
                        b.reshape(heads, hd), key)
                continue
            if rest == "attn.out_proj.weight":
                put(params, base + (bname, "attn", "out", "kernel"),
                    v.T.reshape(heads, hd, d), key)
                continue
            if rest == "attn.out_proj.bias":
                put(params, base + (bname, "attn", "out", "bias"), v, key)
                continue
            skipped.append(key)
            continue
        skipped.append(key)

    new_vars = dict(variables)
    new_vars["params"] = _unflat(params, variables["params"])
    if stats:
        new_vars["batch_stats"] = _unflat(stats, variables.get("batch_stats", {}))
    if strict and skipped:
        raise ValueError(f"unmapped CLIP keys: {skipped}")
    return new_vars, {"filled": filled, "skipped": skipped}


def _flat(tree):
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        out.append(([str(getattr(k, "key", k)) for k in path], leaf))
    return out


def _unflat(table, template):
    flat = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in flat[0]:
        key = tuple(str(getattr(k, "key", k)) for k in path)
        leaves.append(table.get(key, leaf))
    return jax.tree_util.tree_unflatten(flat[1], leaves)
