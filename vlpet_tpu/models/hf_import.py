"""HF checkpoint → vlpet_tpu parameter conversion.

Replaces the reference's ``from_pretrained`` weight loading
(reference: src/trainer_base.py:224-235, which loads facebook/bart-base /
t5-base with strict-minus-ignore-keys). Works offline from a torch
state_dict (a local ``pytorch_model.bin``/``safetensors`` load, or an
in-memory HF model's ``state_dict()``); PET / visual-embedding parameters are
left at their fresh initialization, exactly like the reference's
strict=False load.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _set(flat: Dict[Tuple[str, ...], Any], path: Tuple[str, ...], value: np.ndarray,
         filled: List[str], hf_key: str, grow_axis: Optional[int] = None):
    """Copy a checkpoint tensor onto a model leaf. ``grow_axis`` marks
    vocab-carrying tensors (shared embedding / lm_head / final_logits_bias):
    when the model's vocab is LARGER along that axis (tokenizer added
    <vis_extra_id_*>/<extra_id_*> specials — the reference calls
    resize_token_embeddings, multitask.py:59-67), the checkpoint rows fill
    the leading slice and the added rows keep the model's init."""
    if path in flat:
        cur = flat[path]
        if tuple(cur.shape) != tuple(value.shape):
            cs, vs = tuple(cur.shape), tuple(value.shape)
            ok = (grow_axis is not None and len(cs) == len(vs)
                  and cs[grow_axis] > vs[grow_axis]
                  and all(c == v for i, (c, v) in enumerate(zip(cs, vs))
                          if i != grow_axis))
            if not ok:
                raise ValueError(
                    f"shape mismatch for {hf_key} -> {'/'.join(path)}: "
                    f"{value.shape} vs {cur.shape}")
            grown = np.array(np.asarray(cur))
            sl = tuple(slice(0, v) for v in vs)
            grown[sl] = value
            value = grown
        flat[path] = value.astype(np.asarray(cur).dtype
                                  if hasattr(cur, "dtype") else np.float32)
        filled.append("/".join(path))
        return True
    return False


def _flatten(params):
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = tuple(str(getattr(k, "key", k)) for k in path)
        flat[key] = leaf
    return flat


def _unflatten(flat, template):
    leaves_paths = jax.tree_util.tree_flatten_with_path(template)
    out_leaves = []
    for path, _ in leaves_paths[0]:
        key = tuple(str(getattr(k, "key", k)) for k in path)
        out_leaves.append(flat[key])
    return jax.tree_util.tree_unflatten(leaves_paths[1], out_leaves)


def _linear(flat, base: Tuple[str, ...], w, b, filled, hf_key, lora: bool):
    """torch Linear (out,in) → flax kernel (in,out); LoRA wraps base."""
    tgt = base + (("base", "kernel") if lora else ("kernel",))
    if tgt not in flat and lora:
        tgt = base + ("kernel",)
    _set(flat, tgt, w.T, filled, hf_key)
    if b is not None:
        tgtb = base + (("base", "bias") if lora else ("bias",))
        if tgtb not in flat and lora:
            tgtb = base + ("bias",)
        _set(flat, tgtb, b, filled, hf_key + ".bias")


def bart_hf_to_flax(state_dict: Dict[str, Any], params, strict: bool = False):
    """Map a (VL)Bart torch state_dict onto a VLBart flax param tree.

    Handles: shared embedding, learned positions (offset table included),
    all layer projections/LNs, final_logits_bias. lm_head is tied to shared
    (skipped, like the reference's _keys_to_ignore). Everything not present
    in the state_dict (visual embedding, PET modules) keeps its init.
    """
    flat = _flatten(params)
    lora = ("model", "encoder", "layers_0", "self_attn", "q_proj", "base",
            "kernel") in flat
    filled: List[str] = []
    skipped: List[str] = []

    for key, val in state_dict.items():
        v = _to_np(val)
        k = key
        k = re.sub(r"^model\.", "", k)
        if k in ("shared.weight", "encoder.embed_tokens.weight",
                 "decoder.embed_tokens.weight"):
            _set(flat, ("model", "shared"), v, filled, key, grow_axis=0)
            continue
        if k == "lm_head.weight":
            continue  # tied
        if k == "final_logits_bias":
            _set(flat, ("final_logits_bias",), v, filled, key, grow_axis=1)
            continue
        m = re.match(r"(encoder|decoder)\.(.*)", k)
        if not m:
            skipped.append(key)
            continue
        stack, rest = m.group(1), m.group(2)
        base = ("model", stack)
        if rest == "embed_positions.weight":
            _set(flat, base + ("embed_positions",), v, filled, key)
            continue
        if rest.startswith("layernorm_embedding."):
            leaf = "scale" if rest.endswith("weight") else "bias"
            _set(flat, base + ("layernorm_embedding", leaf), v, filled, key)
            continue
        lm = re.match(r"layers\.(\d+)\.(.*)", rest)
        if lm:
            layer = f"layers_{lm.group(1)}"
            sub = lm.group(2)
            pm = re.match(r"(self_attn|encoder_attn)\.(q_proj|k_proj|v_proj|out_proj)\.(weight|bias)", sub)
            if pm:
                attn, proj, leaf = pm.groups()
                is_lora = lora and proj in ("q_proj", "v_proj")
                if leaf == "weight":
                    _linear(flat, base + (layer, attn, proj), v, None, filled, key,
                            is_lora)
                else:
                    tgt = base + (layer, attn, proj) + (("base", "bias") if is_lora
                                                        else ("bias",))
                    if tgt not in flat:
                        tgt = base + (layer, attn, proj, "bias")
                    _set(flat, tgt, v, filled, key)
                continue
            nm = re.match(r"(self_attn_layer_norm|encoder_attn_layer_norm|final_layer_norm)\.(weight|bias)", sub)
            if nm:
                ln, leaf = nm.groups()
                leaf = "scale" if leaf == "weight" else "bias"
                _set(flat, base + (layer, ln, leaf), v, filled, key)
                continue
            fm = re.match(r"(fc1|fc2)\.(weight|bias)", sub)
            if fm:
                fc, leaf = fm.groups()
                if leaf == "weight":
                    _linear(flat, base + (layer, fc), v, None, filled, key, False)
                else:
                    _set(flat, base + (layer, fc, "bias"), v, filled, key)
                continue
        skipped.append(key)

    if strict and skipped:
        raise ValueError(f"unmapped HF keys: {skipped}")
    return _unflatten(flat, params), {"filled": filled, "skipped": skipped}


def t5_hf_to_flax(state_dict: Dict[str, Any], params, strict: bool = False):
    """Map a (VL)T5 torch state_dict onto a VLT5 flax param tree."""
    flat = _flatten(params)
    filled: List[str] = []
    skipped: List[str] = []

    def put(path, v, key, transpose=False, grow_axis=None):
        _set(flat, path, v.T if transpose else v, filled, key,
             grow_axis=grow_axis)

    for key, val in state_dict.items():
        v = _to_np(val)
        k = re.sub(r"^(model|transformer)\.", "", key)
        if k in ("shared.weight", "encoder.embed_tokens.weight",
                 "decoder.embed_tokens.weight"):
            put(("model", "shared"), v, key, grow_axis=0)
            continue
        if k == "lm_head.weight":
            put(("lm_head", "kernel"), v, key, transpose=True, grow_axis=1)
            continue
        m = re.match(r"(encoder|decoder)\.(.*)", k)
        if not m:
            skipped.append(key)
            continue
        stack, rest = m.group(1), m.group(2)
        base = ("model", stack)
        if rest == "final_layer_norm.weight":
            put(base + ("final_layer_norm", "scale"), v, key)
            continue
        bm = re.match(r"block\.(\d+)\.layer\.(\d+)\.(.*)", rest)
        if not bm:
            skipped.append(key)
            continue
        blk, sub_idx, sub = f"blocks_{bm.group(1)}", int(bm.group(2)), bm.group(3)
        is_dec = stack == "decoder"
        # layer 0 = self-attn, layer 1 = cross (dec) / ff (enc), layer 2 = ff (dec)
        if sub_idx == 0:
            mod = "self_attn"
        elif is_dec and sub_idx == 1:
            mod = "cross_attn"
        else:
            mod = "ff"
        am = re.match(r"(SelfAttention|EncDecAttention)\.(q|k|v|o)\.weight", sub)
        if am:
            proj = {"q": "q", "k": "k", "v": "v", "o": "o"}[am.group(2)]
            put(base + (blk, mod, proj, "kernel"), v, key, transpose=True)
            continue
        if sub.endswith("relative_attention_bias.weight"):
            put(base + (blk, mod, "relative_attention_bias"), v, key)
            continue
        if sub == "layer_norm.weight":
            put(base + (blk, f"{mod}_layer_norm", "scale"), v, key)
            continue
        dm = re.match(r"DenseReluDense\.(wi|wi_0|wi_1|wo)\.weight", sub)
        if dm:
            # wi/wo live directly on the block in vlpet_tpu
            put(base + (blk, dm.group(1), "kernel"), v, key, transpose=True)
            continue
        skipped.append(key)

    if strict and skipped:
        raise ValueError(f"unmapped HF keys: {skipped}")
    return _unflatten(flat, params), {"filled": filled, "skipped": skipped}


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load a local checkpoint (.bin/.pt via torch, .safetensors via
    safetensors) without network access."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return load_file(path)
    import torch
    return torch.load(path, map_location="cpu", weights_only=True)
