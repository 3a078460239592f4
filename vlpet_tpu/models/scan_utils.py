"""Param-tree conversion between per-layer and scan-stacked layouts.

With ``cfg.scan_layers`` the transformer stacks hold ONE scanned layer whose
params carry a leading layer axis under the key ``layers`` (XLA traces a
single layer body — flagship cold-compile drops from minutes to seconds).
Checkpoints, the HF importer, the freezing engine's published param%
fixtures, and the generation path all speak the per-layer ``layers_0..N``
naming, so these helpers convert losslessly in both directions:

* ``stack_layer_params``  — per-layer tree → scan tree (HF import / restore
  of old checkpoints / feeding a scan model from a loop model)
* ``unstack_layer_params`` — scan tree → per-layer tree (generation on the
  non-scan twin model; exporting reference-shaped checkpoints)

Both walk the whole tree and convert every dict level that contains a
contiguous ``layers_0..layers_{k-1}`` family, so mixed trees (e.g. a loop
encoder + scanned decoder) work too.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import jax
import jax.numpy as jnp

_LAYER_RE = re.compile(r"^layers_(\d+)$")


def _layer_family(d: Dict[str, Any]):
    idx = {}
    for k in d:
        m = _LAYER_RE.match(k)
        if m:
            idx[int(m.group(1))] = k
    if not idx or sorted(idx) != list(range(len(idx))):
        return None
    return [idx[i] for i in range(len(idx))]


def stack_layer_params(tree: Any) -> Any:
    """layers_0..layers_{N-1} siblings → one 'layers' subtree with a leading
    (N,) axis on every leaf."""
    if not isinstance(tree, dict):
        return tree
    fam = _layer_family(tree)
    out = {}
    if fam is not None:
        subtrees = [stack_layer_params(tree[k]) for k in fam]
        out["layers"] = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *subtrees)
    for k, v in tree.items():
        if fam is not None and k in fam:
            continue
        out[k] = stack_layer_params(v)
    return out


def unstack_layer_params(tree: Any) -> Any:
    """Inverse of stack_layer_params: a 'layers' subtree whose leaves share a
    common leading axis → layers_0..layers_{N-1} siblings.

    The layer count is read off the leaves' leading dim (they all agree by
    construction)."""
    if not isinstance(tree, dict):
        return tree
    out = {}
    for k, v in tree.items():
        if k == "layers" and isinstance(v, dict):
            leaves = jax.tree_util.tree_leaves(v)
            n = leaves[0].shape[0] if leaves else 0
            for i in range(n):
                out[f"layers_{i}"] = jax.tree_util.tree_map(
                    lambda x: x[i], v)
        else:
            out[k] = unstack_layer_params(v)
    return out
