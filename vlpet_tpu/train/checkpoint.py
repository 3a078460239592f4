"""Checkpointing via orbax (async-capable), improving on the reference's
single torch.save at the end of training (reference: trainer_base.py:764-781
— weights only, no optimizer/step, no resume). Here the full train state
(merged params + optimizer state + step) round-trips, enabling preemption
recovery the reference lacked."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax


def _ckpt_mgr(directory: str, async_save: bool = True):
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    return ocp.CheckpointManager(
        directory,
        options=ocp.CheckpointManagerOptions(max_to_keep=2,
                                             enable_async_checkpointing=async_save))


class CheckpointManager:
    def __init__(self, directory: str, async_save: bool = True):
        self.mgr = _ckpt_mgr(directory, async_save)

    def save(self, step: int, state: Dict[str, Any]):
        import orbax.checkpoint as ocp

        self.mgr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, step: Optional[int] = None,
                template: Optional[Dict[str, Any]] = None) -> Optional[Dict[str, Any]]:
        """Restore a checkpoint.

        `template` is a pytree with the target structure (e.g. the live
        TrainState's {params, opt_state, step}). Without it, orbax returns
        optax namedtuple states as plain dicts/lists, and the first
        tx.update after --resume crashes ('dict' object has no attribute
        'mu'). Always pass it when restoring optimizer state.
        """
        import orbax.checkpoint as ocp

        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            return None
        if template is not None:
            def _abstract(x):
                if not (hasattr(x, "shape") and hasattr(x, "dtype")):
                    return x
                sharding = getattr(x, "sharding", None)
                return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)

            abstract = jax.tree_util.tree_map(_abstract, template)
            return self.mgr.restore(step, args=ocp.args.StandardRestore(abstract))
        return self.mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def wait(self):
        self.mgr.wait_until_finished()

    def close(self):
        self.mgr.close()


def save_params_npz(params, path: str):
    """Portable weights-only export (the reference's LAST.pth analog)."""
    import numpy as np

    flat = {}
    for p, v in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(k, "key", k)) for k in p)
        flat[key] = np.asarray(v)
    np.savez(path, **flat)


def load_params_npz(path: str, template):
    """strict=False-style load: fill whatever matches, keep init elsewhere
    (reference: utils.py:63-71 load_state_dict semantics)."""
    import numpy as np

    data = np.load(path)
    flat = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    loaded = 0
    for p, v in flat[0]:
        key = "/".join(str(getattr(k, "key", k)) for k in p)
        if key in data.files and data[key].shape == v.shape:
            leaves.append(data[key].astype(v.dtype))
            loaded += 1
        else:
            leaves.append(v)
    return jax.tree_util.tree_unflatten(flat[1], leaves), loaded
