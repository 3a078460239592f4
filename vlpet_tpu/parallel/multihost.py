"""Multi-host helpers: per-host data shards + cross-host result merging.

The reference runs one torch DDP process per GPU: DistributedSampler hands
each rank a disjoint slice (caption_clip_data.py:372-377) and evaluation
gathers with dist.barrier()/all_gather. The JAX equivalent: every host
feeds its own disjoint Loader shard (shard=process_index), and evaluation
merges per-host Python results with process_allgather over a padded byte
encoding (multihost_utils only moves arrays).
"""

from __future__ import annotations

import pickle
from typing import Any, List

import jax
import numpy as np


def host_shard() -> tuple:
    """(shard, num_shards) for this process — Loader arguments."""
    return jax.process_index(), jax.process_count()


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather one picklable object per host; returns the list in process
    order. Single-process: returns [obj] without touching collectives."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    # first agree on the max length so every host contributes a same-shape
    # array (process_allgather requires congruent shapes)
    n = np.asarray([payload.size], np.int32)
    sizes = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    buf = np.zeros((int(sizes.max()),), np.uint8)
    buf[:payload.size] = payload
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    gathered = gathered.reshape(jax.process_count(), -1)
    return [pickle.loads(gathered[i, :int(sizes[i])].tobytes())
            for i in range(jax.process_count())]


def merge_predict_results(results: List[dict]) -> dict:
    """Merge per-host Trainer.predict outputs (disjoint shards)."""
    merged = {"quesid2ans": {}, "predictions": [], "targets": []}
    for r in results:
        merged["quesid2ans"].update(r.get("quesid2ans", {}))
        merged["predictions"].extend(r.get("predictions", []))
        merged["targets"].extend(r.get("targets", []))
    return merged
