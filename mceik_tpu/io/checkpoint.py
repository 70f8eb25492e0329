"""HDF5 checkpoint/resume of sampler state (SURVEY.md §5 "Checkpoint").

Checkpoints are complete — every chain's parameters, log-posterior,
adaptation state and the PRNG key — so any crash resumes exactly
(bit-identical modulo reduction order). Writes are atomic
(tmp file + rename). Restoration is example-driven: leaves are stored by
their pytree key path and loaded back into a structurally identical
example, which keeps the format stable across dataclass changes that only
reorder fields.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import h5py
import jax
import numpy as np


def _flatten_with_paths(tree: Any):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "name", getattr(p, "idx", getattr(p, "key", p))))
                       for p in path)
        out[key or "_root"] = np.asarray(leaf)
    return out


def save_checkpoint(path: str, state: Any, meta: Optional[Dict] = None) -> None:
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(tmp, "w") as f:
        g = f.create_group("state")
        for key, arr in _flatten_with_paths(state).items():
            g.create_dataset(key, data=arr)
        f.attrs["meta"] = json.dumps(meta or {})
    os.replace(tmp, path)


def load_checkpoint(path: str, example: Any):
    """Load a checkpoint into the structure of ``example``.

    Returns ``(state, meta)``; raises KeyError if the stored leaves don't
    match the example's pytree paths (a config mismatch).
    """
    with h5py.File(path, "r") as f:
        g = f["state"]
        stored = {k: np.asarray(v) for k, v in _walk(g)}
        meta = json.loads(f.attrs.get("meta", "{}"))

    flat, treedef = jax.tree_util.tree_flatten_with_path(example)
    leaves = []
    for p, leaf in flat:
        key = "/".join(str(getattr(q, "name", getattr(q, "idx", getattr(q, "key", q))))
                       for q in p) or "_root"
        if key not in stored:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = stored[key]
        if arr.shape != np.shape(leaf):
            raise ValueError(f"shape mismatch for {key!r}: "
                             f"checkpoint {arr.shape} vs example {np.shape(leaf)}")
        leaves.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves), meta


def _walk(group, prefix=""):
    for k, v in group.items():
        key = f"{prefix}{k}"
        if isinstance(v, h5py.Group):
            yield from _walk(v, key + "/")
        else:
            yield key, v
