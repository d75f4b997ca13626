"""Full train-state checkpointing.

Upgrades the reference's model-only snapshots (run_train.py:85-92 — no
optimizer state, PRNG or step, so training could not resume mid-run) to a
complete state: params + optimizer state + PRNG key + step counter + best-val
metadata.  Retention policy matches the reference: a rolling
``model_min_val_loss-<loss>`` best checkpoint (previous best deleted), an
init snapshot, and a final snapshot.

Format: the state pytree's leaves in an .npz; restore rebuilds into a
caller-provided template with the same structure (so optax namedtuple state
types survive).  Dependency-free and stable across jax versions.
"""

from __future__ import annotations

import glob
import os
from typing import Any

import jax
import numpy as np

__all__ = ["save_state", "load_state", "save_best", "latest_best"]


def save_state(path: str, state: Any) -> None:
    leaves = jax.tree_util.tree_leaves(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **arrays)


def load_state(path: str, template: Any) -> Any:
    """Restore a state pytree; ``template`` supplies structure and leaf
    dtypes (e.g. a freshly initialised train state)."""
    z = np.load(path, allow_pickle=False)
    n = len([k for k in z.files if k.startswith("leaf_")])
    leaves = [z[f"leaf_{i}"] for i in range(n)]
    treedef = jax.tree_util.tree_structure(template)
    if treedef.num_leaves != n:
        raise ValueError(f"checkpoint has {n} leaves, template expects {treedef.num_leaves}")
    tmpl_leaves = jax.tree_util.tree_leaves(template)
    cast = [np.asarray(l).astype(np.asarray(t).dtype) for l, t in zip(leaves, tmpl_leaves)]
    return jax.tree_util.tree_unflatten(treedef, cast)


def save_best(results_dir: str, val_loss: float, state: Any, params: Any = None) -> str:
    """Rolling best checkpoint with the loss in the filename; deletes the
    previous best (reference retention policy, run_train.py:85-92).  Like the
    reference's model + state_dict pair, both the full resumable train state
    and a params-only snapshot are written."""
    for old in glob.glob(os.path.join(results_dir, "model_min_val_loss-*")):
        os.remove(old)
    path = os.path.join(results_dir, f"model_min_val_loss-{np.around(val_loss, 4)}.npz")
    save_state(path, state)
    if params is not None:
        save_state(path.replace(".npz", "_params.npz"), params)
    return path


def latest_best(results_dir: str) -> str:
    """Best params-only checkpoint path, falling back to the final snapshot
    (load_model.py:47-53 semantics)."""
    best = sorted(glob.glob(os.path.join(results_dir, "model_min_val_loss-*_params.npz")))
    if best:
        return best[-1]
    final = os.path.join(results_dir, "model_autoencoder.npz")
    if os.path.isfile(final):
        return final
    raise FileNotFoundError(f"no checkpoint found in {results_dir}")


def latest_resumable(results_dir: str) -> str:
    """Full train-state checkpoint for mid-run resume."""
    best = [p for p in sorted(glob.glob(os.path.join(results_dir, "model_min_val_loss-*.npz")))
            if not p.endswith("_params.npz")]
    if best:
        return best[-1]
    raise FileNotFoundError(f"no resumable checkpoint in {results_dir}")
