"""Step-level training-state checkpointing for long condensation runs.

The reference has only artifact-level persistence — a killed condensation
run restarts its epoch loop from scratch (SURVEY.md §5 'checkpoint /
resume').  Here the full optimization state (synthetic features,
generator parameters, both optimizer states, epoch counter) serializes to
one npz; pytree structure is recovered from a template with identical
treedef.
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np

log = logging.getLogger("graphslim_tpu")


def save_state(path: str, state, epoch: int) -> None:
    leaves, _ = jax.tree.flatten(state)
    payload = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)
               if l is not None}
    payload["__epoch__"] = np.asarray(epoch)
    payload["__n_leaves__"] = np.asarray(len(leaves))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def load_state(path: str, template) -> tuple:
    """(state_with_template_structure, epoch) or (None, 0) if absent or
    structurally incompatible."""
    if not os.path.exists(path):
        return None, 0
    try:
        blob = np.load(path)
        leaves, treedef = jax.tree.flatten(template)
        if int(blob["__n_leaves__"]) != len(leaves):
            log.warning("checkpoint %s has different structure; ignoring",
                        path)
            return None, 0
        import jax.numpy as jnp

        new_leaves = []
        for i, leaf in enumerate(leaves):
            key = f"leaf_{i}"
            if key not in blob.files:
                new_leaves.append(leaf)
                continue
            arr = blob[key]
            if leaf is not None and tuple(arr.shape) != tuple(
                    np.shape(leaf)):
                log.warning("checkpoint %s leaf %d shape mismatch; "
                            "ignoring", path, i)
                return None, 0
            new_leaves.append(jnp.asarray(arr))
        state = jax.tree.unflatten(treedef, new_leaves)
        return state, int(blob["__epoch__"])
    except Exception as e:
        log.warning("failed to load checkpoint %s: %s", path, e)
        return None, 0
