"""Full-state checkpointing.

The reference can only snapshot {w0, w, V} as text, and explicitly
refuses to do even that for MCMC because the sampler state (e/q caches,
hyperparameters, prediction accumulators) isn't saved
(/root/reference/src/libfm/libfm.cpp:123-133). Here the entire learner
state is a pytree, so checkpoint/resume covers MCMC chains too:

- `save_state(path, state, meta)` — atomic .npz of any pytree of arrays
  plus a JSON metadata dict (iteration number, config echo, rng key).
- `restore_state(path)` — returns (pytree_leaves_dict, meta).

MCMCLearner integration: pass `checkpoint_path=` and `checkpoint_every=`
to learn(); resume happens automatically when the file exists and its
meta matches.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np

import jax


def save_state(path: str, state, meta: dict | None = None) -> None:
    """Atomically write a pytree of arrays + metadata to `path` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    payload["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def restore_state(path: str, like=None):
    """Read a checkpoint. If `like` (a pytree of the same structure) is
    given, the result is unflattened into that structure; otherwise the
    raw leaf list is returned. Returns (state, meta)."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode()) if "__meta__" in z else {}
        n = len([k for k in z.files if k.startswith("leaf_")])
        leaves = [z[f"leaf_{i}"] for i in range(n)]
    if like is not None:
        _, treedef = jax.tree_util.tree_flatten(like)
        state = jax.tree_util.tree_unflatten(treedef, leaves)
    else:
        state = leaves
    return state, meta
