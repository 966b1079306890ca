"""Native checkpointing for the rebuilt framework: Orbax + npz interchange.

Replaces ``tf.train.Saver`` / ``torch.save`` (SURVEY.md section 5
"checkpoint/resume") with Orbax for sharded pytrees (training state:
params + optimizer + EMA + step) and a flat ``.npz`` interchange format for
small artefacts and cross-tool exchange (the TF/torch importers also accept
npz-backed flat dicts).
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np


def save_pytree(path, tree) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def restore_pytree(path, like=None):
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            target = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
            return ckptr.restore(path, target)
        return ckptr.restore(path)


def flatten_tree(tree, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def unflatten_tree(flat: dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for name, value in flat.items():
        node = tree
        parts = name.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_npz(path, tree) -> None:
    np.savez(path, **flatten_tree(tree))


def load_npz(path) -> dict:
    with np.load(path) as data:
        return unflatten_tree({k: data[k] for k in data.files})
