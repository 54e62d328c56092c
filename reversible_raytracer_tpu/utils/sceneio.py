"""Scene <-> JSON serialization (SURVEY.md §5.6: the reference hard-coded
scenes as literals in demo scripts; here scenes are small JSON documents
loadable from the CLI)."""

from __future__ import annotations

import json

import jax
import numpy as np

from ..models.scene import Scene


def scene_to_dict(scene: Scene) -> dict:
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(scene)[0]:
        name = ".".join(str(getattr(k, "name", getattr(k, "key", k))) for k in path)
        out[name] = np.asarray(leaf).tolist()
    return out


def scene_from_dict(data: dict, scene_like: Scene) -> Scene:
    """Rebuild a Scene from `scene_to_dict` output, using a structural
    template (leaf order and dtypes come from the template)."""
    import jax.numpy as jnp

    paths, treedef = jax.tree_util.tree_flatten_with_path(scene_like)
    leaves = []
    for path, like in paths:
        name = ".".join(str(getattr(k, "name", getattr(k, "key", k))) for k in path)
        if name in data:
            leaves.append(jnp.asarray(data[name], jnp.float32).reshape(np.shape(like)))
        else:
            leaves.append(like)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_scene(path: str, scene: Scene) -> None:
    with open(path, "w") as fh:
        json.dump(scene_to_dict(scene), fh, indent=2)


def load_scene(path: str, scene_like: Scene) -> Scene:
    with open(path) as fh:
        return scene_from_dict(json.load(fh), scene_like)
