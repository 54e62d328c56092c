"""Checkpoint / resume (SURVEY.md §5.4).

The reference's only resume primitive was the VariableSet value vector; here
a checkpoint is the scene pytree + Adam state + step counter, serialized to
a single .npz (orbax is installed but npz is the right tool at O(10^2..10^3)
floats — zero dependencies, atomic rename, human-inspectable).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_names(tree):
    paths, treedef = jax.tree_util.tree_flatten_with_path(tree)
    names, leaves = [], []
    for path, leaf in paths:
        name = "/".join(str(getattr(k, "name", getattr(k, "key", getattr(k, "idx", k)))) for k in path)
        names.append(name)
        leaves.append(np.asarray(leaf))
    return names, leaves, treedef


def save(path: str, scene, opt_state=None, step: int = 0) -> None:
    arrays = {"__step__": np.asarray(step, np.int64)}
    names, leaves, _ = _flatten_with_names(scene)
    for n, l in zip(names, leaves):
        arrays[f"scene/{n}"] = l
    if opt_state is not None:
        for i, leaf in enumerate(jax.tree_util.tree_leaves(opt_state)):
            arrays[f"opt/{i}"] = np.asarray(leaf)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"
    with open(tmp, "wb") as fh:
        np.savez(fh, **arrays)
    os.replace(tmp, path)


def load(path: str, scene_like, opt_state_like=None, allow_partial: bool = False):
    """Restore (scene, opt_state, step) using templates for structure.

    Strict by default: a checkpoint missing optimizer-state keys for the
    given template raises (silently resetting Adam moments corrupts a
    resumed run undetectably). Pass ``allow_partial=True`` to substitute
    template leaves for missing keys (e.g. loading a scene-only checkpoint
    into a run with a different optimizer).

    Scene keys are name-addressed, so a checkpoint written before a scene
    SCHEMA change (a new Materials field, say) is detected by name and
    raises a schema error rather than a bare KeyError. ``allow_partial``
    does NOT cover scene keys on purpose: optimizer-state keys are
    flat-INDEXED, so a schema change also silently misaligns every opt/<i>
    moment — substituting scene defaults would corrupt the resumed run
    undetectably. Re-create the checkpoint under the new schema instead.
    """
    with np.load(path) as data:
        step = int(data["__step__"])
        names, _, treedef = _flatten_with_names(scene_like)
        missing_scene = [n for n in names if f"scene/{n}" not in data]
        if missing_scene:
            raise ValueError(
                f"checkpoint {path!r} predates the current scene schema: "
                f"missing scene keys {missing_scene}. Old checkpoints "
                f"cannot be resumed across schema changes (the flat-indexed "
                f"optimizer moments would silently misalign) — re-run from "
                f"scratch or re-save the checkpoint under the new schema."
            )
        leaves = [jnp.asarray(data[f"scene/{n}"]) for n in names]
        scene = jax.tree_util.tree_unflatten(treedef, leaves)
        opt_state = None
        if opt_state_like is not None:
            flat, odef = jax.tree_util.tree_flatten(opt_state_like)
            restored = []
            missing = []
            for i, like in enumerate(flat):
                key = f"opt/{i}"
                if key in data:
                    restored.append(jnp.asarray(data[key]))
                else:
                    missing.append(key)
                    restored.append(like)
            if missing and not allow_partial:
                raise ValueError(
                    f"checkpoint {path!r} is missing optimizer-state keys "
                    f"{missing} for this optimizer (template has {len(flat)} "
                    f"leaves); pass allow_partial=True to substitute "
                    f"template values"
                )
            opt_state = jax.tree_util.tree_unflatten(odef, restored)
    return scene, opt_state, step
