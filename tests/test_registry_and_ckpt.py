"""ParamSpec path-matching semantics + checkpoint strictness/resume fidelity.

Covers the round-1 advisor findings: substring path matching marked
`color2` trainable via the "color" needle (zero-gradient noise floor under
convergence metrics), periodic checkpoints double-applied one iteration on
resume, and `checkpoint.load` silently reset optimizer moments when opt/
keys were missing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reversible_raytracer_tpu.models import configs
from reversible_raytracer_tpu.models.scene import ParamSpec, path_matches


def _trainable_by_path(spec: ParamSpec) -> dict:
    paths, _ = jax.tree_util.tree_flatten_with_path(spec.trainable)
    out = {}
    for path, leaf in paths:
        name = ".".join(getattr(k, "name", getattr(k, "key", str(k))) for k in path)
        out[name] = bool(leaf)
    return out


def test_path_matches_segment_boundaries():
    assert path_matches("spheres.material.color", "color")
    assert not path_matches("spheres.material.color2", "color")
    assert path_matches("camera.eye", "camera")
    assert path_matches("spheres.material.color", "spheres.material.color")
    assert path_matches("a.color.b", "color")
    assert not path_matches("a.colorful.b", "color")


def test_config2_color2_not_trainable():
    scene, spec, _ = configs.config2_four_spheres()
    t = _trainable_by_path(spec)
    assert t["spheres.material.color"]
    assert not t["spheres.material.color2"]
    assert not t["rects.material.color"]  # plane albedo not optimized
    assert t["spheres.center"] and t["spheres.radius"]


def test_config4_color2_explicitly_trainable():
    scene, spec, _ = configs.config4_checker_camera(32)
    t = _trainable_by_path(spec)
    assert t["spheres.material.color"]
    assert t["spheres.material.color2"]
    assert t["camera.eye"] and t["camera.look_at"]
    assert not t["camera.up"] and not t["camera.fov_deg"]


def test_lr_scales_segment_matching():
    from reversible_raytracer_tpu.optim import scale_by_path

    scene, _, _ = configs.config2_four_spheres()
    tx = scale_by_path((("spheres.material.color", 0.0),))
    ones = jax.tree_util.tree_map(jnp.ones_like, scene)
    scaled, _ = tx.update(ones, tx.init(scene), scene)
    paths, _ = jax.tree_util.tree_flatten_with_path(scaled)
    for path, leaf in paths:
        if not leaf.size:
            continue  # the empty texture leaf has no scalable values
        name = ".".join(getattr(k, "name", getattr(k, "key", str(k))) for k in path)
        expect_zero = name == "spheres.material.color"
        got_zero = float(jnp.max(jnp.abs(leaf))) == 0.0
        assert got_zero == expect_zero, name


def test_checkpoint_strict_on_missing_opt_keys(tmp_path):
    import optax

    from reversible_raytracer_tpu.utils import checkpoint as ckpt

    scene, _, _ = configs.config1_single_sphere()
    p = str(tmp_path / "c.npz")
    ckpt.save(p, scene, opt_state=None, step=3)  # scene-only checkpoint

    tx = optax.adam(1e-3)
    template = tx.init(scene)
    with pytest.raises(ValueError, match="missing optimizer-state keys"):
        ckpt.load(p, scene, template)
    s2, o2, step = ckpt.load(p, scene, template, allow_partial=True)
    assert step == 3
    # Partial load keeps template optimizer leaves.
    for a, b in zip(jax.tree_util.tree_leaves(o2), jax.tree_util.tree_leaves(template)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_matches_uninterrupted(tmp_path):
    """A run interrupted at a periodic checkpoint and resumed must land on
    exactly the same scene as an uninterrupted run (no double-applied
    iteration)."""
    from reversible_raytracer_tpu.optim import OptConfig, optimize

    scene, spec, _ = configs.config1_single_sphere()
    from reversible_raytracer_tpu.ops.pipeline import RenderConfig

    rcfg = RenderConfig(height=24, width=24, shadows=False)
    from reversible_raytracer_tpu.ops.render import render_jnp

    target = render_jnp(scene, rcfg)
    start = configs.perturb(scene, spec, scale=0.1, seed=1)
    ocfg = OptConfig(iters=10, lr=1e-2, schedule="constant")

    ref, _ = optimize(start, target, spec, rcfg, ocfg, log_every=0)

    # Interrupted leg: capture the REAL periodic checkpoint written at it=5
    # (the first ckpt.save call), then pretend the process died there.
    from reversible_raytracer_tpu.utils import checkpoint as ckpt

    saves = []
    real_save = ckpt.save

    def recording_save(path, scene_, opt_state=None, step=0):
        saves.append(step)
        if len(saves) == 1:  # keep only the mid-run periodic checkpoint
            real_save(path, scene_, opt_state, step)

    p = str(tmp_path / "ck.npz")
    import unittest.mock as mock

    with mock.patch.object(ckpt, "save", recording_save):
        optimize(start, target, spec, rcfg, ocfg, log_every=0,
                 checkpoint_every=5, checkpoint_path=p)
    assert saves[0] == 6  # iteration 5 applied -> resume at 6
    resumed, _ = optimize(start, target, spec, rcfg, ocfg, log_every=0, resume=p)

    for a, b in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(resumed)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)
