"""End-to-end inverse rendering: driver config 1 convergence (SURVEY.md §4.3)
plus optimizer-mechanics units (masking, bounds, scan loop, checkpointing)."""

import jax
import jax.numpy as jnp
import numpy as np

from reversible_raytracer_tpu.models import configs
from reversible_raytracer_tpu.models.scene import ParamSpec
from reversible_raytracer_tpu.optim import (
    OptConfig,
    make_step,
    optimize,
    optimize_scan,
    param_error,
    project_bounds,
)
from reversible_raytracer_tpu.ops.pipeline import RenderConfig
from reversible_raytracer_tpu.ops.render import render_jnp


def test_config1_converges():
    """Recover a single sphere's center+radius from a 48^2 target image."""
    scene, spec, _ = configs.config1_single_sphere()
    cfg = RenderConfig(height=48, width=48, shadows=False)
    target = render_jnp(scene, cfg)
    start = configs.perturb(scene, spec, scale=0.25, seed=1)
    assert float(param_error(start, scene, spec)) > 0.05

    # 800 iters: the center-z vs radius depth ambiguity resolves slowly
    # (silhouette matches early; shading disambiguates late) — constant lr,
    # since cosine decay would quench the long tail this test measures.
    final, losses = optimize_scan(
        start, target, spec, cfg, OptConfig(iters=800, lr=3e-2, schedule="constant")
    )
    err = float(param_error(final, scene, spec))
    assert err < 2e-2, f"param RMS error {err} after optimization"
    assert float(losses[-1]) < float(losses[0]) * 0.05


def test_optimize_host_loop_with_history(tmp_path):
    scene, spec, _ = configs.config1_single_sphere()
    cfg = RenderConfig(height=32, width=32, shadows=False)
    target = render_jnp(scene, cfg)
    start = configs.perturb(scene, spec, scale=0.2, seed=2)
    ckpt_path = str(tmp_path / "state.npz")
    final, history = optimize(
        start, target, spec, cfg, OptConfig(iters=40, lr=3e-2),
        log_every=10, truth=scene, checkpoint_path=ckpt_path,
    )
    assert len(history) >= 4
    assert history[-1]["loss"] < history[0]["loss"]
    assert "param_err" in history[0]

    # Resume continues from the checkpoint without error.
    final2, history2 = optimize(
        start, target, spec, cfg, OptConfig(iters=50, lr=3e-2),
        log_every=10, resume=ckpt_path,
    )
    assert history2[0]["step"] == 40


def test_gradient_masking_freezes_untrained_leaves():
    scene, spec, _ = configs.config1_single_sphere()
    cfg = RenderConfig(height=24, width=24, shadows=False)
    target = render_jnp(scene, cfg)
    start = configs.perturb(scene, spec, scale=0.2, seed=3)
    step, tx = make_step(cfg, spec, OptConfig(iters=1, lr=5e-2))
    new_scene, _, _, _ = step(start, tx.init(start), target)
    # Light position is not trainable in config 1 — must be bit-identical.
    np.testing.assert_array_equal(
        np.asarray(new_scene.lights.position), np.asarray(start.lights.position)
    )
    np.testing.assert_array_equal(
        np.asarray(new_scene.camera.eye), np.asarray(start.camera.eye)
    )
    # Trainable leaves moved.
    assert not np.array_equal(
        np.asarray(new_scene.spheres.center), np.asarray(start.spheres.center)
    )


def test_bounds_projection():
    scene, spec, _ = configs.config1_single_sphere()
    # Force radius outside its [0.2, 2.5] bounds and project.
    import dataclasses

    bad = dataclasses.replace(
        scene, spheres=dataclasses.replace(
            scene.spheres, radius=jnp.asarray([9.0], jnp.float32)))
    fixed = project_bounds(bad, spec)
    assert float(fixed.spheres.radius[0]) == 2.5
    # Non-trainable leaves are untouched even if out of any range.
    np.testing.assert_array_equal(
        np.asarray(fixed.lights.position), np.asarray(bad.lights.position)
    )


def test_checkpoint_roundtrip(tmp_path):
    from reversible_raytracer_tpu.utils import checkpoint as ckpt

    scene, spec, _ = configs.config2_four_spheres()
    path = str(tmp_path / "ck.npz")
    ckpt.save(path, scene, opt_state=None, step=7)
    scene2, _, step = ckpt.load(path, scene)
    assert step == 7
    for a, b in zip(jax.tree_util.tree_leaves(scene), jax.tree_util.tree_leaves(scene2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_config2_converges():
    """Driver config 2 (4 spheres + plane, Phong, shadows): recover
    centers/radii/albedos from a 5% perturbation with the documented
    robust recipe (Adam cosine, lr<=5e-3 — see docs/OPTIMIZATION_NOTES.md)."""
    import numpy as np

    from reversible_raytracer_tpu.models import configs as cfgs

    scene, spec, _ = cfgs.config2_four_spheres()
    cfg = RenderConfig(height=96, width=96, shadows=True)
    target = render_jnp(scene, cfg)
    start = cfgs.perturb(scene, spec, scale=0.05, seed=7)
    e0 = float(param_error(start, scene, spec))
    final, losses = optimize_scan(start, target, spec, cfg, OptConfig(iters=400, lr=3e-3))
    err = float(param_error(final, scene, spec))
    assert err < 0.06, f"param RMS {e0} -> {err}"
    assert float(np.asarray(losses)[-1]) < float(np.asarray(losses)[0]) * 0.6
