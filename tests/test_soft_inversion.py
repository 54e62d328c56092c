"""Soft-visibility silhouette-aware gradients (RenderConfig.soft_tau) and
the annealed joint inversion they enable (VERDICT round-1 item #2 /
BASELINE config 5 "full joint inverse render").

The hard renderer's autodiff carries no silhouette or shadow-boundary
gradients (docs/OPTIMIZATION_NOTES.md): round 1's best config-5-style
joint inversion DIVERGED (param RMS 0.026 -> 0.030+). The soft mode adds
sigmoid sphere coverage composited over the next-nearest surface plus
soft shadow occlusion; annealing tau -> 0 recovers the reference-faithful
hard objective.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from reversible_raytracer_tpu.models import configs
from reversible_raytracer_tpu.ops.pipeline import RenderConfig
from reversible_raytracer_tpu.ops.pipeline_vec import render_jnp_vec
from reversible_raytracer_tpu.optim import (
    OptConfig,
    optimize_annealed,
    param_error,
)


def test_soft_limit_matches_hard():
    """tau -> 0: the soft image converges to the hard image (annealing ends
    on reference semantics)."""
    scene, _, _ = configs.config5_many_spheres(64, n_spheres=8)
    cfg = RenderConfig(height=64, width=64, shadows=True)
    hard = np.asarray(render_jnp_vec(scene, cfg))
    for tau, bound in ((0.01, 0.02), (0.05, 0.08)):
        soft = np.asarray(
            render_jnp_vec(scene, dataclasses.replace(cfg, soft_tau=tau))
        )
        d = np.abs(soft - hard)
        # Differences live only in thin silhouette/shadow bands.
        assert d.mean() < bound * 0.05, tau
        assert (d.max(-1) > 0.1).mean() < bound, tau


def test_soft_gives_silhouette_gradients():
    """With a FLAT-SHADED sphere (ka=1, kd=ks=0 — constant interior color)
    the hard renderer's center gradient is exactly zero (the image only
    changes at the silhouette, a step): the textbook raytracer-autodiff
    failure. The soft renderer's coverage term produces a finite gradient
    pointing back toward the target."""
    from reversible_raytracer_tpu.models.scene import (
        Camera,
        Lights,
        Materials,
        Scene,
        sphere,
    )

    flat = sphere(
        (0.5, 0.0, 0.0), 1.0,
        Materials.make((0.9, 0.2, 0.2), ka=1.0, kd=0.0, ks=0.0),
    )
    truth_s = sphere(
        (0.0, 0.0, 0.0), 1.0,
        Materials.make((0.9, 0.2, 0.2), ka=1.0, kd=0.0, ks=0.0),
    )
    cam = Camera.make((0.0, 0.0, 4.0), (0.0, 0.0, 0.0), fov_deg=50.0)
    lights = Lights(
        position=jnp.asarray([[3.0, 4.0, 5.0]], jnp.float32),
        color=jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32),
    )
    moved = Scene.make(spheres=flat, lights=lights, camera=cam)
    truth = Scene.make(spheres=truth_s, lights=lights, camera=cam)
    cfg = RenderConfig(height=48, width=48, shadows=False)
    target = render_jnp_vec(truth, cfg)

    def gc(cfg_):
        g = jax.grad(
            lambda s: jnp.mean((render_jnp_vec(s, cfg_) - target) ** 2)
        )(moved)
        return np.asarray(g.spheres.center)[0]

    g_hard = gc(cfg)
    g_soft = gc(dataclasses.replace(cfg, soft_tau=0.1))
    assert abs(g_hard[0]) < 1e-8  # hard: no silhouette gradient at all
    assert np.isfinite(g_soft).all()
    # Soft: descent direction (-g) moves the sphere back toward the target.
    assert g_soft[0] > 1e-4


def test_annealed_joint_inversion_converges():
    """16-sphere joint inversion (config-5 geometry at CI scale) from the
    documented 2-3% perturbation: param RMS must drop below 0.01. Round 1's
    hard-only recipe diverged from this exact start."""
    size, n = 96, 16
    scene, spec, _ = configs.config5_many_spheres(size, n_spheres=n)
    cfg = RenderConfig(height=size, width=size, shadows=True)
    target = render_jnp_vec(scene, cfg)
    start = configs.perturb(scene, spec, scale=0.03, seed=1)
    rms0 = float(param_error(start, scene, spec))
    assert 0.02 < rms0 < 0.04  # the documented regime

    ocfg = OptConfig(iters=300, lr=2e-3, schedule="cosine")
    final, losses = optimize_annealed(
        start, target, spec, cfg, ocfg,
        taus=(0.08, 0.03, 0.0), target_scene=scene,
    )
    rms = float(param_error(final, scene, spec))
    assert np.isfinite(np.asarray(losses)).all()
    assert rms < 0.01, f"annealed inversion did not converge: {rms0} -> {rms}"
    assert rms < 0.5 * rms0


def test_soft_tau_dispatch_guards():
    """soft_tau > 0 must never silently render hard: impl='auto' routes to
    the jnp_vec soft implementation, and the Pallas factories refuse."""
    import pytest

    from reversible_raytracer_tpu.ops.kernels.fused import render_pallas
    from reversible_raytracer_tpu.ops.kernels.fused_vec import render_pallas_vec
    from reversible_raytracer_tpu.ops.render import render

    scene, _, _ = configs.config5_many_spheres(32, n_spheres=4)
    cfg = RenderConfig(height=32, width=32, shadows=True, soft_tau=0.05)
    auto = np.asarray(render(scene, cfg, impl="auto"))
    soft = np.asarray(render_jnp_vec(scene, cfg))
    np.testing.assert_array_equal(auto, soft)
    with pytest.raises(NotImplementedError):
        render_pallas(scene, cfg, interpret=True)
    with pytest.raises(NotImplementedError):
        render_pallas_vec(scene, cfg, interpret=True)


def test_multistart_recovers_topology_stall():
    """VERDICT r2 item #9 / OPTIMIZATION_NOTES "Narrow basins": config-2
    perturbation scale 0.3 seed 2 stalls the single annealed run (the
    start is outside every first-order basin), and the seeded
    random-restart wrapper recovers it — restart 0 reproduces the stall,
    a jittered restart lands inside the basin and wins on the true hard
    loss. Measured landscape (48^2, iters=150, restarts=5, jitter=0.15):
    scale 0.3/s2 stall RMS 0.25 -> 0.007; scale 0.6/s1 stall 0.35 ->
    0.0004; scale 0.45/s2 resists restarts at every jitter tried (the
    documented remaining hole). CI runs the cheaper iters=100/restarts=4
    variant (stall 0.24 -> RMS 0.077, loss 7.5e-3 -> 2.6e-3)."""
    from reversible_raytracer_tpu.optim import optimize_multistart, param_error

    scene, spec, _ = configs.config2_four_spheres(48)
    cfg = RenderConfig(height=48, width=48, shadows=True)
    target = render_jnp_vec(scene, cfg)
    ocfg = OptConfig(iters=100, lr=1e-2, schedule="cosine")
    start = configs.perturb(scene, spec, scale=0.3, seed=2)
    err0 = float(param_error(start, scene, spec))

    best, best_loss, finals = optimize_multistart(
        start, target, spec, cfg, ocfg,
        restarts=4, jitter=0.15, seed=100,
        taus=(0.08, 0.03, 0.0), target_scene=scene,
    )
    # restart 0 (the unjittered start) reproduces the documented stall...
    assert finals[0] > 4e-3, finals
    # ...a jittered restart escapes it and wins on the true hard loss
    assert best_loss < 0.5 * finals[0], finals
    assert best_loss == min(finals)
    err1 = float(param_error(best, scene, spec))
    assert err1 < 0.45 * err0, (err0, err1)
