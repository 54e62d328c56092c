"""Soft-checker relaxation (RenderConfig.checker_tau): texture-aware camera
gradients and the config-4 inversion they enable.

The reference checker is a floor/mod step (pipeline.rect_color): zero
gradient to hit positions, so camera pose optimized against checkered
materials (driver config 4) sees only aliasing noise — the measured
camera-only inversion DIVERGES (loss 0.012 -> 0.060 over 150 Adam steps).
checker_tau > 0 swaps the parity step for pipeline.soft_checker_q (smooth
triangle-wave product, exact hard parity as tau -> 0), annealed alongside
soft_tau by optim.optimize_annealed(checker_ratio=...).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reversible_raytracer_tpu.models import configs
from reversible_raytracer_tpu.models.scene import (
    Camera,
    Lights,
    Materials,
    ParamSpec,
    Scene,
    ground_plane,
)
from reversible_raytracer_tpu.ops.pipeline import RenderConfig, soft_checker_q
from reversible_raytracer_tpu.ops.pipeline_vec import render_jnp_vec
from reversible_raytracer_tpu.optim import OptConfig, optimize_annealed
from test_fused_vec import _edge_mask


def _checker_cfg(size=64, **kw):
    return RenderConfig(height=size, width=size, shadows=True, **kw)


def _scene4(size=64):
    scene, spec, cfg = configs.config4_checker_camera(size)
    return scene, spec, cfg


def test_soft_checker_q_hard_limit():
    """q -> (-1)^(sum floor) as tau -> 0; q is finite even AT boundaries
    with tau == 0 (the AD-safety guard for the kernels' runtime select)."""
    x = jnp.linspace(-3.0, 3.0, 241)  # includes exact integers
    q0 = np.asarray(soft_checker_q((x,), 0.0))
    assert np.isfinite(q0).all()
    off = np.abs(np.asarray(x) - np.round(np.asarray(x))) > 1e-6
    hard = (-1.0) ** np.floor(np.asarray(x[off]))
    # atol bounded by the f32-safe 1e-6 denominator guard (see
    # soft_checker_q docstring): |q| = |tri| / (|tri| + 1e-6) >= 1 - 1e-4
    # at the linspace's >= 0.025 boundary distance.
    np.testing.assert_allclose(q0[off], hard, atol=1e-4)
    # 2-D product matches the 2-D parity.
    q2 = np.asarray(soft_checker_q((jnp.asarray(0.25), jnp.asarray(1.25)), 0.0))
    assert q2 == pytest.approx(-1.0, abs=1e-4)  # floor sum = 1 -> odd


def test_checker_tau_limit_matches_hard_image():
    """checker_tau -> 0: the soft image converges to the hard one (the
    anneal ends on reference semantics). Differences shrink monotonically
    to thin cell-boundary bands (config 4's scale-18 plane checker has
    ~2 px cells at 64^2, so the bands are a sizeable fraction at large
    tau — the assertion is the monotone approach, plus a tight absolute
    bound at small tau)."""
    scene, _, _ = _scene4(64)
    hard = np.asarray(render_jnp_vec(scene, _checker_cfg(64)))
    fracs = []
    for tau in (0.5, 0.05, 0.005):
        soft = np.asarray(
            render_jnp_vec(scene, _checker_cfg(64, checker_tau=tau))
        )
        fracs.append((np.abs(soft - hard).max(-1) > 0.1).mean())
    assert fracs[0] > fracs[1] > fracs[2], fracs  # monotone approach
    assert fracs[2] < 0.03, fracs  # near-hard at tau = 0.005
    assert fracs[0] > 0.05, fracs  # the relaxation is live at coarse tau


def test_checker_free_scene_invariant_under_checker_tau():
    """Scenes without checker materials (config 5) render IDENTICALLY for
    any checker_tau: use2 = checker * parity == 0 exactly."""
    scene, _, _ = configs.config5_many_spheres(48, n_spheres=6)
    cfg = _checker_cfg(48, soft_tau=0.05)
    a = np.asarray(render_jnp_vec(scene, cfg))
    b = np.asarray(
        render_jnp_vec(scene, dataclasses.replace(cfg, checker_tau=0.7))
    )
    np.testing.assert_array_equal(a, b)


def test_checker_gives_camera_gradients():
    """Flat-lit checkered plane (ka=1, kd=ks=0: the image IS the checker
    pattern): the hard camera-eye gradient is exactly zero — the config-4
    failure mode — while the soft checker points descent back toward the
    true pose."""
    plane = ground_plane(
        -0.5, 8.0,
        Materials.make((0.9, 0.9, 0.9), color2=(0.1, 0.1, 0.1), checker=1.0,
                       checker_scale=8.0, ka=1.0, kd=0.0, ks=0.0),
    )
    lights = Lights(
        position=jnp.asarray([[2.0, 5.0, 2.0]], jnp.float32),
        color=jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32),
    )
    def make(eye_x):
        return Scene.make(
            rects=plane, lights=lights,
            camera=Camera.make((eye_x, 2.0, 3.0), (0.0, -0.5, 0.0), fov_deg=55.0),
        )

    cfg = RenderConfig(height=48, width=48, shadows=False)
    target = render_jnp_vec(make(0.0), cfg)

    def geye(cfg_):
        g = jax.grad(
            lambda ex: jnp.mean((render_jnp_vec(make(ex), cfg_) - target) ** 2)
        )(jnp.asarray(0.12, jnp.float32))
        return float(g)

    assert abs(geye(cfg)) < 1e-8  # hard: zero texture gradient
    g_soft = geye(dataclasses.replace(cfg, checker_tau=0.5))
    assert np.isfinite(g_soft)
    assert g_soft > 1e-4  # descent (-g) moves eye_x back toward 0


def test_checker_camera_grad_matches_fd_oracle():
    """Triangulation (SURVEY §4.2 methodology): the analytic camera-eye
    gradient through the soft checker matches central finite differences of
    the INDEPENDENT float64 numpy oracle. The soft checker is smooth, so —
    unlike the hard pipeline's FD tests — no decision-flip outliers are
    expected on a borderless flat-lit plane."""
    from reversible_raytracer_tpu.oracle import reference_np

    plane = ground_plane(
        -0.5, 20.0,
        Materials.make((0.9, 0.9, 0.9), color2=(0.1, 0.1, 0.1), checker=1.0,
                       checker_scale=4.0, ka=1.0, kd=0.0, ks=0.0),
    )
    lights = Lights(
        position=jnp.asarray([[2.0, 5.0, 2.0]], jnp.float32),
        color=jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32),
    )

    def make(eye):
        return Scene.make(
            rects=plane, lights=lights,
            camera=Camera.make(tuple(eye), (0.0, -0.5, 0.0), fov_deg=55.0),
        )

    cfg = RenderConfig(height=32, width=32, shadows=False, checker_tau=0.4)
    tau = cfg.checker_tau
    truth_eye = np.array([0.0, 2.0, 3.0])
    target = render_jnp_vec(make(truth_eye), cfg)
    target64 = reference_np.render(make(truth_eye), 32, 32, shadows=False,
                                   checker_tau=tau)
    eye0 = truth_eye + np.array([0.07, -0.05, 0.04])

    g_jax = np.asarray(jax.grad(
        lambda e: jnp.mean((render_jnp_vec(make(e), cfg) - target) ** 2)
    )(jnp.asarray(eye0, jnp.float32)), np.float64)

    h = 1e-5
    g_fd = np.zeros(3)
    for i in range(3):
        for sgn in (+1, -1):
            e = eye0.copy()
            e[i] += sgn * h
            img = reference_np.render(make(e), 32, 32, shadows=False,
                                      checker_tau=tau)
            g_fd[i] += sgn * reference_np.mse_loss(img, target64) / (2 * h)

    assert np.linalg.norm(g_fd) > 1e-6
    cos = float(g_jax @ g_fd / (np.linalg.norm(g_jax) * np.linalg.norm(g_fd)))
    rel = float(np.linalg.norm(g_jax - g_fd) / np.linalg.norm(g_fd))
    assert cos > 0.995, (cos, g_jax, g_fd)
    assert rel < 0.05, (rel, g_jax, g_fd)


def test_soft_kernel_checker_fwd_matches_jnp():
    """fused_vec_soft with a runtime checker_tau reproduces the jnp soft
    path on a checkered scene (boundary-masked, interpret mode)."""
    from reversible_raytracer_tpu.ops.kernels.fused_vec_soft import (
        render_pallas_vec_soft,
    )

    scene, _, _ = _scene4(64)
    cfg = _checker_cfg(64, soft_tau=0.05, checker_tau=0.5)
    a = np.asarray(render_jnp_vec(scene, cfg))
    b = np.asarray(render_pallas_vec_soft(scene, cfg, interpret=True))
    stable = ~_edge_mask(a, b)
    assert stable.mean() > 0.3
    assert np.abs(a - b)[stable].max() < 1e-3
    assert (np.abs(a - b).max(-1) > 1e-3).mean() < 2e-2


def test_soft_kernel_ctau_zero_is_hard_select():
    """checker_tau == 0 through the kernels' runtime where-select must
    reproduce the hard checker EXACTLY (the anneal's tau = 0 limit)."""
    from reversible_raytracer_tpu.ops.kernels.fused_vec_soft import (
        render_pallas_vec_soft,
    )

    scene, _, _ = _scene4(64)
    cfg = _checker_cfg(64, soft_tau=0.05, checker_tau=0.0)
    a = np.asarray(render_jnp_vec(scene, cfg))  # static hard-checker branch
    b = np.asarray(render_pallas_vec_soft(scene, cfg, interpret=True))
    stable = ~_edge_mask(a, b)
    assert np.abs(a - b)[stable].max() < 1e-3
    assert np.abs(a - b)[stable].mean() < 1e-6


def test_soft_kernel_checker_grads_match_jnp():
    """Hand-planned soft backward with checker_tau: gradient parity with
    XLA autodiff of the jnp soft path, INCLUDING the camera leaves (the
    d(color)/d(position)/d(rays) path the soft checker adds)."""
    from reversible_raytracer_tpu.ops.kernels.fused_vec_soft import (
        render_pallas_vec_soft,
    )

    scene, _, _ = _scene4(48)
    cfg = _checker_cfg(48, soft_tau=0.05, checker_tau=0.5)
    img_v = np.asarray(render_jnp_vec(scene, cfg))
    img_p = np.asarray(render_pallas_vec_soft(scene, cfg, interpret=True))
    w = jnp.asarray(~_edge_mask(img_v, img_p), jnp.float32)[..., None]
    target = jnp.zeros(img_v.shape, jnp.float32)

    def loss(render):
        return lambda s: jnp.sum(w * (render(s) - target) ** 2)

    gv = jax.grad(loss(lambda s: render_jnp_vec(s, cfg)))(scene)
    gp = jax.grad(loss(lambda s: render_pallas_vec_soft(s, cfg, interpret=True)))(scene)
    cam_mag = float(np.abs(np.asarray(gv.camera.eye)).max())
    assert cam_mag > 1e-6  # the camera path is live in this scene
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(gv)[0],
        jax.tree_util.tree_flatten_with_path(gp)[0],
    ):
        a, b = np.asarray(a), np.asarray(b)
        if not a.size:
            continue
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=2e-5 * scale, err_msg=str(path))


def test_sharded_soft_checker_band_rendering():
    """checker_tau under the row-band shard_map: per-band rendering of the
    checkered scene equals the single-device soft image exactly."""
    from reversible_raytracer_tpu.parallel import make_ray_mesh, render_sharded

    scene, _, _ = _scene4(64)
    cfg = _checker_cfg(64, soft_tau=0.05, checker_tau=0.5)
    mesh = make_ray_mesh(8)
    a = np.asarray(render_sharded(scene, cfg, mesh, impl="jnp_vec"))
    b = np.asarray(render_jnp_vec(scene, cfg))
    np.testing.assert_array_equal(a, b)


def test_config4_camera_inversion_converges():
    """The config-4 capability at CI scale: camera pose + colors against
    checkered materials recover via the checker_ratio anneal (the hard
    recipe diverges from this exact start — see the docstring numbers)."""
    scene, spec, _ = _scene4(64)
    cfg = _checker_cfg(64)
    target = render_jnp_vec(scene, cfg)
    start = configs.perturb(scene, spec, scale=0.05, seed=0)

    def eye_rms(s):
        return float(jnp.sqrt(jnp.mean((s.camera.eye - scene.camera.eye) ** 2)))

    rms0 = eye_rms(start)
    assert rms0 > 0.05
    ocfg = OptConfig(iters=100, lr=5e-3, schedule="cosine")
    final, losses = optimize_annealed(
        start, target, spec, cfg, ocfg,
        taus=(0.08, 0.03, 0.0), target_scene=scene, checker_ratio=12.5,
    )
    assert np.isfinite(np.asarray(losses)).all()
    rms = eye_rms(final)
    assert rms < 0.02 * rms0, f"camera did not recover: {rms0} -> {rms}"
