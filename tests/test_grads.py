"""Gradient fidelity: jax.grad of the jnp renderer vs central finite
differences of the float64 oracle loss (SURVEY.md §4.2 triangulation, part a).

Because the pipeline contains genuine discontinuities (nearest-hit select,
shadow step, hit/miss boundary), a finite-difference probe that happens to
flip a pixel's discrete decision produces an O(jump/2h) outlier the analytic
gradient rightly does not contain. We therefore compare direction (cosine
similarity) and relative L2 error over each parameter group rather than
exact elementwise equality, and use a probe step small enough that flips are
rare at the test resolution.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reversible_raytracer_tpu.models import configs
from reversible_raytracer_tpu.oracle import reference_np
from reversible_raytracer_tpu.ops.render import mse_loss, render_jnp


def _oracle_loss(scene, cfg, target64):
    img = reference_np.render(scene, cfg.height, cfg.width, shadows=cfg.shadows, clip=cfg.clip)
    return reference_np.mse_loss(img, target64)


def _fd_grad_leaf(scene, cfg, target64, get, set_, shape, h):
    """Central finite difference of the oracle loss w.r.t. one leaf."""
    g = np.zeros(shape)
    flat_idx = list(np.ndindex(*shape)) if shape else [()]
    for idx in flat_idx:
        for sgn in (+1, -1):
            delta = np.zeros(shape)
            if shape:
                delta[idx] = sgn * h
            else:
                delta = np.float64(sgn * h)
            l = _oracle_loss(set_(scene, get(scene) + delta), cfg, target64)
            if shape:
                g[idx] += sgn * l / (2 * h)
            else:
                g += sgn * l / (2 * h)
    return g


def _check_group(jax_g, fd_g, name, cos_tol=0.98, rel_tol=0.15):
    jax_g = np.asarray(jax_g, np.float64).ravel()
    fd_g = np.asarray(fd_g, np.float64).ravel()
    denom = np.linalg.norm(jax_g) * np.linalg.norm(fd_g)
    assert denom > 0, f"{name}: zero gradient"
    cos = float(np.dot(jax_g, fd_g) / denom)
    rel = float(np.linalg.norm(jax_g - fd_g) / (np.linalg.norm(fd_g) + 1e-12))
    assert cos > cos_tol, f"{name}: cosine {cos:.4f} (jax={jax_g}, fd={fd_g})"
    assert rel < rel_tol, f"{name}: rel L2 err {rel:.4f}"


@pytest.fixture(scope="module")
def sphere_setup():
    scene, spec, _ = configs.config1_single_sphere()
    from reversible_raytracer_tpu.ops.pipeline import RenderConfig

    cfg = RenderConfig(height=32, width=32, shadows=False)
    target64 = reference_np.render(scene, cfg.height, cfg.width, shadows=False)
    start = configs.perturb(scene, spec, scale=0.15, seed=3)
    loss_fn = jax.jit(
        lambda s: mse_loss(render_jnp(s, cfg), jnp.asarray(target64, jnp.float32))
    )
    grads = jax.jit(jax.grad(loss_fn))(start)
    return start, cfg, target64, grads


def test_grad_sphere_center(sphere_setup):
    start, cfg, target64, grads = sphere_setup
    fd = _fd_grad_leaf(
        start, cfg, target64,
        get=lambda s: np.asarray(s.spheres.center, np.float64),
        set_=lambda s, v: dataclasses.replace(
            s, spheres=dataclasses.replace(
                s.spheres, center=jnp.asarray(v, jnp.float32))),
        shape=(1, 3), h=3e-4,
    )
    _check_group(grads.spheres.center, fd, "spheres.center")


def test_grad_sphere_radius(sphere_setup):
    start, cfg, target64, grads = sphere_setup
    fd = _fd_grad_leaf(
        start, cfg, target64,
        get=lambda s: np.asarray(s.spheres.radius, np.float64),
        set_=lambda s, v: dataclasses.replace(
            s, spheres=dataclasses.replace(
                s.spheres, radius=jnp.asarray(v, jnp.float32))),
        shape=(1,), h=3e-4,
    )
    _check_group(grads.spheres.radius, fd, "spheres.radius")


def test_grad_material_color(sphere_setup):
    start, cfg, target64, grads = sphere_setup
    mat = start.spheres.material

    def set_color(s, v):
        m = dataclasses.replace(mat, color=jnp.asarray(v, jnp.float32))
        return dataclasses.replace(
            s, spheres=dataclasses.replace(s.spheres, material=m))

    fd = _fd_grad_leaf(
        start, cfg, target64,
        get=lambda s: np.asarray(s.spheres.material.color, np.float64),
        set_=set_color, shape=(1, 3), h=1e-4,
    )
    # Color gradients are smooth (no geometric discontinuity) — tight check.
    _check_group(grads.spheres.material.color, fd, "material.color", cos_tol=0.9999, rel_tol=0.01)


def test_grad_light_position():
    """Light-position gradients through Phong + shadows (config 3 capability)."""
    scene, spec, _ = configs.config2_four_spheres()
    from reversible_raytracer_tpu.ops.pipeline import RenderConfig

    cfg = RenderConfig(height=32, width=32, shadows=True)
    target64 = reference_np.render(scene, cfg.height, cfg.width, shadows=True)
    start = configs.perturb(scene, spec, scale=0.1, seed=5)
    loss_fn = jax.jit(
        lambda s: mse_loss(render_jnp(s, cfg), jnp.asarray(target64, jnp.float32))
    )
    grads = jax.jit(jax.grad(loss_fn))(start)

    def set_lp(s, v):
        return dataclasses.replace(
            s, lights=dataclasses.replace(
                s.lights, position=jnp.asarray(v, jnp.float32)))

    fd = _fd_grad_leaf(
        start, cfg, target64,
        get=lambda s: np.asarray(s.lights.position, np.float64),
        set_=set_lp, shape=(1, 3), h=3e-4,
    )
    _check_group(grads.lights.position, fd, "lights.position", cos_tol=0.97, rel_tol=0.2)


def test_grad_camera_pose():
    """Camera-pose gradients (config 4 capability)."""
    scene, spec, _ = configs.config4_checker_camera(32)
    from reversible_raytracer_tpu.ops.pipeline import RenderConfig

    cfg = RenderConfig(height=32, width=32, shadows=True)
    target64 = reference_np.render(scene, cfg.height, cfg.width, shadows=True)
    start = configs.perturb(scene, spec, scale=0.05, seed=7)
    loss_fn = jax.jit(
        lambda s: mse_loss(render_jnp(s, cfg), jnp.asarray(target64, jnp.float32))
    )
    grads = jax.jit(jax.grad(loss_fn))(start)

    def set_eye(s, v):
        return dataclasses.replace(
            s, camera=dataclasses.replace(
                s.camera, eye=jnp.asarray(v, jnp.float32)))

    fd = _fd_grad_leaf(
        start, cfg, target64,
        get=lambda s: np.asarray(s.camera.eye, np.float64),
        set_=set_eye, shape=(3,), h=3e-4,
    )
    _check_group(grads.camera.eye, fd, "camera.eye", cos_tol=0.95, rel_tol=0.3)


def test_grads_finite_everywhere():
    """No NaN/Inf gradients on any config, including grazing rays and
    checker materials (SURVEY.md §7 'grazing-ray numerics')."""
    from reversible_raytracer_tpu.ops.pipeline import RenderConfig

    for num in (1, 2, 3, 4):
        scene, spec, _ = configs.CONFIGS[num](32)
        cfg = RenderConfig(height=32, width=32, shadows=True)
        target = render_jnp(scene, cfg)
        start = configs.perturb(scene, spec, scale=0.2, seed=num)
        g = jax.jit(jax.grad(lambda s: mse_loss(render_jnp(s, cfg), target)))(start)
        for path, leaf in jax.tree_util.tree_flatten_with_path(g)[0]:
            assert np.isfinite(np.asarray(leaf)).all(), f"non-finite grad at {path} (config {num})"
