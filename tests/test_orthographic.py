"""Orthographic projection variant (SURVEY.md C3)."""

import dataclasses

import jax
import numpy as np

from reversible_raytracer_tpu.models import configs
from reversible_raytracer_tpu.oracle import reference_np
from reversible_raytracer_tpu.ops.pipeline import RenderConfig
from reversible_raytracer_tpu.ops.render import mse_loss, render_jnp


def _ortho_cfg(size):
    return RenderConfig(height=size, width=size, shadows=True, projection="orthographic")


def test_ortho_matches_oracle():
    scene, _, _ = configs.config2_four_spheres()
    cfg = _ortho_cfg(64)
    img = np.asarray(jax.jit(lambda s: render_jnp(s, cfg))(scene))
    ref = reference_np.render(scene, 64, 64, shadows=True, projection="orthographic")
    err = np.abs(img - ref)
    assert float((err > 2e-3).mean()) < 1e-3
    assert float(err.mean()) < 1e-4


def test_ortho_differs_from_perspective_and_is_differentiable():
    scene, spec, _ = configs.config1_single_sphere()
    persp = RenderConfig(height=48, width=48, shadows=False)
    ortho = dataclasses.replace(persp, projection="orthographic")
    a = np.asarray(render_jnp(scene, persp))
    b = np.asarray(render_jnp(scene, ortho))
    assert np.abs(a - b).max() > 0.01  # projections genuinely differ

    target = render_jnp(scene, ortho)
    start = configs.perturb(scene, spec, scale=0.1, seed=2)
    g = jax.grad(lambda s: mse_loss(render_jnp(s, ortho), target))(start)
    leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(g) if np.size(l)]
    assert all(np.isfinite(l).all() for l in leaves)
    assert max(float(np.abs(l).max()) for l in leaves) > 0


def test_ortho_pallas_interpret():
    from reversible_raytracer_tpu.ops.kernels.fused import render_pallas

    scene, _, _ = configs.config2_four_spheres()
    cfg = _ortho_cfg(32)
    a = np.asarray(render_jnp(scene, cfg))
    b = np.asarray(render_pallas(scene, cfg, interpret=True))
    # A couple of geometric-boundary pixels may flip under different eval
    # orders; require bulk agreement.
    err = np.abs(a - b)
    assert float((err > 1e-3).mean()) == 0.0
    assert float(err.mean()) < 1e-5


def test_ortho_jnp_vec_matches_unrolled():
    """Orthographic projection through the object-vectorized path: bitwise
    equal to the unrolled renderer (shared camera_rays + shading)."""
    from reversible_raytracer_tpu.ops.pipeline_vec import render_jnp_vec

    scene, _, _ = configs.config2_four_spheres()
    cfg = _ortho_cfg(48)
    a = np.asarray(render_jnp(scene, cfg))
    b = np.asarray(render_jnp_vec(scene, cfg))
    np.testing.assert_array_equal(a, b)
