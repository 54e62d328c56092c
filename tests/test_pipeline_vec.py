"""Object-vectorized renderer (ops/pipeline_vec.py): equivalence with the
unrolled pipeline, gradients, and O(1)-in-N trace size."""

import time

import jax
import numpy as np
import pytest

from reversible_raytracer_tpu.models import configs
from reversible_raytracer_tpu.ops.pipeline import RenderConfig
from reversible_raytracer_tpu.ops.pipeline_vec import render_jnp_vec
from reversible_raytracer_tpu.ops.render import mse_loss, render_jnp


@pytest.mark.parametrize("num", [1, 2, 3, 4])
def test_vec_matches_unrolled(num):
    scene, _, _ = configs.CONFIGS[num](48)
    for shadows in (True, False):
        cfg = RenderConfig(height=48, width=48, shadows=shadows)
        a = np.asarray(render_jnp(scene, cfg))
        b = np.asarray(render_jnp_vec(scene, cfg))
        # Bitwise: the object stage mirrors the unrolled pipeline's primitive
        # sequence and the shading is literally shared (shade_from_attrs).
        np.testing.assert_array_equal(a, b, err_msg=f"config {num} shadows={shadows}")


def test_vec_matches_unrolled_config5():
    scene, _, _ = configs.config5_many_spheres(64, n_spheres=32)
    cfg = RenderConfig(height=64, width=64, shadows=True)
    a = np.asarray(render_jnp(scene, cfg))
    b = np.asarray(render_jnp_vec(scene, cfg))
    np.testing.assert_array_equal(a, b)


def test_vec_shader_variants():
    scene, _, _ = configs.config2_four_spheres()
    for shader in ("depth", "normal"):
        cfg = RenderConfig(height=32, width=32, shader=shader)
        a = np.asarray(render_jnp(scene, cfg))
        b = np.asarray(render_jnp_vec(scene, cfg))
        np.testing.assert_array_equal(a, b, err_msg=shader)


def test_vec_gradients_match():
    scene, spec, _ = configs.config2_four_spheres()
    cfg = RenderConfig(height=32, width=32, shadows=True)
    target = render_jnp(scene, cfg)
    start = configs.perturb(scene, spec, scale=0.1, seed=5)
    ga = jax.grad(lambda s: mse_loss(render_jnp(s, cfg), target))(start)
    gb = jax.grad(lambda s: mse_loss(render_jnp_vec(s, cfg), target))(start)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(ga)[0],
        jax.tree_util.tree_flatten_with_path(gb)[0],
    ):
        a, b = np.asarray(a), np.asarray(b)
        if not a.size:
            continue
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=2e-2 * scale, err_msg=str(path))


def test_vec_trace_is_object_count_independent():
    """The jaxpr size must not grow with N (the whole point)."""
    cfg = RenderConfig(height=16, width=16, shadows=True)

    def n_eqns(n):
        scene, _, _ = configs.config5_many_spheres(16, n_spheres=n)
        jaxpr = jax.make_jaxpr(lambda s: render_jnp_vec(s, cfg))(scene)
        return len(jaxpr.jaxpr.eqns)

    assert n_eqns(64) == n_eqns(8)

    # ...while the unrolled pipeline's grows linearly.
    def n_eqns_unrolled(n):
        scene, _, _ = configs.config5_many_spheres(16, n_spheres=n)
        jaxpr = jax.make_jaxpr(lambda s: render_jnp(s, cfg))(scene)
        return len(jaxpr.jaxpr.eqns)

    assert n_eqns_unrolled(64) > 4 * n_eqns_unrolled(8)


def test_vec_sharded_band_rendering():
    """The vectorized path slots into the shard_map row-band machinery."""
    from reversible_raytracer_tpu.parallel import make_ray_mesh, render_sharded

    scene, _, _ = configs.config5_many_spheres(64, n_spheres=16)
    cfg = RenderConfig(height=64, width=64, shadows=True)
    mesh = make_ray_mesh(8)
    a = np.asarray(render_sharded(scene, cfg, mesh, impl="jnp_vec"))
    b = np.asarray(render_jnp(scene, cfg))
    err = np.abs(a - b)
    assert float((err > 1e-4).mean()) < 1e-3
