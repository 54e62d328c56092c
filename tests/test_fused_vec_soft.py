"""Soft-visibility Pallas kernels (ops/kernels/fused_vec_soft.py):
interpret-mode fidelity vs pipeline_vec._render_soft, forward and the
hand-planned backward (two-layer compositing, soft-shadow product
transpose via chunked exclusive products).

Soft products reduce in a different association order than XLA's reduce
and layer ranking amplifies ULP t differences at silhouettes, so parity is
allclose-grade with the same boundary-masked methodology as the hard
kernels (tests/test_fused_vec.py): stable pixels ~1e-5, flips bounded.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reversible_raytracer_tpu.models import configs
from reversible_raytracer_tpu.ops.kernels.fused_vec_soft import render_pallas_vec_soft
from reversible_raytracer_tpu.ops.pipeline import RenderConfig
from reversible_raytracer_tpu.ops.pipeline_vec import render_jnp_vec
from test_fused_vec import _edge_mask


@pytest.mark.parametrize("tau", [0.08, 0.02])
def test_soft_fwd_matches_jnp_vec(tau):
    scene, _, _ = configs.config5_many_spheres(64, n_spheres=16)
    for shadows in (True, False):
        cfg = RenderConfig(height=64, width=64, shadows=shadows, soft_tau=tau)
        a = np.asarray(render_jnp_vec(scene, cfg))
        b = np.asarray(render_pallas_vec_soft(scene, cfg, interpret=True))
        stable = ~_edge_mask(a, b)
        assert stable.mean() > 0.3
        assert np.abs(a - b)[stable].max() < 1e-3, f"tau={tau} shadows={shadows}"
        assert np.abs(a - b)[stable].mean() < 1e-6
        assert (np.abs(a - b).max(-1) > 1e-3).mean() < 2e-2


def test_soft_bwd_matches_jnp_vec_masked():
    """Masked-loss gradient parity: excluding layer-decision boundary
    pixels, the hand-planned backward (S-vjp + shadow-product transpose +
    per-object masked vjps) and XLA autodiff of the jnp soft path are
    mathematically identical."""
    scene, spec, _ = configs.config5_many_spheres(48, n_spheres=12)
    cfg = RenderConfig(height=48, width=48, shadows=True, soft_tau=0.05)
    img_v = np.asarray(render_jnp_vec(scene, cfg))
    img_p = np.asarray(render_pallas_vec_soft(scene, cfg, interpret=True))
    w = jnp.asarray(~_edge_mask(img_v, img_p), jnp.float32)[..., None]
    target = jnp.zeros((48, 48, 3), jnp.float32)

    def loss(render):
        return lambda s: jnp.sum(w * (render(s) - target) ** 2)

    gv = jax.grad(loss(lambda s: render_jnp_vec(s, cfg)))(scene)
    gp = jax.grad(loss(lambda s: render_pallas_vec_soft(s, cfg, interpret=True)))(scene)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(gv)[0],
        jax.tree_util.tree_flatten_with_path(gp)[0],
    ):
        a, b = np.asarray(a), np.asarray(b)
        if not a.size:
            continue
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=2e-5 * scale, err_msg=str(path))


def test_soft_bwd_no_shadows():
    """The shadows=False path skips the occlusion transpose entirely."""
    scene, spec, _ = configs.config5_many_spheres(48, n_spheres=8)
    cfg = RenderConfig(height=48, width=48, shadows=False, soft_tau=0.05)
    img_v = np.asarray(render_jnp_vec(scene, cfg))
    img_p = np.asarray(render_pallas_vec_soft(scene, cfg, interpret=True))
    w = jnp.asarray(~_edge_mask(img_v, img_p), jnp.float32)[..., None]
    target = jnp.zeros((48, 48, 3), jnp.float32)

    def loss(render):
        return lambda s: jnp.sum(w * (render(s) - target) ** 2)

    gv = jax.grad(loss(lambda s: render_jnp_vec(s, cfg)))(scene)
    gp = jax.grad(loss(lambda s: render_pallas_vec_soft(s, cfg, interpret=True)))(scene)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(gv)[0],
        jax.tree_util.tree_flatten_with_path(gp)[0],
    ):
        a, b = np.asarray(a), np.asarray(b)
        if not a.size:
            continue
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=2e-5 * scale, err_msg=str(path))


def test_soft_trace_is_object_count_independent():
    cfg = RenderConfig(height=16, width=128, shadows=True, soft_tau=0.05)

    def n_eqns(n):
        scene, _, _ = configs.config5_many_spheres(16, n_spheres=n)
        jaxpr = jax.make_jaxpr(
            lambda s: render_pallas_vec_soft(s, cfg, interpret=True)
        )(scene)
        return len(str(jaxpr))

    assert abs(n_eqns(64) - n_eqns(8)) < 0.02 * n_eqns(8)


def test_soft_requires_tau():
    scene, _, _ = configs.config5_many_spheres(32, n_spheres=4)
    cfg = RenderConfig(height=32, width=32, soft_tau=0.0)
    with pytest.raises(ValueError):
        render_pallas_vec_soft(scene, cfg, interpret=True)


def test_soft_band_offsets():
    scene, _, _ = configs.config5_many_spheres(64, n_spheres=8)
    cfg = RenderConfig(height=64, width=64, shadows=True, soft_tau=0.05)
    full = np.asarray(render_pallas_vec_soft(scene, cfg, interpret=True))
    band = np.asarray(
        render_pallas_vec_soft(scene, cfg, row0=16.0, out_height=16, interpret=True)
    )
    np.testing.assert_array_equal(band, full[16:32])


def test_soft_sharded_band_rendering():
    """Soft rendering under the row-band shard_map (jnp_vec path on the
    fake CPU mesh; the pallas_vec_soft band contract is pinned by
    test_soft_band_offsets and shares _band_render_fn dispatch)."""
    from reversible_raytracer_tpu.parallel import make_ray_mesh, render_sharded

    scene, _, _ = configs.config5_many_spheres(64, n_spheres=8)
    cfg = RenderConfig(height=64, width=64, shadows=True, soft_tau=0.05)
    mesh = make_ray_mesh(8)
    a = np.asarray(render_sharded(scene, cfg, mesh, impl="jnp_vec"))
    b = np.asarray(render_jnp_vec(scene, cfg))
    np.testing.assert_array_equal(a, b)
