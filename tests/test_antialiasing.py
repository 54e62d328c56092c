"""Supersampling anti-aliasing (RenderConfig.spp)."""

import dataclasses

import jax
import numpy as np

from reversible_raytracer_tpu.models import configs
from reversible_raytracer_tpu.ops.pipeline import RenderConfig
from reversible_raytracer_tpu.ops.render import mse_loss, render_jnp


def test_spp4_softens_edges():
    scene, _, _ = configs.config1_single_sphere()
    cfg1 = RenderConfig(height=48, width=48, shadows=False)
    cfg4 = dataclasses.replace(cfg1, spp=4)
    a = np.asarray(render_jnp(scene, cfg1))
    b = np.asarray(render_jnp(scene, cfg4))
    # Interiors agree; edges get intermediate values.
    assert np.abs(a - b).max() > 0.05  # some edge pixel changed visibly
    assert np.abs(a.mean() - b.mean()) < 5e-3  # total energy ~preserved
    # spp=4 creates genuinely fractional coverage values at silhouettes.
    edge_vals = b[(b[..., 0] > 0.05) & (b[..., 0] < 0.95 * a[..., 0].max())]
    assert edge_vals.size > 0


def test_spp4_is_mean_of_subpixel_renders():
    """spp=4 must equal the average of four offset pixel-center renders
    (verified via a 2x supersampled image downsampled 2x2)."""
    scene, _, _ = configs.config1_single_sphere()
    cfg4 = RenderConfig(height=32, width=32, shadows=False, spp=4)
    b = np.asarray(render_jnp(scene, cfg4))
    hi = RenderConfig(height=64, width=64, shadows=False)
    big = np.asarray(render_jnp(scene, hi))
    down = big.reshape(32, 2, 32, 2, 3).mean(axis=(1, 3))
    np.testing.assert_allclose(b, down, atol=1e-5)


def test_spp4_gradients_finite_and_pallas_matches():
    from reversible_raytracer_tpu.ops.kernels.fused import render_pallas

    scene, spec, _ = configs.config2_four_spheres()
    cfg = RenderConfig(height=32, width=32, shadows=True, spp=4)
    a = np.asarray(render_jnp(scene, cfg))
    b = np.asarray(render_pallas(scene, cfg, interpret=True))
    err = np.abs(a - b)
    assert float((err > 1e-3).mean()) < 1e-3
    target = render_jnp(scene, cfg)
    start = configs.perturb(scene, spec, scale=0.1, seed=3)
    gj = jax.grad(lambda s: mse_loss(render_jnp(s, cfg), target))(start)
    gp = jax.grad(lambda s: mse_loss(render_pallas(s, cfg, interpret=True), target))(start)
    for (path, x), (_, y) in zip(
        jax.tree_util.tree_flatten_with_path(gj)[0],
        jax.tree_util.tree_flatten_with_path(gp)[0],
    ):
        x, y = np.asarray(x), np.asarray(y)
        if not x.size:
            continue
        assert np.isfinite(x).all() and np.isfinite(y).all()
        scale = max(np.abs(x).max(), 1e-6)
        np.testing.assert_allclose(x, y, atol=1e-2 * scale, err_msg=str(path))


def test_spp4_multilight_grads_masked_vis_residuals():
    """VERDICT round-1 item #6: spp=4 backward now uses per-(subsample,
    light) visibility residuals instead of silently recomputing. Two lights
    x 4 subsamples = 8 saved planes; masked comparison vs the jnp path must
    agree to 1e-5 of group scale (the two backwards are mathematically
    identical away from discontinuity pixels)."""
    import jax.numpy as jnp
    from test_fused_vec import _edge_mask

    from reversible_raytracer_tpu.ops.kernels.fused import render_pallas

    scene, spec, _ = configs.config3_multi_light()
    cfg = RenderConfig(height=32, width=32, shadows=True, spp=4)
    start = configs.perturb(scene, spec, scale=0.1, seed=6)
    img_j = np.asarray(render_jnp(start, cfg))
    img_p = np.asarray(render_pallas(start, cfg, interpret=True))
    w = jnp.asarray(~_edge_mask(img_j, img_p), jnp.float32)[..., None]
    target = jnp.zeros((32, 32, 3), jnp.float32)

    def loss(render):
        return lambda s: jnp.sum(w * (render(s) - target) ** 2)

    gj = jax.grad(loss(lambda s: render_jnp(s, cfg)))(start)
    gp = jax.grad(loss(lambda s: render_pallas(s, cfg, interpret=True)))(start)
    for (path, x), (_, y) in zip(
        jax.tree_util.tree_flatten_with_path(gj)[0],
        jax.tree_util.tree_flatten_with_path(gp)[0],
    ):
        x, y = np.asarray(x), np.asarray(y)
        if not x.size:
            continue
        scale = max(np.abs(x).max(), 1e-6)
        np.testing.assert_allclose(x, y, atol=1e-5 * scale, err_msg=str(path))
