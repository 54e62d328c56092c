"""Depth / normal shader variants (SURVEY.md C15) — geometric invariants and
Pallas(interpret) parity (the kernels inherit the variants for free via the
shared render_tile)."""

import numpy as np

from reversible_raytracer_tpu.models import configs
from reversible_raytracer_tpu.ops.pipeline import RenderConfig
from reversible_raytracer_tpu.ops.render import render_jnp


def test_depth_shader_geometry():
    scene, _, _ = configs.config1_single_sphere()
    cfg = RenderConfig(height=64, width=64, shader="depth")
    img = np.asarray(render_jnp(scene, cfg))
    # Grayscale; background exactly 0; sphere center closer than its limb.
    assert np.array_equal(img[..., 0], img[..., 1])
    assert img[0, 0, 0] == 0.0
    c = img[32, 32, 0]
    # Camera at z=4, sphere r=1 at origin -> nearest t=3, z=1/4.
    np.testing.assert_allclose(c, 0.25, atol=1e-3)
    assert c == img.max()


def test_normal_shader_range_and_orientation():
    scene, _, _ = configs.config1_single_sphere()
    cfg = RenderConfig(height=64, width=64, shader="normal")
    img = np.asarray(render_jnp(scene, cfg))
    assert img.min() >= 0.0 and img.max() <= 1.0
    # Center pixel's normal faces the camera (+z): encoded z ~= 1.
    np.testing.assert_allclose(img[32, 32, 2], 1.0, atol=1e-2)
    # Background encodes to 0.
    assert img[0, 0, 2] == 0.0


def test_shader_variants_in_pallas_interpret():
    from reversible_raytracer_tpu.ops.kernels.fused import render_pallas

    scene, _, _ = configs.config2_four_spheres()
    for shader in ("depth", "normal"):
        cfg = RenderConfig(height=32, width=32, shader=shader)
        a = np.asarray(render_jnp(scene, cfg))
        b = np.asarray(render_pallas(scene, cfg, interpret=True))
        np.testing.assert_allclose(a, b, atol=1e-4)
