"""Image fidelity: jnp renderer vs the float64 numpy oracle.

This is the BASELINE.json:5 "images match allclose" requirement, with the
oracle standing in for Theano (SURVEY.md §4.2 — Theano is uninstallable
here; substitution recorded in oracle/reference_np.py docstring).
"""

import jax
import numpy as np
import pytest

from reversible_raytracer_tpu.models import configs
from reversible_raytracer_tpu.oracle import reference_np
from reversible_raytracer_tpu.ops.render import render_jnp


def _compare(scene, cfg, atol=2e-3):
    img = np.asarray(jax.jit(lambda s: render_jnp(s, cfg))(scene))
    ref = reference_np.render(scene, cfg.height, cfg.width, shadows=cfg.shadows, clip=cfg.clip)
    # f32 pipeline vs f64 oracle: tolerance covers accumulation differences.
    # A tiny number of pixels may disagree at geometric boundaries (hit/miss
    # decisions flip under f32); require 99.9% of pixels within atol and a
    # small mean error.
    err = np.abs(img - ref)
    frac_bad = float((err > atol).mean())
    assert frac_bad < 1e-3, f"{frac_bad:.2%} of pixel-channels differ by more than {atol}"
    assert float(err.mean()) < 1e-4


@pytest.mark.parametrize("num", [1, 2, 3])
def test_config_matches_oracle(num):
    scene, _, cfg = configs.CONFIGS[num](64)
    _compare(scene, cfg)


def test_config4_checker_camera_small():
    scene, _, cfg = configs.config4_checker_camera(96)
    _compare(scene, cfg)


def test_config5_many_spheres_small():
    scene, _, cfg = configs.config5_many_spheres(64, n_spheres=16)
    _compare(scene, cfg)


def test_no_shadows_vs_shadows_differ():
    from reversible_raytracer_tpu.ops.pipeline import RenderConfig

    scene, _, cfg = configs.config2_four_spheres(64)
    img_s = np.asarray(render_jnp(scene, cfg))
    cfg_ns = RenderConfig(height=cfg.height, width=cfg.width, shadows=False)
    img_ns = np.asarray(render_jnp(scene, cfg_ns))
    assert np.abs(img_s - img_ns).max() > 0.05  # shadows visibly present


def test_background_on_miss():
    import jax.numpy as jnp

    from reversible_raytracer_tpu.models.scene import Scene
    from reversible_raytracer_tpu.ops.pipeline import RenderConfig

    scene = Scene.make(background=(0.1, 0.2, 0.3))
    scene = jax.tree_util.tree_map(lambda x: x, scene)
    cfg = RenderConfig(height=16, width=16, shadows=True)
    img = np.asarray(render_jnp(scene, cfg))
    assert np.allclose(img, np.array([0.1, 0.2, 0.3]), atol=1e-6)
