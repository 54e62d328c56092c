"""Per-parameter-group LR scaling (OptConfig.lr_scales)."""

import jax
import numpy as np

from reversible_raytracer_tpu.models import configs
from reversible_raytracer_tpu.optim import OptConfig, make_step
from reversible_raytracer_tpu.ops.pipeline import RenderConfig
from reversible_raytracer_tpu.ops.render import render_jnp


def test_lr_scale_shrinks_group_updates():
    scene, spec, _ = configs.config1_single_sphere()
    cfg = RenderConfig(height=24, width=24, shadows=False)
    target = render_jnp(scene, cfg)
    start = configs.perturb(scene, spec, scale=0.2, seed=3)

    def one_step(ocfg):
        step, tx = make_step(cfg, spec, ocfg)
        s, _, _, _ = step(start, tx.init(start), target)
        return s

    base = one_step(OptConfig(iters=1, lr=1e-2, schedule="constant"))
    scaled = one_step(OptConfig(iters=1, lr=1e-2, schedule="constant",
                                lr_scales=(("spheres.radius", 0.1),)))

    d_base_r = np.abs(np.asarray(base.spheres.radius) - np.asarray(start.spheres.radius))
    d_scaled_r = np.abs(np.asarray(scaled.spheres.radius) - np.asarray(start.spheres.radius))
    # Radius updates shrink by ~10x; center updates unchanged.
    np.testing.assert_allclose(d_scaled_r, d_base_r * 0.1, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(scaled.spheres.center), np.asarray(base.spheres.center), atol=1e-7
    )
