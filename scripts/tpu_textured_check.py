#!/usr/bin/env python
"""Compiled-TPU validation of the TEXTURED unrolled-kernel rows only
(subset of scripts/tpu_smoke.py — run before flipping impl='auto' to
route textured scenes onto the Pallas kernels).

Rows:
  - config 7 (rect grid texture)  @128²: render_pallas fwd vs jnp,
    loss_grad_pallas grads vs jax.grad(jnp).
  - config 8 (sphere lat-long)    @128²: same.
  - config 9 variant (env map, reflections=0) @128²: exercises the
    in-kernel miss_color/env dense-sampling path (the full config 9 has
    reflections=1 which the textured kernels refuse by design).

Dense-vs-gather sampling agrees to ~ulp except in half-texel edge bands,
so fwd tolerance is 1e-5 (not bit-exact). Exit 0 on success.
"""

import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def check_row(label, scene, spec, cfg, perturb_scale, seed):
    from reversible_raytracer_tpu.models import configs
    from reversible_raytracer_tpu.ops.kernels.fused import (
        loss_grad_pallas,
        render_pallas,
    )
    from reversible_raytracer_tpu.ops.render import mse_loss, render_jnp

    t0 = time.time()
    img_p = np.asarray(jax.jit(lambda s: render_pallas(s, cfg))(scene))
    img_j = np.asarray(jax.jit(lambda s: render_jnp(s, cfg))(scene))
    fwd_diff = np.abs(img_p - img_j).max()
    target = jnp.asarray(img_j)
    start = configs.perturb(scene, spec, scale=perturb_scale, seed=seed)
    l2, g2 = jax.jit(
        jax.value_and_grad(lambda s: mse_loss(render_jnp(s, cfg), target))
    )(start)
    l1, g1 = jax.jit(lambda s: loss_grad_pallas(s, cfg, target))(start)
    ldiff = abs(float(l1) - float(l2)) / max(float(l2), 1e-12)
    gdiff, finite = 0.0, True
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        a, b = np.asarray(a), np.asarray(b)
        if a.size:
            scale = max(float(np.abs(b).max()), 1e-10)
            gdiff = max(gdiff, float(np.abs(a - b).max()) / scale)
            finite &= bool(np.isfinite(a).all())
    ok = fwd_diff <= 1e-5 and ldiff <= 1e-4 and gdiff <= 1e-2 and finite
    print(f"{label}: fwd_diff={fwd_diff:.2e} loss_rel={ldiff:.2e} "
          f"grad_rel={gdiff:.2e} finite={finite} "
          f"[{'OK' if ok else 'FAIL'}] ({time.time()-t0:.0f}s)", flush=True)
    return ok


def main():
    import dataclasses

    from reversible_raytracer_tpu.models import configs
    from reversible_raytracer_tpu.ops.pipeline import RenderConfig

    assert jax.default_backend() == "tpu", f"not on TPU: {jax.default_backend()}"
    failures = 0
    for num, name in ((7, "rect-texture"), (8, "globe")):
        scene, spec, _ = configs.CONFIGS[num](128)
        cfg = RenderConfig(height=128, width=128, shadows=True)
        failures += not check_row(
            f"textured kernel config-{num} ({name}) @128²",
            scene, spec, cfg, perturb_scale=0.4, seed=num)

    scene9, spec9, cfg9 = configs.config9_sky(128)
    failures += not check_row(
        "env kernel config-9 (sky, reflections=0) @128²",
        scene9, spec9, dataclasses.replace(cfg9, reflections=0),
        perturb_scale=0.4, seed=9)
    # config 9 AS SHIPPED (reflections=1): env-only reflective scenes run
    # in-kernel — each bounce adds one dense env sample (miss_color of the
    # bounced ray), unlike object textures whose per-bounce chain replay
    # the kernel refuses.
    failures += not check_row(
        "env kernel config-9 (sky, reflections=1) @128²",
        scene9, spec9, cfg9, perturb_scale=0.4, seed=9)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
