"""Measure the soft-family spp=4 wrapper gap (VERDICT r4 #7).

An annealed spp=4 inversion's SOFT stages cannot use the fused soft step
kernel (spp=1 only); optimize_annealed's documented fall-through is
jax.value_and_grad over the 4-launch wrapper-averaged soft render
(semantically exact: the residual is of the post-clip subsample average,
formed by XLA outside the kernels). This probe prices that fall-through
against the fused spp=1 soft step so the refusal at
fused_vec_soft._make_fused_vec_soft can carry real numbers:

    soft_spp1_step_ms   — fused soft step (the anneal's spp=1 hot path)
    soft_spp4_vag_ms    — value_and_grad over the spp=4 wrapper render
    ratio               — spp4_vag / spp1_step (fusing the 2x2 loop
                          in-kernel could at BEST recover ratio -> ~4x)

Usage: python scripts/soft_spp4_probe.py [--n 64] [--size 512]
"""

import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--tau", type=float, default=0.05)
    args = ap.parse_args()

    from bench import _grad_total, _median_slope, _vag_total
    from reversible_raytracer_tpu.models import configs
    from reversible_raytracer_tpu.ops.kernels.fused_vec_soft import (
        loss_grad_pallas_vec_soft,
        render_pallas_vec_soft,
    )
    from reversible_raytracer_tpu.ops.pipeline import RenderConfig

    log(f"backend={jax.default_backend()}")
    H = W = args.size
    scene, _, _ = configs.config5_many_spheres(H, n_spheres=args.n)
    cfg1 = RenderConfig(height=H, width=W, shadows=True, soft_tau=args.tau)
    cfg4 = dataclasses.replace(cfg1, spp=4)
    target = jnp.zeros((H, W, 3), jnp.float32)
    results = {"n_obj": int(scene.spheres.count) + 1, "size": H,
               "tau": args.tau}

    vag1 = lambda s, t: loss_grad_pallas_vec_soft(s, cfg1, t)
    t0 = time.time()
    t1, _, _ = _median_slope(
        lambda n: _vag_total(vag1, scene, target, n), 10, 60, k=3
    )
    log(f"soft spp=1 fused step: {t1*1e3:.3f} ms/step "
        f"[compile+bench {time.time()-t0:.0f}s]")
    results["soft_spp1_step_ms"] = t1 * 1e3

    t0 = time.time()
    t4, _, _ = _median_slope(
        lambda n: _grad_total(
            lambda s: render_pallas_vec_soft(s, cfg4), scene, target, n
        ),
        5, 30, k=3,
    )
    log(f"soft spp=4 value_and_grad over 4-launch wrapper: "
        f"{t4*1e3:.3f} ms/step [compile+bench {time.time()-t0:.0f}s]")
    results["soft_spp4_vag_ms"] = t4 * 1e3
    results["ratio_vs_spp1_step"] = t4 / t1
    print(json.dumps(results))


if __name__ == "__main__":
    main()
