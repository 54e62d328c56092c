"""Compiled-TPU check + perf for the object-chunked kernels (fused_vec).

Validates on the real chip what the interpret-mode tests validate on CPU:
forward fidelity vs render_jnp_vec at config-5 scale, gradient finiteness,
and the round-2 perf target (VERDICT item #1): 513-object 512^2 fwd+bwd
at least 5x faster than the jnp_vec XLA path (~88 ms/step in round 1).

Usage: python scripts/vec_tpu_check.py [--n 512] [--size 512] [--skip-jnp]
"""

import argparse
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
    ap.add_argument("--n", type=int, default=512, help="sphere count")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--skip-jnp", action="store_true")
    ap.add_argument("--fwd-only", action="store_true")
    args = ap.parse_args()

    from bench import _scan_steps_fwd, _scan_steps_grad
    from reversible_raytracer_tpu.models import configs
    from reversible_raytracer_tpu.ops.kernels.fused_vec import render_pallas_vec
    from reversible_raytracer_tpu.ops.pipeline import RenderConfig
    from reversible_raytracer_tpu.ops.pipeline_vec import render_jnp_vec

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    H = W = args.size
    rays = H * W
    scene, spec, _ = configs.config5_many_spheres(H, n_spheres=args.n)
    n_obj = scene.spheres.count + scene.rects.count
    cfg = RenderConfig(height=H, width=W, shadows=True)
    log(f"scene: {n_obj} objects at {H}x{W}")

    # ---- compile + fidelity ----
    t0 = time.time()
    img_p = np.asarray(jax.jit(lambda s: render_pallas_vec(s, cfg))(scene))
    log(f"pallas_vec fwd compile+run: {time.time()-t0:.1f}s")
    t0 = time.time()
    img_v = np.asarray(jax.jit(lambda s: render_jnp_vec(s, cfg))(scene))
    log(f"jnp_vec    fwd compile+run: {time.time()-t0:.1f}s")
    d = np.abs(img_p - img_v)
    flipped = (d.max(-1) > 1e-3).mean()
    log(f"fwd fidelity: max {d.max():.2e} mean {d.mean():.2e} "
        f"flipped-frac {flipped:.2e}")
    assert flipped < 2e-2, "too many disagreeing pixels"

    target = jnp.asarray(img_v)

    from reversible_raytracer_tpu.ops.render import mse_loss

    if not args.fwd_only:
        t0 = time.time()
        g = jax.jit(jax.grad(lambda s: mse_loss(render_pallas_vec(s, cfg), target)))(scene)
        leaves = jax.tree_util.tree_leaves(g)
        finite = all(bool(jnp.all(jnp.isfinite(l))) for l in leaves if l.size)
        log(f"pallas_vec grad compile+run: {time.time()-t0:.1f}s finite={finite}")
        assert finite

    # ---- perf (two-point scan slope; see bench.py docstring) ----
    t_fwd_p = _scan_steps_fwd(lambda s: render_pallas_vec(s, cfg), scene, 20, 120)
    log(f"pallas_vec fwd: {t_fwd_p*1e3:.2f} ms/step ({rays/t_fwd_p/1e9:.3f} Grays/s)")
    results = {"fwd_ms_pallas_vec": t_fwd_p * 1e3}
    if not args.fwd_only:
        t_g_p = _scan_steps_grad(lambda s: render_pallas_vec(s, cfg), scene, target, 10, 60)
        log(f"pallas_vec fwd+bwd: {t_g_p*1e3:.2f} ms/step ({rays/t_g_p/1e9:.3f} Grays/s)")
        results["fwdbwd_ms_pallas_vec"] = t_g_p * 1e3
    if not args.skip_jnp:
        t_fwd_v = _scan_steps_fwd(lambda s: render_jnp_vec(s, cfg), scene, 5, 30)
        log(f"jnp_vec    fwd: {t_fwd_v*1e3:.2f} ms/step")
        results["fwd_ms_jnp_vec"] = t_fwd_v * 1e3
        if not args.fwd_only:
            t_g_v = _scan_steps_grad(lambda s: render_jnp_vec(s, cfg), scene, target, 3, 18)
            log(f"jnp_vec    fwd+bwd: {t_g_v*1e3:.2f} ms/step "
                f"-> speedup {t_g_v/t_g_p:.2f}x")
            results["fwdbwd_ms_jnp_vec"] = t_g_v * 1e3
            results["speedup_fwdbwd"] = t_g_v / t_g_p
    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
