"""Benchmark harness (SURVEY.md P4, BASELINE.md).

Headline metric (driver contract, printed as ONE JSON line on stdout):
rays/sec/chip for fused forward+backward at 512^2 on the 4-sphere+plane
Phong+shadows scene (driver config 2 geometry at the BASELINE 512^2 size).

``vs_baseline``: the reference (lebek/reversible-raytracer) publishes no
numbers (BASELINE.json: "published": {}), and Theano cannot run here, so the
baseline is the strongest same-hardware alternative: XLA autodiff of the
pure-jnp renderer (what you'd get WITHOUT the hand-fused Pallas kernels).
vs_baseline = pallas_rays_per_sec / jnp_rays_per_sec.

Secondary metrics (stderr + bench_details.json): forward-only throughput,
wall-clock-to-converge for the 4-sphere 512^2 inverse render (BASELINE
target < 30 s), per-size scaling, and device info.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _time_fn(fn, *args, iters=30, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from reversible_raytracer_tpu.models import configs
    from reversible_raytracer_tpu.models.scene import ParamSpec
    from reversible_raytracer_tpu.optim import OptConfig, optimize_scan, param_error
    from reversible_raytracer_tpu.ops.pipeline import RenderConfig
    from reversible_raytracer_tpu.ops.render import mse_loss, render_jnp

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    dev = jax.devices()[0]
    _log(f"backend={backend} device={dev.device_kind} n_devices={len(jax.devices())}")

    H = W = 512
    rays = H * W
    scene, spec, _ = configs.config2_four_spheres()
    cfg = RenderConfig(height=H, width=W, shadows=True)
    target = jnp.zeros((H, W, 3), jnp.float32)

    if on_tpu:
        from reversible_raytracer_tpu.ops.kernels.fused import render_pallas

        render_fast = lambda s: render_pallas(s, cfg)
    else:
        render_fast = lambda s: render_jnp(s, cfg)

    details = {"backend": backend, "device": dev.device_kind, "size": H}

    # --- forward ---
    f_fast = jax.jit(render_fast)
    f_jnp = jax.jit(lambda s: render_jnp(s, cfg))
    t0 = time.perf_counter()
    t_fast_fwd = _time_fn(f_fast, scene)
    _log(f"fused fwd: {t_fast_fwd*1e3:.3f} ms ({rays/t_fast_fwd/1e9:.3f} Grays/s) "
         f"[compile+bench {time.perf_counter()-t0:.0f}s]")
    t_jnp_fwd = _time_fn(f_jnp, scene)
    _log(f"jnp   fwd: {t_jnp_fwd*1e3:.3f} ms ({rays/t_jnp_fwd/1e9:.3f} Grays/s)")
    details["fwd_rays_per_s"] = rays / t_fast_fwd
    details["fwd_rays_per_s_jnp"] = rays / t_jnp_fwd

    # --- forward+backward (the headline) ---
    g_fast = jax.jit(jax.grad(lambda s: mse_loss(render_fast(s), target)))
    g_jnp = jax.jit(jax.grad(lambda s: mse_loss(render_jnp(s, cfg), target)))
    t0 = time.perf_counter()
    t_fast = _time_fn(g_fast, scene)
    _log(f"fused fwd+bwd: {t_fast*1e3:.3f} ms ({rays/t_fast/1e9:.3f} Grays/s) "
         f"[compile+bench {time.perf_counter()-t0:.0f}s]")
    t_jnp = _time_fn(g_jnp, scene)
    _log(f"jnp   fwd+bwd: {t_jnp*1e3:.3f} ms ({rays/t_jnp/1e9:.3f} Grays/s)")
    value = rays / t_fast
    vs_baseline = t_jnp / t_fast
    details["fwdbwd_rays_per_s"] = value
    details["fwdbwd_rays_per_s_jnp"] = rays / t_jnp
    details["vs_xla_jnp_baseline"] = vs_baseline

    # --- wall-clock to converge: 4-sphere 512^2 inverse render ---
    tgt_img = f_fast(scene)
    # Perturbation within the naive-gradient basin: raytracer autodiff has
    # no silhouette-boundary terms (same as the Theano reference), so large
    # geometric perturbations are unrecoverable by ANY first-order method.
    start = configs.perturb(scene, spec, scale=0.05, seed=7)
    # lr: the inverse-rendering objective is stiff (specular highlights,
    # near-discontinuous visibility); >5e-3 at 512^2 can pop out of the
    # basin after converging. Sweep-validated on v5e: cos 5e-3 -> param RMS
    # 0.033 from a 0.045 start, min loss ~1e-3 by iter ~50.
    ocfg = OptConfig(iters=400, lr=5e-3, schedule="cosine")
    t0 = time.perf_counter()
    final, losses = optimize_scan(start, tgt_img, spec, cfg, ocfg, render_fn=render_fast)
    jax.block_until_ready(losses)
    t_total = time.perf_counter() - t0
    err = float(param_error(final, scene, spec))
    _log(f"convergence ({ocfg.iters} Adam steps @512^2 incl. compile): {t_total:.1f}s "
         f"final_loss={float(losses[-1]):.3e} param_rms={err:.4f}")
    details["converge_seconds_400_iters"] = t_total
    details["converge_param_rms"] = err
    details["converge_final_loss"] = float(losses[-1])

    with open("bench_details.json", "w") as fh:
        json.dump(details, fh, indent=2)

    print(json.dumps({
        "metric": "rays_per_sec_per_chip_fwd_bwd_512",
        "value": round(value),
        "unit": "rays/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
