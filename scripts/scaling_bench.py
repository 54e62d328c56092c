#!/usr/bin/env python
"""Rays/s scaling measurement (BASELINE.md row 4) on a fake CPU mesh.

Real multi-chip hardware is not available in this environment (one v5e chip
behind the axon tunnel). The N fake CPU devices SHARE the same host cores,
so per-device speedup cannot appear here by construction; what this script
measures is the *overhead* of the full distributed machinery (shard_map
partitioning + per-band rendering + the gradient-psum collective): with the
global problem fixed, the total step time would stay FLAT from mesh=1 to
mesh=8 if the machinery were free. The reported `overhead_ratio` =
t(mesh=n)/t(mesh=1) quantifies the deviation.

On a real pod slice the identical code runs unchanged (the mesh comes from
jax.devices()); there the per-chip work divides by n and the only extra
cost is one psum of O(scene) floats per step over ICI (~2 us), projecting
>90% strong-scaling efficiency at 8 chips for 512^2 (24 us/chip-step vs
~2 us collective).

Round-4 readings: flat, 0.88-1.08 across the mesh sizes. A transient
mesh=8 regression to ~1.23 (with mesh=1 at 46 ms vs 27) during round 4
was NOT contention: the first flat-update formulation raveled the WHOLE
scene, turning untrainable leaves (camera/lights/...) into loop-carried
slices and defeating XLA's constant folding of them into the render —
fixed by raveling trainable leaves only (optim.make_flat_update
docstring). The AUTHORITATIVE real-silicon machinery number is bench.py's
TPU row: sharded mesh=1 step = 1.008x the bare fused step (xprof:
sharded and unsharded scan bodies both 128.7 us/step).

Usage: python scripts/scaling_bench.py [--size 256] [--iters 60]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=60)
    args = ap.parse_args()

    from reversible_raytracer_tpu.models import configs
    from reversible_raytracer_tpu.optim import OptConfig
    from reversible_raytracer_tpu.ops.pipeline import RenderConfig
    from reversible_raytracer_tpu.ops.render import render_jnp
    from reversible_raytracer_tpu.parallel import make_ray_mesh, optimize_sharded_scan

    scene, spec, _ = configs.config2_four_spheres()
    cfg = RenderConfig(height=args.size, width=args.size, shadows=True)
    target = render_jnp(scene, cfg)
    start = configs.perturb(scene, spec, scale=0.05, seed=7)
    rays = args.size * args.size

    results = {}
    t_base = None
    for n in (1, 2, 4, 8):
        mesh = make_ray_mesh(n)
        ocfg = OptConfig(iters=args.iters, lr=1e-3)
        # Warm (compiles) then measure one full scan dispatch.
        optimize_sharded_scan(start, target, mesh, cfg, spec, ocfg)
        t0 = time.perf_counter()
        _, losses = optimize_sharded_scan(start, target, mesh, cfg, spec, ocfg)
        jax.block_until_ready(losses)
        dt = (time.perf_counter() - t0) / args.iters
        if t_base is None:
            t_base = dt
        overhead = dt / t_base
        results[n] = {"step_ms": dt * 1e3, "rays_per_s": rays / dt,
                      "overhead_ratio": overhead}
        print(f"mesh={n}: {dt*1e3:.2f} ms/step  {rays/dt/1e6:.1f} Mrays/s  "
              f"overhead x{overhead:.2f} vs mesh=1 (flat = free machinery)",
              file=sys.stderr, flush=True)

    print(json.dumps({"platform": "cpu-fake-mesh", "size": args.size, "scaling": results}))


if __name__ == "__main__":
    main()
