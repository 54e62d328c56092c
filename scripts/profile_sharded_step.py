"""xprof diagnosis of the mesh=1 sharded-step overhead (VERDICT r3 #4).

Round 3 measured the mesh=1 shard_map fused step at 0.91 ms vs the
unsharded optimize_scan step at 0.55 ms and the bare vag at 0.128 ms —
per-chip machinery that would cap N-chip scaling efficiency. This traces
BOTH on-device scan loops (60 iters each) and reports the per-op device
time breakdown so the overhead has a name (relayouts? the optimizer
update? per-step copies?).

Round-4 context: the optimizer update is now the flat-vector form
(optim.make_flat_update) in both loops, so the comparison isolates the
shard_map machinery itself.

Usage: python scripts/profile_sharded_step.py [--outdir /tmp/rrt_shtrace]
Writes docs/xprof_sharded.json.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from profile_step import parse_xplane  # noqa: E402  (scripts/ sibling)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/rrt_shtrace")
    ap.add_argument("--iters", type=int, default=60)
    args = ap.parse_args()

    from reversible_raytracer_tpu.models import configs
    from reversible_raytracer_tpu.optim import OptConfig, optimize_scan
    from reversible_raytracer_tpu.ops.kernels.fused import render_pallas
    from reversible_raytracer_tpu.ops.pipeline import RenderConfig
    from reversible_raytracer_tpu.ops.render import loss_and_grad_fn
    from reversible_raytracer_tpu.parallel import (
        make_ray_mesh,
        optimize_sharded_scan,
    )
    from reversible_raytracer_tpu.utils import profiling

    scene, spec, _ = configs.config2_four_spheres()
    cfg = RenderConfig(height=512, width=512, shadows=True)
    n = args.iters
    ocfg = OptConfig(iters=n, lr=0.0)
    tgt = jax.jit(lambda s: render_pallas(s, cfg))(scene)
    mesh1 = make_ray_mesh(1)
    vag = loss_and_grad_fn(scene, cfg)

    out = {"iters": n}

    def timed(fn, label):
        # Dispatch-INCLUSIVE wall clock of one whole scan (divided by n):
        # at 60 iters the fixed dispatch + ~30 ms tunnel fetch dominate,
        # so this is an upper bound only — the slope-based per-step
        # numbers of record live in bench.py. The per-op TRACE below is
        # what this script is for.
        fn()  # warm/compile
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        out[f"{label}_wall_ms_per_step_dispatch_incl"] = dt / n * 1e3
        print(f"{label}: {dt/n*1e3:.3f} ms/step (dispatch-incl)",
              file=sys.stderr, flush=True)
        return dt

    def run_sharded():
        _, losses = optimize_sharded_scan(
            scene, tgt, mesh1, cfg, spec, ocfg, impl="pallas_step"
        )
        float(np.asarray(losses)[-1])

    def run_unsharded():
        _, losses = optimize_scan(
            scene, tgt, spec, cfg, ocfg, vag_fn=vag, cache_key="prof-step"
        )
        float(np.asarray(losses)[-1])

    timed(run_unsharded, "unsharded_scan")
    timed(run_sharded, "sharded_mesh1_scan")

    for label, fn in (("unsharded", run_unsharded), ("sharded", run_sharded)):
        d = f"{args.outdir}_{label}"
        with profiling.trace(d):
            fn()
        top, err = parse_xplane(d)
        if err:
            out[f"{label}_error"] = err
            continue
        out[f"{label}_per_op_us_per_step_top15"] = {
            k[:100]: round(v / n, 1) for k, v in top
        }
        kernel_us = sum(us for name, us in top if "custom-call" in name) / n
        out[f"{label}_kernel_us_per_step"] = round(kernel_us, 1)

    txt = json.dumps(out, indent=2)
    print(txt)
    with open("docs/xprof_sharded.json", "w") as fh:
        fh.write(txt + "\n")


if __name__ == "__main__":
    main()
