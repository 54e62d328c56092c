"""Env-map backend probe (round 5): does routing the env dense sample
through the custom-vjp backend (RRT_TEXBWD=mxu — residuals (tex,a,b)
only, weights rebuilt in the backward, dT on the MXU) change (a) the env
step's speed, (b) the scoped-vmem K-walls?

The round-4 walls (auto-vjp backend): hard family K=32 needs 8-row
backward tiles (9.50 ms); soft family caps at K<=24 AND 8-row tiles
(16.75 ms), K=32 impossible at ANY tile size (row-count-independent
~16.7M scoped term). The custom backend does NOT carry the 2K hat-weight
planes as residuals across the fwd->bwd interval, which is the
documented live-set multiplier — so the walls may move.

Each arm in its own process (backend read at import):
    RRT_TEXBWD=vjp python scripts/envbwd_probe.py --mode env
    RRT_TEXBWD=mxu python scripts/envbwd_probe.py --mode env
    RRT_TEXBWD=mxu python scripts/envbwd_probe.py --mode softenv --k 32 \
        --bh-bwd 8 --compile-only
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
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--mode", choices=["env", "softenv", "envrefl"],
                    default="env")
    ap.add_argument("--bh-bwd", type=int, default=None)
    ap.add_argument("--compile-only", action="store_true",
                    help="one jitted step call (compile + run), no slope")
    args = ap.parse_args()

    from bench import _median_slope, _vag_total
    from reversible_raytracer_tpu.models import configs
    from reversible_raytracer_tpu.models.scene import Camera
    from reversible_raytracer_tpu.ops.kernels import fused_vec
    from reversible_raytracer_tpu.ops.pipeline import RenderConfig

    log(f"backend={jax.default_backend()} "
        f"texel_bwd={fused_vec._TEXEL_BWD} mode={args.mode} k={args.k} "
        f"bh_bwd={args.bh_bwd}")

    H = W = args.size
    base, _, _ = configs.config5_many_spheres(H, n_spheres=args.n)
    rng = np.random.default_rng(7)
    env = jnp.asarray(
        rng.uniform(0.1, 0.9, (args.k, args.k, 3)), jnp.float32
    )
    cfg = RenderConfig(height=H, width=W, shadows=True)
    if args.mode == "softenv":
        # Horizon camera so miss pixels exist (matches
        # vec_textured_tpu_check's softenv row).
        scene = dataclasses.replace(
            base, env=env,
            camera=Camera.make((0.0, 1.5, 9.5), (0.0, 2.5, 0.0),
                               fov_deg=60.0),
        )
        cfg = dataclasses.replace(cfg, soft_tau=0.05)
        from reversible_raytracer_tpu.ops.kernels.fused_vec_soft import (
            auto_tiles_soft,
            loss_grad_pallas_vec_soft,
        )
        tiles = auto_tiles_soft(scene, None)
        if args.bh_bwd is not None:
            tiles = dataclasses.replace(tiles, bh_bwd=args.bh_bwd)
        step = lambda s, t: loss_grad_pallas_vec_soft(s, cfg, t, tiles=tiles)
    else:
        scene = dataclasses.replace(base, env=env)
        if args.mode == "envrefl":
            mir = jnp.asarray(
                rng.uniform(0.2, 0.8, (base.spheres.count,)), jnp.float32
            )
            scene = dataclasses.replace(
                scene,
                spheres=dataclasses.replace(
                    scene.spheres,
                    material=dataclasses.replace(
                        scene.spheres.material, mirror=mir
                    ),
                ),
            )
            cfg = dataclasses.replace(cfg, reflections=1)
        from reversible_raytracer_tpu.ops.kernels.fused_vec import auto_tiles
        from reversible_raytracer_tpu.ops.kernels.fused_vec import (
            loss_grad_pallas_vec,
        )
        tiles = auto_tiles(scene, cfg, None)
        if args.bh_bwd is not None:
            tiles = dataclasses.replace(tiles, bh_bwd=args.bh_bwd)
        step = lambda s, t: loss_grad_pallas_vec(s, cfg, t, tiles=tiles)

    target = jnp.zeros((H, W, 3), jnp.float32)
    results = {"backend": jax.default_backend(),
               "texel_bwd": fused_vec._TEXEL_BWD, "mode": args.mode,
               "k": args.k, "size": H, "bh_bwd": tiles.bh_bwd}
    t0 = time.time()
    if args.compile_only:
        try:
            l, g = jax.jit(step)(scene, target)
            gn = float(jnp.sqrt(sum(
                jnp.sum(x**2) for x in jax.tree_util.tree_leaves(g)
            )))
            results["compiled"] = True
            results["loss"] = float(l)
            results["gnorm"] = gn
            results["compile_run_s"] = time.time() - t0
            log(f"compiled+ran in {results['compile_run_s']:.0f}s "
                f"loss={float(l):.3e} gnorm={gn:.3e}")
            assert np.isfinite(gn) and gn > 0.0
        except Exception as e:  # noqa: BLE001 — capability probe records
            results["compiled"] = False
            results["error"] = f"{type(e).__name__}: {str(e)[:400]}"
            log(f"compile FAILED after {time.time()-t0:.0f}s: "
                f"{results['error']}")
    else:
        t_step, lo, hi = _median_slope(
            lambda n: _vag_total(step, scene, target, n), 10, 60, k=3
        )
        log(f"step: {t_step*1e3:.3f} ms/step [{lo*1e3:.3f}..{hi*1e3:.3f}] "
            f"[compile+bench {time.time()-t0:.0f}s]")
        results["step_ms"] = t_step * 1e3
    print(json.dumps(results))


if __name__ == "__main__":
    main()
