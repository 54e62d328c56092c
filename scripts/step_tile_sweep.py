"""Tile-shape sweep for the UNROLLED fused training-step kernel (TPU).

The headline metric runs `loss_grad_pallas` (loss + grads in one launch)
with TileConfig.for_shape's picks (bh_bwd rows, 128 lanes). The step
kernel's VMEM live set differs from the separate backward kernel it was
derived from (target tiles are resident; no cotangent input tiles), so the
sweep re-validates the row choice — and reports the best row for the
reflective config-6 step too, whose live set is ~2x (bounce replay).

Usage: python scripts/step_tile_sweep.py [--rows 8 16 32 64] [--config6]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, nargs="*", default=[8, 16, 32, 64])
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--config6", action="store_true",
                    help="also sweep the reflective config-6 step")
    args = ap.parse_args()

    import os
    os.environ.setdefault("RRT_BENCH_NO_PROBE", "1")
    from bench import _median_slope, _vag_total
    from reversible_raytracer_tpu.models import configs
    from reversible_raytracer_tpu.ops.kernels.fused import (
        TileConfig,
        loss_grad_pallas,
    )
    from reversible_raytracer_tpu.ops.pipeline import RenderConfig

    assert jax.default_backend() == "tpu", jax.default_backend()
    S = args.size

    def sweep(scene, cfg, label):
        tgt = jnp.zeros((S, S, 3), jnp.float32)
        auto = TileConfig.for_shape(
            S, S,
            (scene.spheres.count + scene.rects.count) * (1 + cfg.reflections),
        )
        log(f"[{label}] auto pick: bh_bwd={auto.bh_bwd}")
        best = (None, float("inf"))
        for rows in args.rows:
            tiles = TileConfig(bh=auto.bh, bw=128, bh_bwd=rows, bw_bwd=128)
            vag = lambda s, t, c=cfg, ti=tiles: loss_grad_pallas(s, c, t, tiles=ti)
            t0 = time.time()
            try:
                t, lo, hi = _median_slope(
                    lambda n: _vag_total(vag, scene, tgt, n), 10, 60, k=3
                )
            except Exception as e:  # noqa: BLE001 — VMEM overflow rows
                log(f"[{label}] rows={rows}: FAILED {type(e).__name__}: "
                    f"{str(e)[:120]}")
                continue
            log(f"[{label}] rows={rows}: {t*1e3:.3f} ms/step "
                f"(spread {lo*1e3:.3f}..{hi*1e3:.3f}) "
                f"[compile+bench {time.time()-t0:.0f}s]")
            if t < best[1]:
                best = (rows, t)
        log(f"[{label}] BEST rows={best[0]} {best[1]*1e3:.3f} ms/step")
        return best

    scene, _, _ = configs.config2_four_spheres()
    cfg = RenderConfig(height=S, width=S, shadows=True)
    sweep(scene, cfg, "config2")

    if args.config6:
        scene6, _, cfg6 = configs.config6_mirror(S)
        sweep(scene6, cfg6, "config6-reflect")


if __name__ == "__main__":
    main()
