"""Tile-shape sweep for the object-chunked kernels (TPU).

The two-phase trace's per-object cost has a scalar part (SMEM reads of the
object rows, paid once per TILE per object) and a vector part (paid per
pixel). Bigger tiles amortize the scalar part over more pixels at the cost
of VMEM pressure / pipelining depth. This sweeps VecTileConfig shapes for
the forward and fwd+bwd at config-5 scale and prints a table.

Usage: python scripts/vec_tile_sweep.py [--n 512] [--size 512]
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
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--grad", action="store_true", help="also sweep fwd+bwd")
    args = ap.parse_args()

    from bench import _scan_steps_fwd, _scan_steps_grad
    from reversible_raytracer_tpu.models import configs
    from reversible_raytracer_tpu.ops.kernels.fused_vec import (
        VecTileConfig,
        render_pallas_vec,
    )
    from reversible_raytracer_tpu.ops.pipeline import RenderConfig
    from reversible_raytracer_tpu.ops.render import mse_loss

    H = W = args.size
    scene, _, _ = configs.config5_many_spheres(H, n_spheres=args.n)
    cfg = RenderConfig(height=H, width=W, shadows=True)
    log(f"{scene.spheres.count + scene.rects.count} objects at {H}x{W}")

    fwd_shapes = [(128, 128), (256, 128), (128, 256), (256, 256), (512, 128)]
    for bh, bw in fwd_shapes:
        tiles = VecTileConfig(bh=bh, bw=bw)
        t0 = time.time()
        try:
            t = _scan_steps_fwd(
                lambda s: render_pallas_vec(s, cfg, tiles=tiles), scene, 20, 120
            )
        except Exception as e:  # noqa: BLE001 — report compile failures and move on
            log(f"fwd  bh={bh:4d} bw={bw:4d}: FAILED {type(e).__name__}: {str(e)[:120]}")
            continue
        log(f"fwd  bh={bh:4d} bw={bw:4d}: {t*1e3:6.2f} ms  [compile+bench {time.time()-t0:.0f}s]")

    if args.grad:
        target = jnp.zeros((H, W, 3), jnp.float32)
        for bhb, bwb in [(64, 128), (128, 128), (64, 256), (128, 256)]:
            tiles = VecTileConfig(bh_bwd=bhb, bw_bwd=bwb)
            t0 = time.time()
            try:
                t = _scan_steps_grad(
                    lambda s: render_pallas_vec(s, cfg, tiles=tiles),
                    scene, target, 10, 60,
                )
            except Exception as e:  # noqa: BLE001
                log(f"grad bh={bhb:4d} bw={bwb:4d}: FAILED {type(e).__name__}: {str(e)[:120]}")
                continue
            log(f"grad bh={bhb:4d} bw={bwb:4d}: {t*1e3:6.2f} ms  [compile+bench {time.time()-t0:.0f}s]")


if __name__ == "__main__":
    main()
