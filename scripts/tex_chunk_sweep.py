"""Sweep VecTileConfig.tex_chunk on TPU (round 4, VERDICT r3 #3).

The textured vec step's cost is dominated by the dense K^2-MAC texel
sampling that runs for EVERY member of a live chunk (forward resolve) and
the K^2 per-texel masked tile reductions per member (backward vjp), even
when a single object wins the tile's pixels. Finer chunks skip more of
that work at the price of one lax.cond sync per chunk. This sweep
measures the 64-textured-sphere (K=16) 512^2 fused step at each divisor
of CHUNK; auto_tiles pins the winner.

Usage: python scripts/tex_chunk_sweep.py [--n 64] [--size 512] [--k 16]
       [--chunks 16 8 4 2 1]
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
    ap.add_argument("--chunks", type=int, nargs="*", default=[16, 8, 4, 2, 1])
    ap.add_argument("--refl", action="store_true",
                    help="also sweep the textured+reflective combo")
    args = ap.parse_args()

    from bench import _scan_steps_vag
    from reversible_raytracer_tpu.models import configs
    from reversible_raytracer_tpu.ops.kernels.fused_vec import (
        VecTileConfig,
        auto_tiles,
        loss_grad_pallas_vec,
    )
    from reversible_raytracer_tpu.ops.pipeline import RenderConfig

    log(f"backend={jax.default_backend()}")
    H = W = args.size
    base, _, _ = configs.config5_many_spheres(H, n_spheres=args.n)
    cfg = RenderConfig(height=H, width=W, shadows=True)
    rng = np.random.default_rng(7)
    tex = jnp.asarray(
        rng.uniform(0.1, 0.9, (base.spheres.count, args.k, args.k, 3)),
        jnp.float32,
    )
    scene = dataclasses.replace(
        base, spheres=dataclasses.replace(base.spheres, texture=tex)
    )
    target = jnp.zeros((H, W, 3), jnp.float32)

    combos = [("tex", scene, cfg)]
    if args.refl:
        mir = jnp.asarray(
            rng.uniform(0.2, 0.8, (base.spheres.count,)), jnp.float32
        )
        refl = dataclasses.replace(
            scene,
            spheres=dataclasses.replace(
                scene.spheres,
                material=dataclasses.replace(
                    scene.spheres.material, mirror=mir
                ),
            ),
        )
        combos.append(
            ("texrefl", refl, dataclasses.replace(cfg, reflections=1))
        )

    results = {"n": args.n, "size": H, "k": args.k}
    for tag, sc, cf in combos:
        base_tiles = auto_tiles(sc, cf, None)  # swept bh_bwd etc.
        for c in args.chunks:
            tiles = dataclasses.replace(base_tiles, tex_chunk=c)
            vag = lambda s, t: loss_grad_pallas_vec(s, cf, t, tiles=tiles)
            t0 = time.time()
            try:
                t_step = _scan_steps_vag(vag, sc, target, 10, 60)
            except Exception as e:  # noqa: BLE001 — sweep row best-effort
                log(f"[{tag}] tex_chunk={c}: FAILED "
                    f"({type(e).__name__}: {str(e)[:200]})")
                results[f"{tag}_chunk{c}_ms"] = None
                continue
            log(f"[{tag}] tex_chunk={c}: {t_step*1e3:.2f} ms/step "
                f"[compile+bench {time.time()-t0:.0f}s]")
            results[f"{tag}_chunk{c}_ms"] = t_step * 1e3

    print(json.dumps(results))


if __name__ == "__main__":
    main()
