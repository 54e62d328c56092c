"""Structure-aware restart proposals vs the documented topology-stall set
(round 4, VERDICT r3 #7).

OPTIMIZATION_NOTES "Multi-start widens the basins" left one hole: the
config-2 0.45/seed-2 start resists 8 i.i.d.-jitter restarts at every
jitter tried. Topology stalls are sphere identity/ordering errors, so
this script measures proposals that match that failure mode (pairwise
identity swaps, per-sphere re-jitter — optim.propose_restart) against
plain jitter on the SAME stall set and settings, and prints the table
that goes into OPTIMIZATION_NOTES.

CPU-friendly (48^2, the scale of the original measurements).

Usage: python scripts/multistart_proposals.py [--iters 150]
       [--stalls 0.45:2 0.30:2 0.60:1] [--proposals jitter swap per_sphere mixed]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=48)
    ap.add_argument("--iters", type=int, default=150)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--restarts", type=int, default=8)
    ap.add_argument("--jitter", type=float, default=0.15)
    ap.add_argument("--stalls", nargs="*", default=["0.45:2", "0.30:2", "0.60:1"])
    ap.add_argument("--proposals", nargs="*",
                    default=["jitter", "swap", "per_sphere", "mixed"])
    args = ap.parse_args()

    from reversible_raytracer_tpu.models import configs
    from reversible_raytracer_tpu.optim import (
        OptConfig,
        optimize_multistart,
        param_error,
    )
    from reversible_raytracer_tpu.ops.pipeline import RenderConfig
    from reversible_raytracer_tpu.ops.pipeline_vec import render_jnp_vec

    S = args.size
    scene, spec, _ = configs.config2_four_spheres(S)
    cfg = RenderConfig(height=S, width=S, shadows=True)
    target = render_jnp_vec(scene, cfg)
    ocfg = OptConfig(iters=args.iters, lr=args.lr, schedule="cosine")

    results = {"size": S, "iters": args.iters, "lr": args.lr,
               "restarts": args.restarts, "jitter": args.jitter}
    for stall in args.stalls:
        scale_s, seed_s = stall.split(":")
        scale, seed = float(scale_s), int(seed_s)
        start = configs.perturb(scene, spec, scale=scale, seed=seed)
        rms0 = float(param_error(start, scene, spec))
        log(f"--- stall {scale}/seed{seed}: start RMS {rms0:.3f}")
        for prop in args.proposals:
            t0 = time.time()
            # "<name>_chain" measures the chained (sequential-repair) mode
            # of optimize_multistart: propose from the best-so-far scene.
            chain = prop.endswith("_chain")
            inner = prop[:-6] if chain else prop
            best, best_loss, finals = optimize_multistart(
                start, target, spec, cfg, ocfg,
                restarts=args.restarts, jitter=args.jitter, seed=100,
                proposal=inner, chain=chain,
                taus=(0.08, 0.03, 0.0), target_scene=scene,
            )
            rms = float(param_error(best, scene, spec))
            win = int(np.argmin(finals))
            log(f"[{scale}/s{seed}] {prop:11s}: best loss {best_loss:.3e} "
                f"RMS {rms0:.3f} -> {rms:.4f} (restart #{win}; "
                f"finals {['%.1e' % f for f in finals]}) "
                f"[{time.time()-t0:.0f}s]")
            key = f"{scale}_s{seed}_{prop}"
            results[key] = {"best_loss": best_loss, "rms": rms,
                            "winner": win,
                            "finals": [float(f) for f in finals]}

    print(json.dumps(results))


if __name__ == "__main__":
    main()
