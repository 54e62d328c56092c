#!/usr/bin/env python
"""Produce the reference-style visual-verification artifacts for configs 1-10
in one command (VERDICT round-1 item #9): for each config, render

    examples/artifacts/config<N>/target.png   — ground-truth render
    examples/artifacts/config<N>/start.png    — perturbed starting scene
    examples/artifacts/config<N>/final.png    — after inverse rendering
    examples/artifacts/config<N>/convergence.gif — configs 1-4 (config 5's
        1024^2 frames would bloat the repo; it ships metrics.jsonl instead)

The reference (lebek/reversible-raytracer) verified its optimizer visually
via per-iteration PNG dumps assembled into GIFs (SURVEY.md §4 "de-facto
verification was visual"); this is that workflow's counterpart.

Usage:
    python examples/make_artifacts.py                 # all of configs 1-4
    python examples/make_artifacts.py --configs 1 2   # subset
    python examples/make_artifacts.py --size 64       # override resolution
(CPU note: config sizes scale to 64-128 by default off-TPU to stay fast.)
"""

import argparse
import os
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=int, nargs="*",
                    default=[1, 2, 3, 4, 5, 6, 7, 8, 9, 10])
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--outdir", default="examples/artifacts")
    args = ap.parse_args()

    import jax

    from reversible_raytracer_tpu.cli import main as cli

    on_tpu = jax.default_backend() == "tpu"
    # Small-but-recognizable defaults off-TPU; native config sizes on TPU
    # EXCEPT config 5, whose artifacts render at 512^2 (VERDICT r4 #8: at
    # native 1024^2 the PNGs bloated the repo and round 4 shipped the
    # flagship config with no visual at all — 512^2 keeps the
    # target/start/final evidence committed like every other config; the
    # native-size perf rows live in bench_details.json).
    size_default = ({1: 64, 2: 128, 3: 128, 4: 128, 5: 96, 6: 128, 7: 128, 8: 128, 9: 128, 10: 96}
                    if not on_tpu else {5: 512})
    iters = args.iters or (400 if on_tpu else 120)

    for num in args.configs:
        out = os.path.join(args.outdir, f"config{num}")
        frames = os.path.join(out, "frames")
        os.makedirs(frames, exist_ok=True)
        size = args.size or size_default.get(num)
        size_args = ["--size", str(size)] if size else []

        cli(["render", "--config", str(num), *size_args,
             "-o", os.path.join(out, "target.png")])
        # start.png: zero-iteration "inversion" renders the perturbed scene.
        # The perturbation MUST match the full-inversion call below (same
        # seed + scale) or start.png depicts a different starting scene:
        # config 5 passes 0.03 in both; configs 1-4 use the CLI default in
        # both.
        # Perturb scales must match the full-inversion call below.
        start_perturb = (["--perturb", "0.03"] if num == 5
                         else ["--perturb", "0.3"] if num == 6
                         else ["--perturb", "0.4"] if num in (7, 8, 9)
                         else ["--perturb", "0.25"] if num == 10 else [])
        cli(["invert", "--config", str(num), *size_args, "--iters", "1",
             "--lr", "0", "--log-every", "0", *start_perturb,
             "-o", os.path.join(out, "start.png")])
        if num == 5:
            # The flagship joint inversion runs the soft-visibility anneal
            # (docs/OPTIMIZATION_NOTES.md recipe; on-device scan stages, so
            # no per-iteration frames/GIF — target/start/final + metrics).
            anneal = (["--anneal", "0.08,0.03,0.01,0", "--anneal-size", "512"]
                      if on_tpu else ["--anneal", "0.08,0.03,0"])
            n_it = args.iters or (300 if on_tpu else 120)
            cli(["invert", "--config", "5", *size_args,
                 "--iters", str(n_it), "--lr", "2e-3", "--perturb", "0.03",
                 *anneal,
                 "--metrics", os.path.join(out, "metrics.jsonl"),
                 "-o", os.path.join(out, "final.png")])
        elif num == 10:
            # Chrome field (round 3): joint mirror+env recovery at vec
            # scale — on TPU the whole step is ONE object-chunked fused
            # kernel launch (env + reflections in the vec family).
            n_it = args.iters or (200 if on_tpu else 100)
            cli(["invert", "--config", "10", *size_args,
                 "--iters", str(n_it), "--lr", "2e-2", "--perturb", "0.25",
                 "--log-every", str(max(n_it // 10, 1)),
                 "--metrics", os.path.join(out, "metrics.jsonl"),
                 "-o", os.path.join(out, "final.png")])
        elif num in (7, 8, 9):
            # Texture recovery: optimize the texel grid itself (768 params)
            # from a 40% perturbation — config 7 the floor's grid, config 8
            # the globe's lat-long grid, config 9 the sky env map (via miss
            # pixels + mirror-reflected misses). Observable texels recover;
            # unobserved ones have no signal (README).
            n_it = args.iters or (200 if on_tpu else 150)
            cli(["invert", "--config", str(num), *size_args,
                 "--iters", str(n_it), "--lr", "3e-2", "--perturb", "0.4",
                 "--log-every", str(max(n_it // 10, 1)),
                 "--frame-every", str(max(n_it // 10, 1)),
                 "--frames-dir", frames,
                 "--gif", os.path.join(out, "convergence.gif"),
                 "--metrics", os.path.join(out, "metrics.jsonl"),
                 "-o", os.path.join(out, "final.png")])
        elif num == 6:
            # Mirror reflections: recover every object's mirror coefficient
            # THROUGH the bounce from a 30% perturbation (the blend weight
            # has global gradient support — converges from far outside the
            # geometric basins; README "Mirror reflections").
            n_it = args.iters or (150 if on_tpu else 120)
            cli(["invert", "--config", "6", *size_args,
                 "--iters", str(n_it), "--lr", "2e-2", "--perturb", "0.3",
                 "--log-every", str(max(n_it // 10, 1)),
                 "--frame-every", str(max(n_it // 10, 1)),
                 "--frames-dir", frames,
                 "--gif", os.path.join(out, "convergence.gif"),
                 "--metrics", os.path.join(out, "metrics.jsonl"),
                 "-o", os.path.join(out, "final.png")])
        elif num == 4:
            # Camera pose + colors against checkered materials: the hard
            # checker gives camera pose zero texture gradient (plain Adam
            # DIVERGES — docs/OPTIMIZATION_NOTES.md), so config 4 anneals
            # the soft checker alongside soft visibility
            # (--checker-ratio; RenderConfig.checker_tau).
            n_it = args.iters or (150 if on_tpu else 100)
            cli(["invert", "--config", "4", *size_args,
                 "--iters", str(n_it), "--lr", "5e-3",
                 "--anneal", "0.08,0.03,0.01,0", "--checker-ratio", "12.5",
                 "--frame-every", str(max(n_it // 10, 1)),
                 "--frames-dir", frames,
                 "--gif", os.path.join(out, "convergence.gif"),
                 "--metrics", os.path.join(out, "metrics.jsonl"),
                 "-o", os.path.join(out, "final.png")])
        else:
            # lr 5e-3: the sweep-validated ceiling at native 512^2 sizes
            # (bench.py convergence recipe) — the CLI default 1e-2 diverges
            # on configs 2/4 at full resolution (observed on v5e).
            cli(["invert", "--config", str(num), *size_args,
                 "--iters", str(iters), "--lr", "5e-3",
                 "--log-every", str(max(iters // 10, 1)),
                 "--metrics", os.path.join(out, "metrics.jsonl"),
                 "--frame-every", str(max(iters // 40, 1)),
                 "--frames-dir", frames,
                 "--gif", os.path.join(out, "convergence.gif"),
                 "-o", os.path.join(out, "final.png")])
        print(f"config {num}: artifacts in {out}/")


if __name__ == "__main__":
    main()
