#!/usr/bin/env python
"""Run one of the benchmark configs end-to-end (see README.md; 6/7/8 are
the mirror-reflection / rect-texture / sphere-texture extension scenes).

Usage: python examples/run_config.py <config#> [extra cli flags...]
"""

import sys

sys.path.insert(0, ".")

from reversible_raytracer_tpu.cli import main  # noqa: E402

if __name__ == "__main__":
    num = sys.argv[1] if len(sys.argv) > 1 else "1"
    extra = sys.argv[2:]
    # Configs 4/5 need their annealed recipes (hard-gradient inversion
    # diverges there — docs/OPTIMIZATION_NOTES.md); supply them unless the
    # caller overrides.
    recipe = []
    # --target (image-only inversion) is incompatible with --anneal (which
    # needs the ground-truth scene) — never inject the recipe then.
    if "--target" in extra:
        pass
    elif num == "4" and "--anneal" not in extra:
        recipe = ["--anneal", "0.08,0.03,0.01,0", "--checker-ratio", "12.5",
                  "--lr", "5e-3"]
    elif num == "5" and "--anneal" not in extra:
        recipe = ["--anneal", "0.08,0.03,0.01,0", "--lr", "2e-3",
                  "--perturb", "0.03"]
    elif num == "6" and "--lr" not in extra:
        # Mirror-coefficient recovery through the bounce (README).
        recipe = ["--lr", "2e-2", "--perturb", "0.3", "--iters", "150"]
    elif num == "7" and "--lr" not in extra:
        # Texture recovery: 768 texel parameters (README).
        recipe = ["--lr", "3e-2", "--perturb", "0.4", "--iters", "200"]
    elif num == "8" and "--lr" not in extra:
        # Globe recovery: visible-hemisphere texels get direct bilinear
        # gradients, same regime as config 7.
        recipe = ["--lr", "3e-2", "--perturb", "0.4", "--iters", "200"]
    elif num == "9" and "--lr" not in extra:
        # Sky recovery: miss pixels + mirror-reflected misses give direct
        # env-texel gradients (README "Environment maps").
        recipe = ["--lr", "3e-2", "--perturb", "0.4", "--iters", "200"]
    main(["invert", "--config", num, "--metrics", f"config{num}_metrics.jsonl",
          "-o", f"config{num}_final.png", *recipe, *extra])
