#!/usr/bin/env python
"""Run one of the five driver benchmark configs end-to-end (see README.md).

Usage: python examples/run_config.py <config#> [extra cli flags...]
"""

import sys

sys.path.insert(0, ".")

from reversible_raytracer_tpu.cli import main  # noqa: E402

if __name__ == "__main__":
    num = sys.argv[1] if len(sys.argv) > 1 else "1"
    extra = sys.argv[2:]
    main(["invert", "--config", num, "--metrics", f"config{num}_metrics.jsonl",
          "-o", f"config{num}_final.png", *extra])
