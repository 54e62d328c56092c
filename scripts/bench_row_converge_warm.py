"""Re-measure bench.py's warm-converge cell and merge it into
bench_details.json.

The sweep's `converge_seconds_warm` is the second optimize_scan call on
the CACHED compiled runner (~0.34 s on v5e); a server-side stall landing
inside that window inflates it by two orders of magnitude (observed
27.9 s in the round-5 sweep — the incl-compile cell right above it was a
normal 9.9 s, so the 27.9 cannot be real device time). Same recipe as
bench.py's converge row: config 2, 400 Adam cosine steps at 512^2.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from reversible_raytracer_tpu.models import configs
    from reversible_raytracer_tpu.ops.pipeline import RenderConfig
    from reversible_raytracer_tpu.ops.render import (
        loss_and_grad_fn,
        render,
    )
    from reversible_raytracer_tpu.optim import (
        OptConfig,
        optimize_scan,
        param_error,
    )

    assert jax.default_backend() == "tpu"
    details = json.load(open("bench_details.json"))

    scene, spec, _ = configs.config2_four_spheres()
    cfg = RenderConfig(height=512, width=512, shadows=True)
    vag = loss_and_grad_fn(scene, cfg)
    tgt = jax.jit(lambda s: render(s, cfg, impl="auto"))(scene)
    # Identical recipe to bench.row_convergence: 5% perturb, seed 7,
    # the fused-step vag, the same runner cache key.
    start = configs.perturb(scene, spec, scale=0.05, seed=7)
    ocfg = OptConfig(iters=400, lr=5e-3, schedule="cosine")
    kw = dict(vag_fn=vag, cache_key="pallas-step")

    t0 = time.perf_counter()
    final, losses = optimize_scan(start, tgt, spec, cfg, ocfg, **kw)
    float(losses[-1])
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    final, losses = optimize_scan(start, tgt, spec, cfg, ocfg, **kw)
    l_last = float(losses[-1])
    t_warm = time.perf_counter() - t0
    err = float(param_error(final, scene, spec))
    log(f"converge 400 steps @512^2: incl-compile {t_cold:.2f}s, "
        f"warm {t_warm:.3f}s, final_loss {l_last:.3e}, rms {err:.4g}")
    assert t_warm < t_cold
    details["converge_seconds_incl_compile"] = t_cold
    details["converge_seconds_warm"] = t_warm
    details["converge_param_rms"] = err
    details["converge_final_loss"] = l_last
    details["converge_warm_source"] = (
        "scripts/bench_row_converge_warm.py re-measure (same HEAD, "
        "same-day): the sweep's 27.9 s warm cell was a server-side stall "
        "inside the timed window, not device time"
    )
    with open("bench_details.json", "w") as fh:
        json.dump(details, fh, indent=1)
        fh.write("\n")
    log("bench_details.json merged")


if __name__ == "__main__":
    main()
