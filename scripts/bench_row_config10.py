"""Run ONLY bench.py's config-10 row and merge it into bench_details.json.

Follow-up for a full sweep whose wall-clock budget expired at the last
row (the budget skip is loud — `skipped_rows` records it — but the
flagship config must not be missing from the one-file perf record).
Reuses bench.py's helpers so the methodology is identical; on success it
rewrites bench_details.json with the config10_* fields, drops the
config10 entry from skipped_rows, and stamps the follow-up provenance.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from bench import _median_slope, _vag_total
    from reversible_raytracer_tpu.models import configs
    from reversible_raytracer_tpu.optim import param_error
    from reversible_raytracer_tpu.ops.kernels.fused_vec import (
        render_pallas_vec,
    )
    from reversible_raytracer_tpu.ops.pipeline_vec import render_jnp_vec
    from reversible_raytracer_tpu.ops.render import loss_and_grad_fn
    from reversible_raytracer_tpu.optim import OptConfig, optimize_scan

    assert jax.default_backend() == "tpu", "config-10 row is TPU-only"
    details = json.load(open("bench_details.json"))

    scene10, spec10, cfg10 = configs.config10_chrome_field(512)
    vag10 = loss_and_grad_fn(scene10, cfg10)
    tgt10 = jnp.zeros((512, 512, 3), jnp.float32)
    t0 = time.perf_counter()
    t10, _, _ = _median_slope(
        lambda n: _vag_total(vag10, scene10, tgt10, n), 10, 60, k=3
    )
    log(f"config-10 chrome field (vec step, reflections=1, env) 512^2: "
        f"{t10*1e3:.2f} ms/step [compile+bench {time.perf_counter()-t0:.0f}s]")
    details["config10_fwdbwd_ms"] = t10 * 1e3

    tgt10r = jax.jit(lambda s: render_pallas_vec(s, cfg10))(scene10)
    start10 = configs.perturb(scene10, spec10, scale=0.2, seed=10)
    ocfg10 = OptConfig(iters=300, lr=2e-2, schedule="cosine")
    t0 = time.perf_counter()
    final10, losses10 = optimize_scan(
        start10, tgt10r, spec10, cfg10, ocfg10,
        vag_fn=vag10, cache_key="bench-config10-step",
    )
    l10 = float(losses10[-1])  # value fetch before reading the clock
    t10w = time.perf_counter() - t0
    rms10 = float(param_error(final10, scene10, spec10))

    g_env10 = jax.jit(
        jax.grad(lambda s: jnp.sum(render_jnp_vec(s, cfg10)))
    )(scene10).env
    obs10 = np.abs(np.asarray(g_env10)).max(-1) > 0.0
    d2_10 = np.asarray((final10.env - scene10.env) ** 2).mean(-1)
    env_obs10 = float(np.sqrt(d2_10[obs10].mean())) if obs10.any() else 0.0
    env_unobs10 = (
        float(np.sqrt(d2_10[~obs10].mean())) if (~obs10).any() else 0.0
    )
    mir10 = float(jnp.sqrt(jnp.mean(
        (final10.spheres.material.mirror
         - scene10.spheres.material.mirror) ** 2
    )))
    log(f"config-10 chrome inversion @512^2 (300 steps, 20% perturb): "
        f"{t10w:.1f}s  final_loss={l10:.3e} param_rms={rms10:.3e}  "
        f"mirror_rms={mir10:.2e} env_rms obs={env_obs10:.3e} "
        f"unobs={env_unobs10:.3e} (obs frac {obs10.mean():.2f})")
    details["config10_invert_seconds"] = t10w
    details["config10_invert_param_rms"] = rms10
    details["config10_invert_final_loss"] = l10
    details["config10_mirror_rms"] = mir10
    details["config10_env_rms_observable"] = env_obs10
    details["config10_env_rms_unobservable"] = env_unobs10
    details["config10_env_observable_frac"] = float(obs10.mean())
    details["skipped_rows"] = [
        s for s in details.get("skipped_rows", [])
        if not (isinstance(s, dict) and s.get("row") == "config10")
    ]
    details["config10_row_source"] = (
        "scripts/bench_row_config10.py follow-up (same HEAD, same-day): "
        "the sweep's wall-clock budget expired at this row"
    )
    with open("bench_details.json", "w") as fh:
        json.dump(details, fh, indent=1)
        fh.write("\n")
    log("bench_details.json merged")


if __name__ == "__main__":
    main()
