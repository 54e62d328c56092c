"""Config-10 (chrome field) evidence run — VERDICT r3 #2.

Round 3 shipped config 10 with a 96^2 CPU metrics.jsonl whose aggregate
param RMS plateaued at 0.148 while the README claimed full mirror+sky
recovery. The unresolved question: is the residual mass UNOBSERVABLE sky
texels (no ray ever samples them, so they carry zero gradient and cannot
move) or a genuine recovery stall? This script answers it with split,
observability-masked metrics from a real TPU inversion at the native
512^2 and commits the visual artifacts:

- mirror-coefficient RMS (all 64 coefficients are observable),
- env-texel RMS over the OBSERVABLE texel set — observability computed
  exactly, as |d sum(image) / d env| > 0 at the truth scene (a texel
  influences the image iff some primary-miss or bounce-miss ray samples
  it; one vjp call with an all-ones cotangent),
- env-texel RMS over the unobservable complement (expected ~unchanged
  from the start: those texels receive zero gradient by construction),
- target/start/final PNGs at the run size into examples/artifacts/config10/.

Output: one JSON line on stdout (redirect to docs/config10_tpu_check.json);
PNGs written as a side effect.

Usage: python scripts/config10_check.py [--size 512] [--iters 300]
       [--perturb 0.2] [--outdir examples/artifacts/config10]
"""

import argparse
import json
import os
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
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--perturb", type=float, default=0.2)
    ap.add_argument("--seed", type=int, default=10)
    ap.add_argument("--lr", type=float, default=2e-2)
    ap.add_argument("--outdir", default="examples/artifacts/config10")
    args = ap.parse_args()

    from reversible_raytracer_tpu.models import configs
    from reversible_raytracer_tpu.optim import OptConfig, optimize_scan
    from reversible_raytracer_tpu.ops.pipeline_vec import render_jnp_vec
    from reversible_raytracer_tpu.ops.render import loss_and_grad_fn, render
    from reversible_raytracer_tpu.utils.imageio import save_png

    log(f"backend={jax.default_backend()}")
    scene, spec, cfg = configs.config10_chrome_field(args.size)
    os.makedirs(args.outdir, exist_ok=True)

    # Observability mask from the truth scene: a texel is observable iff
    # it influences the rendered image at all. d sum(image)/d env is
    # nonzero exactly on the texels some (primary- or bounce-) miss ray
    # bilinearly samples. Computed on the XLA path (differentiating the
    # kernel dispatch is equivalent but slower to compile).
    t0 = time.time()
    g_env = jax.jit(
        jax.grad(lambda s: jnp.sum(render_jnp_vec(s, cfg)))
    )(scene).env
    obs = np.abs(np.asarray(g_env)).max(-1) > 0.0  # (K, K) any-channel
    frac_obs = float(obs.mean())
    log(f"observable env texels: {obs.sum()}/{obs.size} "
        f"({100*frac_obs:.1f}%) [{time.time()-t0:.1f}s]")

    render_fn = jax.jit(lambda s: render(s, cfg))
    target = render_fn(scene)
    save_png(os.path.join(args.outdir, "target.png"), target)

    start = configs.perturb(scene, spec, scale=args.perturb, seed=args.seed)
    save_png(os.path.join(args.outdir, "start.png"), render_fn(start))

    def split_metrics(s):
        mir_rms = float(jnp.sqrt(jnp.mean(
            (s.spheres.material.mirror - scene.spheres.material.mirror) ** 2
        )))
        d2 = np.asarray((s.env - scene.env) ** 2).mean(-1)  # (K, K)
        env_obs = float(np.sqrt(d2[obs].mean())) if obs.any() else 0.0
        env_unobs = (
            float(np.sqrt(d2[~obs].mean())) if (~obs).any() else 0.0
        )
        return mir_rms, env_obs, env_unobs

    m0, e0, u0 = split_metrics(start)
    log(f"start:  mirror_rms={m0:.4f} env_rms_observable={e0:.4f} "
        f"env_rms_unobservable={u0:.4f}")

    vag = loss_and_grad_fn(scene, cfg)
    ocfg = OptConfig(iters=args.iters, lr=args.lr, schedule="cosine")
    t0 = time.time()
    final, losses = optimize_scan(
        start, target, spec, cfg, ocfg, vag_fn=vag,
        cache_key="config10-check", max_chunk=100,
    )
    final_loss = float(np.asarray(losses)[-1])  # value fetch before clock
    wall = time.time() - t0
    m1, e1, u1 = split_metrics(final)
    log(f"final ({args.iters} steps, {wall:.1f}s): loss={final_loss:.3e} "
        f"mirror_rms={m1:.4f} env_rms_observable={e1:.4f} "
        f"env_rms_unobservable={u1:.4f}")
    save_png(os.path.join(args.outdir, "final.png"), render_fn(final))

    print(json.dumps({
        "size": args.size, "iters": args.iters, "perturb": args.perturb,
        "seed": args.seed, "lr": args.lr,
        "backend": jax.default_backend(),
        "env_texels_observable_frac": frac_obs,
        "invert_seconds": wall, "final_loss": final_loss,
        "mirror_rms_start": m0, "mirror_rms_final": m1,
        "env_rms_observable_start": e0, "env_rms_observable_final": e1,
        "env_rms_unobservable_start": u0, "env_rms_unobservable_final": u1,
    }))


if __name__ == "__main__":
    main()
