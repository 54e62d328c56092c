"""A/B probe for the texel-cotangent backend (VERDICT r4 #3): the MXU
matmul backward (fused_vec._texmix_mxu, RRT_TEXBWD=mxu) vs the round-4
auto-vjp per-texel reductions (RRT_TEXBWD=vjp), on the real chip.

The backend is selected at import time from RRT_TEXBWD, so each arm runs
in its own process:

    RRT_TEXBWD=vjp python scripts/texbwd_probe.py
    RRT_TEXBWD=mxu python scripts/texbwd_probe.py

Measures the 64-textured-sphere (K=16) 512^2 fused step — the row whose
9.8% VPU SOL is the rooflined gap — plus a fidelity check of the step
grads against XLA value_and_grad of the jnp_vec path (loose 5e-2 group
tolerance: boundary-flip class; the texel leaf must agree much tighter).
Optionally --mode texrefl / spp4tex / k8 for the combo rows.
"""

import argparse
import dataclasses
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
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--mode", choices=["tex", "texrefl", "spp4tex"],
                    default="tex")
    ap.add_argument("--skip-fidelity", action="store_true")
    ap.add_argument("--tex-chunk", type=int, default=None,
                    help="override VecTileConfig.tex_chunk (e.g. 16 to "
                         "disable fine chunk-skip and amplify the texel "
                         "backward term for A/B isolation)")
    args = ap.parse_args()

    from bench import _median_slope, _vag_total
    from reversible_raytracer_tpu.models import configs
    from reversible_raytracer_tpu.ops.kernels import fused_vec
    from reversible_raytracer_tpu.ops.kernels.fused_vec import (
        loss_grad_pallas_vec,
    )
    from reversible_raytracer_tpu.ops.pipeline import RenderConfig
    from reversible_raytracer_tpu.ops.pipeline_vec import render_jnp_vec
    from reversible_raytracer_tpu.ops.render import mse_loss

    backend = jax.default_backend()
    log(f"backend={backend} texel_bwd={fused_vec._TEXEL_BWD} "
        f"mode={args.mode}")

    H = W = args.size
    base, _, _ = configs.config5_many_spheres(H, n_spheres=args.n)
    rng = np.random.default_rng(7)
    tex = jnp.asarray(
        rng.uniform(0.1, 0.9, (base.spheres.count, args.k, args.k, 3)),
        jnp.float32,
    )
    scene = dataclasses.replace(
        base, spheres=dataclasses.replace(base.spheres, texture=tex)
    )
    cfg = RenderConfig(height=H, width=W, shadows=True)
    if args.mode == "texrefl":
        mir = jnp.asarray(
            rng.uniform(0.2, 0.8, (base.spheres.count,)), jnp.float32
        )
        scene = dataclasses.replace(
            scene,
            spheres=dataclasses.replace(
                scene.spheres,
                material=dataclasses.replace(
                    scene.spheres.material, mirror=mir
                ),
            ),
        )
        cfg = dataclasses.replace(cfg, reflections=1)
    elif args.mode == "spp4tex":
        cfg = dataclasses.replace(cfg, spp=4)

    target = jnp.zeros((H, W, 3), jnp.float32)
    results = {"backend": backend, "texel_bwd": fused_vec._TEXEL_BWD,
               "mode": args.mode, "n_obj": int(scene.spheres.count) + 1,
               "k": args.k, "size": H}

    if not args.skip_fidelity:
        small = dataclasses.replace(cfg, height=64, width=128)
        tgt_s = jnp.asarray(
            np.asarray(render_jnp_vec(scene, small))) * 0.92
        t0 = time.time()
        l_k, g_k = jax.jit(
            lambda s, t: loss_grad_pallas_vec(s, small, t)
        )(scene, tgt_s)
        l_k = float(l_k)
        log(f"fidelity step kernel compile+run {time.time()-t0:.1f}s "
            f"loss={l_k:.3e}")
        l_r, g_r = jax.jit(jax.value_and_grad(
            lambda s: mse_loss(render_jnp_vec(s, small), tgt_s)
        ))(scene)
        l_r = float(l_r)
        assert abs(l_k - l_r) <= 1e-4 * max(l_r, 1e-9) + 1e-9, (l_k, l_r)
        tk = np.asarray(g_k.spheres.texture)
        tr = np.asarray(g_r.spheres.texture)
        scale = max(np.abs(tr).max(), 1e-10)
        tex_rel = float(np.abs(tk - tr).max() / scale)
        log(f"fidelity texel-leaf worst rel vs XLA: {tex_rel:.2e}")
        # Loose bound on purpose: this vs-XLA comparison mixes in
        # dense-vs-gather half-texel bands and select flips. The
        # backend-vs-backend isolation (same forward, so those cancel)
        # lives in scripts/texbwd_diff.py; the 512^2 full-scene bound in
        # scripts/vec_textured_tpu_check.py.
        assert tex_rel < 5e-2, tex_rel
        results["texel_grad_worst_rel_vs_xla"] = tex_rel
        results["loss_kernel"] = l_k
        results["loss_vag"] = l_r

    tiles = None
    if args.tex_chunk is not None:
        from reversible_raytracer_tpu.ops.kernels.fused_vec import auto_tiles
        tiles = dataclasses.replace(
            auto_tiles(scene, cfg, None), tex_chunk=args.tex_chunk
        )
        results["tex_chunk"] = args.tex_chunk
    vag = lambda s, t: loss_grad_pallas_vec(s, cfg, t, tiles=tiles)
    t0 = time.time()
    t_step, lo, hi = _median_slope(
        lambda n: _vag_total(vag, scene, target, n), 10, 60, k=3
    )
    log(f"step: {t_step*1e3:.3f} ms/step [{lo*1e3:.3f}..{hi*1e3:.3f}] "
        f"[compile+bench {time.time()-t0:.0f}s]")
    results["step_ms"] = t_step * 1e3
    results["step_ms_spread"] = [lo * 1e3, t_step * 1e3, hi * 1e3]
    print(json.dumps(results))


if __name__ == "__main__":
    main()
