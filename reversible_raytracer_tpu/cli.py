"""Command-line interface (SURVEY.md L6: the reference's demo scripts,
upgraded to a real CLI with `render` / `invert` / `bench` subcommands).

Examples:
    python -m reversible_raytracer_tpu.cli render --config 2 --size 256 -o out.png
    python -m reversible_raytracer_tpu.cli invert --config 1 --iters 400 \\
        --frames-dir frames/ --metrics metrics.jsonl
    python -m reversible_raytracer_tpu.cli invert --config 2 --sharded
    python -m reversible_raytracer_tpu.cli bench
"""

from __future__ import annotations

import argparse
import sys
import time


def _add_common(p):
    p.add_argument("--config", type=int, default=2,
                   choices=[1, 2, 3, 4, 5, 6, 7, 8, 9, 10],
                   help="driver benchmark config number (BASELINE.json); "
                        "extensions: 6 = mirror reflections, 7 = rect-"
                        "texture recovery, 8 = sphere-texture (globe) "
                        "recovery, 9 = environment-map (sky) recovery, 10 = chrome "
                        "field (64 mirrored spheres under a sky: joint "
                        "mirror+env recovery at vec scale)")
    p.add_argument("--size", type=int, default=None,
                   help="image size (default: the config's native size)")
    p.add_argument("--impl",
                   choices=["auto", "jnp", "jnp_vec", "pallas", "pallas_vec",
                            "pallas_vec_soft", "pallas_step"],
                   default="auto",
                   help="render implementation (auto: Pallas on TPU; jnp_vec: "
                        "object-vectorized, O(1) compile for huge object "
                        "counts; pallas_step: force the fused loss+grad "
                        "training-step kernel for `invert`)")
    p.add_argument("--scene", type=str, default=None,
                   help="JSON scene file overriding the config's parameters")
    p.add_argument("--spp", type=int, default=1, choices=[1, 4],
                   help="samples per pixel (4 = 2x2 supersampling AA)")
    p.add_argument("--reflections", type=int, default=None,
                   help="mirror bounces (scene materials' `mirror` field "
                        "sets per-object reflectivity; 0 = reference "
                        "semantics). Default: the config's own setting "
                        "(config 6 defaults to 1 — pass 0 to disable). "
                        "Unrolled family + jnp_vec only.")


def _build(args):
    from .models import configs as cfgs
    from .ops.pipeline import RenderConfig

    builder = cfgs.CONFIGS[args.config]
    scene, spec, cfg = builder(args.size) if args.size else builder()
    if args.scene:
        from .utils.sceneio import load_scene

        scene = load_scene(args.scene, scene)
    if getattr(args, "spp", 1) != 1:
        import dataclasses

        cfg = dataclasses.replace(cfg, spp=args.spp)
    if getattr(args, "reflections", None) is not None:
        import dataclasses

        cfg = dataclasses.replace(cfg, reflections=args.reflections)
    return scene, spec, cfg


def _render_fn(scene, cfg, impl):
    """Resolve the render implementation and return (callable, impl name).

    Delegates to `ops.render.resolve_impl` — the ONE tested dispatch
    policy. (Round 2 shipped a private re-implementation here that went
    stale: textured scenes were routed to the jnp paths unconditionally,
    so `cli invert --config 7` ran the ~60 ms/step XLA fallback instead
    of the 0.5 ms fused step kernel. tests/test_cli_and_io.py now pins
    CLI impl == resolve_impl for every config.)
    """
    from .ops.render import render, resolve_impl

    if impl in ("auto", "pallas_step"):
        # "pallas_step" names the fused TRAINING-step kernel, not a render
        # impl — images (targets/frames) use the auto-resolved renderer.
        impl = resolve_impl(scene, cfg)
    return (lambda s: render(s, cfg, impl)), impl


def cmd_render(args):
    import dataclasses

    import jax

    from .utils.imageio import save_png

    scene, _, cfg = _build(args)
    if getattr(args, "shader", "phong") != "phong":
        cfg = dataclasses.replace(cfg, shader=args.shader)
    render, impl = _render_fn(scene, cfg, args.impl)
    t0 = time.perf_counter()
    img = jax.jit(render)(scene)
    jax.block_until_ready(img)
    print(f"[{impl}] rendered {cfg.height}x{cfg.width} in {time.perf_counter()-t0:.2f}s "
          f"(incl. compile)", file=sys.stderr)
    save_png(args.output, img)
    print(args.output)


def cmd_invert(args):
    import jax

    from .models.configs import perturb
    from .optim import OptConfig, optimize, param_error
    from .utils.metrics import MetricsLogger

    if args.coordinator or (args.num_processes or 0) > 1:
        from .parallel import initialize

        initialize(args.coordinator, args.num_processes, args.process_id)

    scene, spec, cfg = _build(args)
    if getattr(args, "anneal", None) and args.impl == "auto":
        # The annealed stages run through the fused STEP kernels (no
        # forward kernel traces at all), so an auto-dispatched pallas_vec
        # target render would pay a multi-minute Mosaic compile for
        # exactly two images (target + final.png). jnp_vec renders them in
        # ~100 ms with a fast XLA compile on every backend.
        args.impl = "jnp_vec"
    render, impl = _render_fn(scene, cfg, args.impl)

    if args.paranoid:
        from .utils.paranoid import checked_render, enable_nan_debugging

        enable_nan_debugging(True)
        err, _ = checked_render(scene, cfg)
        err.throw()

    if args.target:
        from .utils.imageio import load_png

        target = load_png(args.target)
        assert target.shape[:2] == (cfg.height, cfg.width), (
            f"target {target.shape} != render {cfg.shape}")
        truth = None
    else:
        target = jax.jit(render)(scene)
        truth = scene

    start = perturb(scene, spec, scale=args.perturb, seed=args.seed)
    ocfg = OptConfig(iters=args.iters, lr=args.lr, loss=args.loss, schedule=args.schedule)
    logger = MetricsLogger(jsonl_path=args.metrics, echo=not args.quiet)

    if args.anneal:
        from .optim import optimize_annealed

        assert truth is not None, "--anneal needs the ground-truth scene (no --target)"
        try:
            taus = tuple(float(x) for x in args.anneal.split(","))
        except ValueError:
            sys.exit(f"error: --anneal expects comma-separated floats "
                     f"(e.g. '0.08,0.03,0'), got {args.anneal!r}")
        frame_cb = None
        max_chunk = 100
        if args.frame_every and args.frames_dir:
            # Convergence frames at scan-chunk granularity: chunks shrink
            # to the frame cadence; frames render the CURRENT scene under
            # the final hard semantics so stages are visually comparable.
            from .utils.imageio import save_png

            max_chunk = max(1, min(100, args.frame_every))
            jit_render = jax.jit(render)  # ONE compile for all frames

            def frame_cb(s, it):
                save_png(f"{args.frames_dir}/frame_{it:05d}.png", jit_render(s))

        t0 = time.perf_counter()
        if args.restarts > 1:
            # Seeded multi-start (docs/OPTIMIZATION_NOTES.md "Multi-start
            # widens the basins"): keep the best final HARD loss across
            # jittered restarts of the whole anneal.
            from .optim import optimize_multistart

            final, best_loss, finals = optimize_multistart(
                start, target, spec, cfg, ocfg,
                restarts=args.restarts, jitter=args.restart_jitter,
                seed=args.seed + 1000, proposal=args.restart_proposal,
                chain=args.restart_chain,
                taus=taus, target_scene=truth,
                soft_size=args.anneal_size, checker_ratio=args.checker_ratio,
                max_chunk=max_chunk, chunk_callback=frame_cb,
            )
            import numpy as _np

            losses = _np.asarray([best_loss])
            print(f"multistart finals: {['%.3e' % f for f in finals]} "
                  f"-> best {best_loss:.3e}", file=sys.stderr)
        else:
            final, losses = optimize_annealed(
                start, target, spec, cfg, ocfg, taus=taus, target_scene=truth,
                soft_size=args.anneal_size, checker_ratio=args.checker_ratio,
                max_chunk=max_chunk, chunk_callback=frame_cb,
            )
        import numpy as np

        # Per-stage loss trace (the scan returns every iteration's loss;
        # NOTE each stage minimizes its OWN tau's matched-target objective,
        # so the trace is comparable within a stage, not across stage
        # boundaries). ONE bulk device->host transfer — per-element float()
        # would pay the ~30 ms tunnel roundtrip per iteration — and the
        # transfer lands BEFORE the clock is read (block_until_ready does
        # not reliably wait on the axon tunnel; CLAUDE.md).
        la = [float(x) for x in np.asarray(losses)]
        dt = time.perf_counter() - t0
        stride = max(len(la) // 20, 1) if args.log_every else len(la)
        for i in range(0, len(la), stride):
            logger.log(step=i, loss=la[i])
        logger.log(step=len(la), loss=la[-1], wall_s=round(dt, 3),
                   taus=list(taus))
        history = [{"loss": la[-1]}]
    elif args.sharded:
        from .parallel import make_ray_mesh, optimize_sharded_scan

        mesh = make_ray_mesh()
        sh_impl = impl if impl in (
            "pallas", "pallas_vec", "pallas_vec_soft", "jnp_vec"
        ) else "jnp"
        if sh_impl == "pallas" and jax.default_backend() == "tpu" \
                and cfg.soft_tau == 0.0 and cfg.checker_tau == 0.0:
            sh_impl = "pallas_step"  # fused per-band loss+grad kernel
        t0 = time.perf_counter()
        final, losses = optimize_sharded_scan(
            start, target, mesh, cfg, spec, ocfg, impl=sh_impl,
        )
        jax.block_until_ready(losses)
        dt = time.perf_counter() - t0
        logger.log(step=args.iters, loss=float(losses[-1]), wall_s=round(dt, 3),
                   mesh=str(dict(mesh.shape)))
        history = [{"loss": float(losses[-1])}]
    else:
        # Training-step dispatch goes through the ONE tested policy
        # (`ops.render.loss_and_grad_fn` / `resolve_step_impl`): on TPU
        # the fused single-kernel step where validated (incl. textured /
        # env-mapped scenes — round 2's private CLI policy missed those
        # and ran them ~113x slower), value_and_grad elsewhere.
        from .ops.render import loss_and_grad_fn

        vag = loss_and_grad_fn(scene, cfg, impl=args.impl, loss=args.loss)
        t0 = time.perf_counter()
        final, history = optimize(
            start, target, spec, cfg, ocfg, render_fn=render, logger=logger,
            vag_fn=vag,
            log_every=args.log_every, frame_every=args.frame_every,
            frame_dir=args.frames_dir, checkpoint_every=args.checkpoint_every,
            checkpoint_path=args.checkpoint, truth=truth, resume=args.resume,
        )
        dt = time.perf_counter() - t0

    if truth is not None:
        err = float(param_error(final, truth, spec))
        print(f"final param RMS error vs truth: {err:.5f}", file=sys.stderr)
    final_loss = f"{history[-1]['loss']:.3e}" if history else "n/a (--log-every 0)"
    print(f"optimized {args.iters} iters in {dt:.1f}s "
          f"(final loss {final_loss})", file=sys.stderr)
    if args.save_scene:
        from .utils.sceneio import save_scene

        save_scene(args.save_scene, final)
        print(args.save_scene)
    if args.output:
        from .utils.imageio import save_png

        save_png(args.output, jax.jit(render)(final))
        print(args.output)
    if args.gif and args.frame_every:
        from .utils.imageio import save_gif

        save_gif(args.gif, args.frames_dir)
        print(args.gif)
    logger.close()


def cmd_bench(args):
    import bench

    bench.main()


def main(argv=None):
    ap = argparse.ArgumentParser(prog="reversible_raytracer_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("render", help="render a scene to PNG")
    _add_common(pr)
    pr.add_argument("-o", "--output", default="render.png")
    pr.add_argument("--shader", choices=["phong", "depth", "normal"], default="phong")
    pr.set_defaults(fn=cmd_render)

    pi = sub.add_parser("invert", help="inverse-render: recover scene params from a target")
    _add_common(pi)
    pi.add_argument("--iters", type=int, default=400)
    pi.add_argument("--lr", type=float, default=1e-2)
    pi.add_argument("--loss", choices=["mse", "sum"], default="mse")
    pi.add_argument("--schedule", choices=["cosine", "constant"], default="cosine",
                    help="learning-rate schedule (cosine stabilizes the endgame)")
    pi.add_argument("--perturb", type=float, default=0.05,
                    help="perturbation scale applied to trainable params")
    pi.add_argument("--seed", type=int, default=0)
    pi.add_argument("--target", type=str, default=None,
                    help="PNG target image (default: render the ground truth)")
    pi.add_argument("--sharded", action="store_true",
                    help="shard rays over all local devices (P1)")
    pi.add_argument("--coordinator", type=str, default=None,
                    help="multi-host: coordinator address for jax.distributed (P3)")
    pi.add_argument("--num-processes", type=int, default=None,
                    help="multi-host: total process count")
    pi.add_argument("--process-id", type=int, default=None,
                    help="multi-host: this process's id")
    pi.add_argument("--gif", type=str, default=None,
                    help="assemble dumped frames into an animated GIF at this path")
    pi.add_argument("--metrics", type=str, default=None, help="JSONL metrics path")
    pi.add_argument("--quiet", action="store_true", help="suppress per-step stderr logs")
    pi.add_argument("--paranoid", action="store_true",
                    help="enable NaN debugging + checkify float checks (SURVEY §5.2)")
    pi.add_argument("--log-every", type=int, default=25)
    pi.add_argument("--frame-every", type=int, default=0)
    pi.add_argument("--frames-dir", type=str, default="frames")
    pi.add_argument("--checkpoint", type=str, default=None)
    pi.add_argument("--checkpoint-every", type=int, default=0)
    pi.add_argument("--resume", type=str, default=None)
    pi.add_argument("--anneal", type=str, default=None, metavar="TAUS",
                    help="soft-visibility annealed inversion (silhouette-"
                         "aware gradients): comma-separated tau schedule, "
                         "e.g. '0.08,0.03,0' — runs --iters Adam steps per "
                         "stage on the jnp_vec renderer. Requires the "
                         "ground-truth scene (i.e. no --target image).")
    pi.add_argument("--checker-ratio", type=float, default=0.0,
                    help="soft-checker temperature per anneal tau unit "
                         "(checker_tau = ratio * tau per stage; 12.5 works "
                         "for camera-pose inversion against checkers, "
                         "config 4). 0 = hard checker (default)")
    pi.add_argument("--restarts", type=int, default=1,
                    help="with --anneal: seeded multi-start — run the whole "
                         "anneal from N jittered starts and keep the best "
                         "final hard loss (widens recovery basins; see "
                         "docs/OPTIMIZATION_NOTES.md)")
    pi.add_argument("--restart-jitter", type=float, default=0.15,
                    help="relative re-perturbation scale for --restarts")
    pi.add_argument("--restart-proposal", default="jitter",
                    choices=["jitter", "per_sphere", "swap", "swap_jitter",
                             "mixed", "resid"],
                    help="restart proposal family (optim.propose_restart): "
                         "structure-aware moves (per-sphere re-jitter, "
                         "pairwise identity swaps, residual-guided "
                         "re-seeding) attack topology stalls that i.i.d. "
                         "jitter cannot reach")
    pi.add_argument("--restart-chain", action="store_true",
                    help="propose each restart from the best converged "
                         "scene so far (sequential repair; with "
                         "--restart-proposal resid this closed the "
                         "0.45/seed-2 stall — OPTIMIZATION_NOTES)")
    pi.add_argument("--anneal-size", type=int, default=None,
                    help="resolution for the soft anneal stages (coarse-to-"
                         "fine; the final hard stage runs at full size)")
    pi.add_argument("--save-scene", type=str, default=None)
    pi.add_argument("-o", "--output", type=str, default=None,
                    help="save the final render as PNG")
    pi.set_defaults(fn=cmd_invert)

    pb = sub.add_parser("bench", help="run the benchmark harness")
    pb.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
