#!/usr/bin/env python
"""Compiled-TPU validation (run manually on a TPU host; CI covers the same
assertions in interpret mode on CPU — SURVEY.md §4.5).

Checks, per scene config:
  1. compiled Pallas forward == jnp/XLA forward (expected bit-exact),
  2. compiled Pallas custom_vjp grads == jax.grad of the jnp path,
  3. no NaN/Inf anywhere.

Exit code 0 on success.
"""

import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from reversible_raytracer_tpu.models import configs
    from reversible_raytracer_tpu.ops.kernels.fused import render_pallas
    from reversible_raytracer_tpu.ops.pipeline import RenderConfig
    from reversible_raytracer_tpu.ops.render import mse_loss, render_jnp

    assert jax.default_backend() == "tpu", f"not on TPU: {jax.default_backend()}"
    failures = 0
    for num, size in [(1, 64), (2, 128), (3, 128), (4, 128), (5, 256)]:
        scene, spec, _ = configs.CONFIGS[num](size)
        cfg = RenderConfig(height=size, width=size, shadows=True)
        t0 = time.time()
        img_p = np.asarray(jax.jit(lambda s: render_pallas(s, cfg))(scene))
        img_j = np.asarray(jax.jit(lambda s: render_jnp(s, cfg))(scene))
        fwd_diff = np.abs(img_p - img_j).max()

        target = jnp.asarray(img_j)
        start = configs.perturb(scene, spec, scale=0.1, seed=num)
        gp = jax.jit(jax.grad(lambda s: mse_loss(render_pallas(s, cfg), target)))(start)
        gj = jax.jit(jax.grad(lambda s: mse_loss(render_jnp(s, cfg), target)))(start)
        gdiff, finite = 0.0, True
        for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gj)):
            a, b = np.asarray(a), np.asarray(b)
            if a.size:
                gdiff = max(gdiff, float(np.abs(a - b).max()))
                finite &= bool(np.isfinite(a).all())
        ok = fwd_diff <= 1e-6 and gdiff <= 1e-6 and finite
        failures += (not ok)
        print(f"config {num} @{size}²: fwd_diff={fwd_diff:.2e} grad_diff={gdiff:.2e} "
              f"finite={finite} [{'OK' if ok else 'FAIL'}] ({time.time()-t0:.0f}s)",
              flush=True)

    # Fused TRAINING-STEP kernel (loss+grads in one launch) vs the
    # two-kernel value_and_grad of render_pallas: same trace of render_tile
    # with the MSE cotangent formed in-kernel instead of on the host, so
    # compiled agreement is expected to be (near-)bit-exact.
    from reversible_raytracer_tpu.ops.kernels.fused import loss_grad_pallas

    scene, spec, _ = configs.config2_four_spheres()
    cfg = RenderConfig(height=512, width=512, shadows=True)
    t0 = time.time()
    target = jax.jit(lambda s: render_pallas(s, cfg))(scene)
    start = configs.perturb(scene, spec, scale=0.1, seed=2)
    l2, g2 = jax.jit(
        jax.value_and_grad(lambda s: mse_loss(render_pallas(s, cfg), target))
    )(start)
    l1, g1 = jax.jit(lambda s: loss_grad_pallas(s, cfg, target))(start)
    ldiff = abs(float(l1) - float(l2)) / max(float(l2), 1e-12)
    gdiff, finite = 0.0, True
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        a, b = np.asarray(a), np.asarray(b)
        if a.size:
            scale = max(float(np.abs(b).max()), 1e-10)
            gdiff = max(gdiff, float(np.abs(a - b).max()) / scale)
            finite &= bool(np.isfinite(a).all())
    ok = ldiff <= 1e-5 and gdiff <= 1e-5 and finite
    failures += (not ok)
    print(f"fused step 4-sphere @512²: loss_rel={ldiff:.2e} grad_rel={gdiff:.2e} "
          f"finite={finite} [{'OK' if ok else 'FAIL'}] ({time.time()-t0:.0f}s)",
          flush=True)

    # Mirror reflections (RenderConfig.reflections, config 6): the unrolled
    # kernels trace the bounce replay inside render_tile — verify the
    # COMPILED Mosaic lowering agrees with jnp (fwd) and that the fused
    # step kernel's through-the-bounce gradients match XLA autodiff.
    scene6, spec6, _ = configs.config6_mirror(128)
    cfg6 = RenderConfig(height=128, width=128, shadows=True, reflections=1)
    t0 = time.time()
    img_p = np.asarray(jax.jit(lambda s: render_pallas(s, cfg6))(scene6))
    img_j = np.asarray(jax.jit(lambda s: render_jnp(s, cfg6))(scene6))
    fwd_diff = np.abs(img_p - img_j).max()
    target = jnp.asarray(img_j)
    start = configs.perturb(scene6, spec6, scale=0.3, seed=6)
    l2, g2 = jax.jit(
        jax.value_and_grad(lambda s: mse_loss(render_jnp(s, cfg6), target))
    )(start)
    l1, g1 = jax.jit(lambda s: loss_grad_pallas(s, cfg6, target))(start)
    ldiff = abs(float(l1) - float(l2)) / max(float(l2), 1e-12)
    gdiff, finite = 0.0, True
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        a, b = np.asarray(a), np.asarray(b)
        if a.size:
            scale = max(float(np.abs(b).max()), 1e-10)
            gdiff = max(gdiff, float(np.abs(a - b).max()) / scale)
            finite &= bool(np.isfinite(a).all())
    ok = fwd_diff <= 1e-6 and ldiff <= 1e-4 and gdiff <= 1e-3 and finite
    failures += (not ok)
    print(f"reflections config-6 @128²: fwd_diff={fwd_diff:.2e} loss_rel={ldiff:.2e} "
          f"grad_rel={gdiff:.2e} finite={finite} [{'OK' if ok else 'FAIL'}] "
          f"({time.time()-t0:.0f}s)", flush=True)

    # Object-chunked kernels (fused_vec) vs the object-vectorized jnp path:
    # forward expected bit-exact; grads finite and close (the hand-planned
    # masked-vjp backward differs from XLA autodiff only at boundary-pixel
    # subgradients — the strict masked comparison runs in CI interpret mode).
    from reversible_raytracer_tpu.ops.kernels.fused_vec import render_pallas_vec
    from reversible_raytracer_tpu.ops.pipeline_vec import render_jnp_vec

    scene, spec, _ = configs.config5_many_spheres(256, n_spheres=64)
    cfg = RenderConfig(height=256, width=256, shadows=True)
    t0 = time.time()
    img_p = np.asarray(jax.jit(lambda s: render_pallas_vec(s, cfg))(scene))
    img_v = np.asarray(jax.jit(lambda s: render_jnp_vec(s, cfg))(scene))
    fwd_diff = np.abs(img_p - img_v).max()
    target = jnp.asarray(img_v)
    start = configs.perturb(scene, spec, scale=0.05, seed=9)
    gp = jax.jit(jax.grad(lambda s: mse_loss(render_pallas_vec(s, cfg), target)))(start)
    finite = all(
        bool(np.isfinite(np.asarray(l)).all())
        for l in jax.tree_util.tree_leaves(gp) if np.asarray(l).size
    )
    ok = fwd_diff <= 1e-6 and finite
    failures += (not ok)
    print(f"fused_vec 65-obj @256²: fwd_diff={fwd_diff:.2e} grads_finite={finite} "
          f"[{'OK' if ok else 'FAIL'}] ({time.time()-t0:.0f}s)", flush=True)

    # Soft-visibility kernels (fused_vec_soft) vs the jnp soft path:
    # forward observed bit-exact on TPU (same contraction choices); grads
    # finite. The strict masked grad comparison runs in CI interpret mode
    # (tests/test_fused_vec_soft.py). NOTE: cold soft-fwd compiles are
    # minutes-long; the compile cache usually holds after a bench run.
    import dataclasses

    from reversible_raytracer_tpu.ops.kernels.fused_vec_soft import (
        render_pallas_vec_soft,
    )

    cfg_s = dataclasses.replace(cfg, soft_tau=0.05)
    t0 = time.time()
    img_p = np.asarray(jax.jit(lambda s: render_pallas_vec_soft(s, cfg_s))(scene))
    img_v = np.asarray(jax.jit(lambda s: render_jnp_vec(s, cfg_s))(scene))
    fwd_diff = np.abs(img_p - img_v).max()
    target = jnp.asarray(img_v)
    gp = jax.jit(
        jax.grad(lambda s: mse_loss(render_pallas_vec_soft(s, cfg_s), target))
    )(start)
    finite = all(
        bool(np.isfinite(np.asarray(l)).all())
        for l in jax.tree_util.tree_leaves(gp) if np.asarray(l).size
    )
    ok = fwd_diff <= 1e-6 and finite
    failures += (not ok)
    print(f"fused_vec_soft 65-obj @256² tau=0.05: fwd_diff={fwd_diff:.2e} "
          f"grads_finite={finite} [{'OK' if ok else 'FAIL'}] "
          f"({time.time()-t0:.0f}s)", flush=True)

    # Soft CHECKER (RenderConfig.checker_tau, config-4 capability). NOTE:
    # the soft-kernel cache key includes the object-count layout, so the
    # 3-object config-4 scene is a FRESH (minutes-long cold) Mosaic
    # compile — the runtime tau_arr only dedupes compiles across tau
    # values for the SAME layout. Camera grads must be live+finite.
    scene4, spec4, cfg4 = configs.config4_checker_camera(256)
    cfg_c = dataclasses.replace(cfg4, soft_tau=0.05, checker_tau=0.5)
    t0 = time.time()
    img_p = np.asarray(jax.jit(lambda s: render_pallas_vec_soft(s, cfg_c))(scene4))
    img_v = np.asarray(jax.jit(lambda s: render_jnp_vec(s, cfg_c))(scene4))
    fwd_diff = np.abs(img_p - img_v).max()
    target = jnp.asarray(img_v)
    start4 = configs.perturb(scene4, spec4, scale=0.03, seed=0)
    gp = jax.jit(
        jax.grad(lambda s: mse_loss(render_pallas_vec_soft(s, cfg_c), target))
    )(start4)
    finite = all(
        bool(np.isfinite(np.asarray(l)).all())
        for l in jax.tree_util.tree_leaves(gp) if np.asarray(l).size
    )
    cam_live = float(np.abs(np.asarray(gp.camera.eye)).max()) > 1e-9
    ok = fwd_diff <= 1e-6 and finite and cam_live
    failures += (not ok)
    print(f"fused_vec_soft config-4 @256² ctau=0.5: fwd_diff={fwd_diff:.2e} "
          f"grads_finite={finite} camera_grad_live={cam_live} "
          f"[{'OK' if ok else 'FAIL'}] ({time.time()-t0:.0f}s)", flush=True)

    # Image textures in the unrolled kernels (dense hat-basis sampler,
    # pipeline.sample_texture_dense): validates the Mosaic lowering of the
    # O(K^2) scalar-MAC chain + its in-kernel vjp. Dense-vs-gather is the
    # same math up to ulp-level edge bands, so fwd tolerance is 1e-5 (not
    # bit-exact like the untextured rows). Configs 7 (rect grid) and 8
    # (sphere lat-long grid, wrapped azimuth).
    for num, name in ((7, "rect"), (8, "globe")):
        scene_t, spec_t, _ = configs.CONFIGS[num](128)
        cfg_t = RenderConfig(height=128, width=128, shadows=True)
        t0 = time.time()
        img_p = np.asarray(jax.jit(lambda s: render_pallas(s, cfg_t))(scene_t))
        img_j = np.asarray(jax.jit(lambda s: render_jnp(s, cfg_t))(scene_t))
        fwd_diff = np.abs(img_p - img_j).max()
        target = jnp.asarray(img_j)
        start_t = configs.perturb(scene_t, spec_t, scale=0.4, seed=num)
        l2, g2 = jax.jit(
            jax.value_and_grad(lambda s: mse_loss(render_jnp(s, cfg_t), target))
        )(start_t)
        l1, g1 = jax.jit(lambda s: loss_grad_pallas(s, cfg_t, target))(start_t)
        ldiff = abs(float(l1) - float(l2)) / max(float(l2), 1e-12)
        gdiff, finite = 0.0, True
        for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
            a, b = np.asarray(a), np.asarray(b)
            if a.size:
                scale = max(float(np.abs(b).max()), 1e-10)
                gdiff = max(gdiff, float(np.abs(a - b).max()) / scale)
                finite &= bool(np.isfinite(a).all())
        ok = fwd_diff <= 1e-5 and ldiff <= 1e-4 and gdiff <= 1e-2 and finite
        failures += (not ok)
        print(f"textured kernel config-{num} ({name}) @128²: "
              f"fwd_diff={fwd_diff:.2e} loss_rel={ldiff:.2e} "
              f"grad_rel={gdiff:.2e} finite={finite} "
              f"[{'OK' if ok else 'FAIL'}] ({time.time()-t0:.0f}s)", flush=True)

    # Environment map through the unrolled kernel (config 9 with
    # reflections=0; `miss_color`'s dense env sample is what's validated
    # here — the reflections=1 as-shipped variant, which also runs
    # in-kernel since env-only bounces add just one dense sample, is
    # covered by scripts/tpu_textured_check.py).
    import dataclasses

    scene9, spec9, cfg9 = configs.config9_sky(128)
    cfg9 = dataclasses.replace(cfg9, reflections=0)
    t0 = time.time()
    img_p = np.asarray(jax.jit(lambda s: render_pallas(s, cfg9))(scene9))
    img_j = np.asarray(jax.jit(lambda s: render_jnp(s, cfg9))(scene9))
    fwd_diff = np.abs(img_p - img_j).max()
    target = jnp.asarray(img_j)
    start9 = configs.perturb(scene9, spec9, scale=0.4, seed=9)
    l2, g2 = jax.jit(
        jax.value_and_grad(lambda s: mse_loss(render_jnp(s, cfg9), target))
    )(start9)
    l1, g1 = jax.jit(lambda s: loss_grad_pallas(s, cfg9, target))(start9)
    ldiff = abs(float(l1) - float(l2)) / max(float(l2), 1e-12)
    gdiff, finite = 0.0, True
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        a, b = np.asarray(a), np.asarray(b)
        if a.size:
            scale = max(float(np.abs(b).max()), 1e-10)
            gdiff = max(gdiff, float(np.abs(a - b).max()) / scale)
            finite &= bool(np.isfinite(a).all())
    ok = fwd_diff <= 1e-5 and ldiff <= 1e-4 and gdiff <= 1e-2 and finite
    failures += (not ok)
    print(f"env kernel config-9 (reflections=0) @128²: fwd_diff={fwd_diff:.2e} "
          f"loss_rel={ldiff:.2e} grad_rel={gdiff:.2e} finite={finite} "
          f"[{'OK' if ok else 'FAIL'}] ({time.time()-t0:.0f}s)", flush=True)

    # Round-3 vec-family capabilities: env / textures / reflections /
    # in-kernel spp=4 through the object-chunked STEP kernel, compared
    # against XLA value_and_grad of jnp_vec at 33-obj 128^2 (vec scale,
    # smoke-sized). Boundary-flip pixels bound grad_rel at the percent
    # class, same as the interpret tests.
    from reversible_raytracer_tpu.ops.kernels.fused_vec import (
        loss_grad_pallas_vec,
    )
    from reversible_raytracer_tpu.ops.pipeline_vec import render_jnp_vec

    base33, spec33, _ = configs.config5_many_spheres(128, n_spheres=33)
    rng = np.random.default_rng(7)
    env33 = jnp.asarray(rng.uniform(0.1, 0.9, (8, 8, 3)), jnp.float32)
    tex33 = jnp.asarray(
        rng.uniform(0.1, 0.9, (base33.spheres.count, 8, 8, 3)), jnp.float32
    )
    mat33 = base33.spheres.material
    mir33 = jnp.asarray(
        rng.uniform(0.2, 0.8, (base33.spheres.count,)), jnp.float32
    )
    cfg33 = RenderConfig(height=128, width=128, shadows=True)
    vec_rows = (
        ("env", dataclasses.replace(base33, env=env33), cfg33),
        ("textured", dataclasses.replace(
            base33, spheres=dataclasses.replace(base33.spheres, texture=tex33)
        ), cfg33),
        ("reflective", dataclasses.replace(
            base33, spheres=dataclasses.replace(
                base33.spheres,
                material=dataclasses.replace(mat33, mirror=mir33),
            )
        ), dataclasses.replace(cfg33, reflections=1)),
        ("spp4", base33, dataclasses.replace(cfg33, spp=4)),
        # Round-4 soft rows: env + OBJECT texel grids in the SOFT kernel
        # family (the anneal's soft stages; fused_vec_soft). The jnp_vec
        # reference renders the same soft compositor when soft_tau > 0.
        ("softenv", dataclasses.replace(base33, env=env33),
         dataclasses.replace(cfg33, soft_tau=0.05)),
        ("softtex", dataclasses.replace(
            base33, spheres=dataclasses.replace(base33.spheres, texture=tex33)
        ), dataclasses.replace(cfg33, soft_tau=0.05)),
    )
    for name, scene_v, cfg_v in vec_rows:
        if cfg_v.soft_tau > 0.0:
            from reversible_raytracer_tpu.ops.kernels.fused_vec_soft import (
                loss_grad_pallas_vec_soft as loss_grad_pallas_vec,
            )
        else:
            from reversible_raytracer_tpu.ops.kernels.fused_vec import (
                loss_grad_pallas_vec,
            )
        t0 = time.time()
        tgt_v = jnp.asarray(
            np.asarray(jax.jit(lambda s, c=cfg_v: render_jnp_vec(s, c))(scene_v))
        ) * 0.92
        start_v = configs.perturb(scene_v, spec33, scale=0.05, seed=3)
        l2, g2 = jax.jit(jax.value_and_grad(
            lambda s, c=cfg_v: mse_loss(render_jnp_vec(s, c), tgt_v)
        ))(start_v)
        l1, g1 = jax.jit(
            lambda s, t, c=cfg_v: loss_grad_pallas_vec(s, c, t)
        )(start_v, tgt_v)
        ldiff = abs(float(l1) - float(l2)) / max(float(l2), 1e-12)
        gdiff, finite = 0.0, True
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            a, b = np.asarray(a), np.asarray(b)
            if a.size:
                scale = max(float(np.abs(b).max()), 1e-10)
                gdiff = max(gdiff, float(np.abs(a - b).max()) / scale)
                finite &= bool(np.isfinite(a).all())
        ok = ldiff <= 1e-4 and gdiff <= 5e-2 and finite
        failures += (not ok)
        print(f"vec step kernel ({name}) 33-obj @128²: loss_rel={ldiff:.2e} "
              f"grad_rel={gdiff:.2e} finite={finite} "
              f"[{'OK' if ok else 'FAIL'}] ({time.time()-t0:.0f}s)", flush=True)
    # --- sharded band steps, COMPILED on the real chip (mesh=1) ---
    # The fake-mesh suite + driver dryrun exercise these in interpret
    # mode only; this row pins that the shard_map + explicit-psum band
    # steps (both kernel families) compile and produce nonzero finite
    # grads on hardware (the documented check_vma=False failure mode is
    # silently ZERO grads).
    from reversible_raytracer_tpu.optim import OptConfig
    from reversible_raytracer_tpu.parallel import make_ray_mesh, make_sharded_step

    mesh1 = make_ray_mesh(1)
    scene2s, spec2s, _ = configs.config2_four_spheres(128)
    for impl, scene_s, spec_s in (
        ("pallas_step", scene2s, spec2s),
        ("pallas_vec_step", base33, spec33),
    ):
        t0 = time.time()
        cfg_s = RenderConfig(height=128, width=128, shadows=True)
        tgt_s = jax.jit(lambda s: render_jnp(s, cfg_s))(scene_s)
        start_s = configs.perturb(scene_s, spec_s, scale=0.1, seed=5)
        l_ref, _ = jax.jit(jax.value_and_grad(
            lambda s: mse_loss(render_jnp(s, cfg_s), tgt_s)
        ))(start_s)
        step_s, init_s = make_sharded_step(
            mesh1, cfg_s, spec_s, OptConfig(iters=1, lr=1e-2), impl=impl
        )
        s_, o_, t_ = init_s(start_s, tgt_s)
        _, _, l_sh, gn = step_s(s_, o_, t_)
        ldiff = abs(float(l_sh) - float(l_ref)) / max(float(l_ref), 1e-12)
        gn = float(gn)
        ok = ldiff <= 1e-4 and np.isfinite(gn) and gn > 0.0
        failures += (not ok)
        print(f"sharded {impl} mesh=1 @128²: loss_rel={ldiff:.2e} "
              f"gnorm={gn:.3e} [{'OK' if ok else 'FAIL'}] "
              f"({time.time()-t0:.0f}s)", flush=True)

    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
