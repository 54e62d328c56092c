"""Environment-map backgrounds (`Scene.env`: lat-long sky texture sampled
by missed-ray direction) and sky recovery via inverse rendering (config 9).

Capability extension beyond the reference. Fidelity triangulation follows
the house pattern (SURVEY.md §4.2): f64 numpy oracle == native C++ oracle
(ABI v6) == jnp == jnp_vec; gradients flow into the env texels both from
primary-ray misses and THROUGH mirror bounces (a reflected ray's miss
samples the env). Env-free scenes are bitwise unaffected (empty env leaf),
which the whole pre-existing suite enforces.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reversible_raytracer_tpu.models import configs
from reversible_raytracer_tpu.models import scene as S
from reversible_raytracer_tpu.ops.pipeline import RenderConfig
from reversible_raytracer_tpu.ops.render import mse_loss, render, render_jnp
from reversible_raytracer_tpu.oracle import native
from reversible_raytracer_tpu.oracle import reference_np as ref


def _sky_scene(size=48, env_k=8, reflections=1):
    scene, spec, cfg = configs.config9_sky(size, env_k=env_k)
    if reflections != cfg.reflections:
        cfg = dataclasses.replace(cfg, reflections=reflections)
    return scene, spec, cfg


def test_env_render_matches_oracles_including_seam():
    """jnp == f64 oracle == native C++ oracle, for a front view and for a
    seam-facing camera (-x: the atan2 azimuth wrap runs down mid-frame)."""
    for cam in (None, S.Camera.make((-3.8, 0.6, 0.0), (0.0, 0.1, 0.0))):
        scene, _, cfg = _sky_scene()
        if cam is not None:
            scene = dataclasses.replace(scene, camera=cam)
        for refl in (0, 1):
            c = dataclasses.replace(cfg, reflections=refl)
            a = np.asarray(render_jnp(scene, c))
            o = ref.render(scene, c.height, c.width, reflections=refl)
            assert np.abs(a - o).max() < 1e-3
            b = np.asarray(render(scene, c, impl="jnp_vec"))
            assert np.abs(b - a).max() < 1e-6
            if native.available():
                n = native.render(scene, c.height, c.width, reflections=refl)
                assert np.abs(n - o).max() < 1e-12


def test_env_grads_flow_from_misses_and_reflections():
    """Direct miss pixels AND mirror-reflected misses both contribute env
    gradient: turning reflections on must strictly grow the set of texels
    receiving signal (the chrome sphere sees sky behind the camera)."""
    scene, _, cfg = _sky_scene()
    target = render_jnp(scene, cfg) * 0.9

    def g(refl):
        c = dataclasses.replace(cfg, reflections=refl)
        t = render_jnp(scene, c) * 0.9
        grad = jax.grad(lambda s: mse_loss(render_jnp(s, c), t))(scene)
        return np.abs(np.asarray(grad.env)) > 1e-12

    live0, live1 = g(0), g(1)
    assert 0.05 < live0.mean() < 0.95
    assert live1.sum() > live0.sum()
    del target


def test_env_grad_matches_fd_oracle():
    scene, _, cfg = _sky_scene(reflections=1)
    H = W = cfg.height
    tgt64 = ref.render(scene, H, W, reflections=1) * 0.9
    tgt = jnp.asarray(tgt64, jnp.float32)
    genv = np.asarray(
        jax.grad(lambda s: mse_loss(render_jnp(s, cfg), tgt))(scene).env
    )
    assert np.isfinite(genv).all()
    ti, tj, tc = np.unravel_index(np.abs(genv).argmax(), genv.shape)

    def oracle_loss(d):
        e = np.asarray(scene.env).copy()
        e[ti, tj, tc] += d
        s2 = dataclasses.replace(scene, env=jnp.asarray(e))
        return ref.mse_loss(ref.render(s2, H, W, reflections=1), tgt64)

    eps = 1e-4
    fd = (oracle_loss(+eps) - oracle_loss(-eps)) / (2 * eps)
    an = float(genv[ti, tj, tc])
    assert abs(an - fd) / max(abs(fd), 1e-9) < 0.02, (an, fd)


def test_sky_recovery_converges():
    """Config-9 capability: recover observable env texels from a 40%
    perturbation (unobserved texels keep their start — masked out)."""
    from reversible_raytracer_tpu.optim import OptConfig, optimize_scan

    scene, spec, _ = _sky_scene(size=64)
    cfg = RenderConfig(height=64, width=64, shadows=True, reflections=1)
    target = render_jnp(scene, cfg)
    g = jax.grad(lambda s: mse_loss(render_jnp(s, cfg), target * 0.9))(scene)
    vis = np.abs(np.asarray(g.env)) > 1e-10
    assert 0.05 < vis.mean() < 0.95

    start = configs.perturb(scene, spec, scale=0.4, seed=9)
    final, losses = optimize_scan(
        start, target, spec, cfg,
        OptConfig(iters=200, lr=3e-2, schedule="cosine"),
        cache_key="test-sky-recovery",
    )
    truth = np.asarray(scene.env)
    err0 = np.sqrt(np.mean((np.asarray(start.env) - truth)[vis] ** 2))
    err1 = np.sqrt(np.mean((np.asarray(final.env) - truth)[vis] ** 2))
    assert float(losses[-1]) < 1e-5
    assert err1 < 0.3 * err0, (err0, err1)


def test_env_kernel_dispatch_and_unrolled_support():
    """Both kernel families render env-mapped scenes (dense sampler; the
    vec family since round 3 — env rides its SMEM globals plan), with
    reflections ON too — env-only bounces add just one dense env sample
    per level (unlike object textures, whose per-bounce dense-chain
    replay both kernel families refuse). Auto routing works everywhere."""
    from reversible_raytracer_tpu.ops.kernels.fused import render_pallas
    from reversible_raytracer_tpu.ops.kernels.fused_vec import render_pallas_vec

    scene, _, _ = _sky_scene(env_k=8)
    cfg = RenderConfig(height=16, width=128)  # reflections=0
    a = np.asarray(render_jnp(scene, cfg))
    b = np.asarray(render_pallas(scene, cfg, interpret=True))
    assert np.abs(a - b).max() < 1e-5
    # vec kernel: bit-exact vs the UNROLLED kernel (both trace the dense
    # sampler; jnp uses the gather — equal outside half-texel edge bands)
    v = np.asarray(render_pallas_vec(scene, cfg, interpret=True))
    np.testing.assert_array_equal(v, b)
    cfg_r = dataclasses.replace(cfg, reflections=1)
    a_r = np.asarray(render_jnp(scene, cfg_r))
    b_r = np.asarray(render_pallas(scene, cfg_r, interpret=True))
    assert np.abs(a_r - b_r).max() < 1e-5
    # round 3: env-only reflective scenes run in the vec family too
    # (per-level loop replay) — again bit-exact vs the unrolled kernel
    v_r = np.asarray(render_pallas_vec(scene, cfg_r, interpret=True))
    np.testing.assert_array_equal(v_r, b_r)
    img = np.asarray(render(scene, cfg_r, impl="auto"))
    assert np.isfinite(img).all()


def _vec_sky_scene(n_spheres=40, env_k=8, size=64):
    """Env map on a vec-scale scene (past the unrolled family's 24-object
    threshold) — the round-3 capability: O(1)-compile kernels + sky."""
    scene, spec, _ = configs.config5_many_spheres(size, n_spheres=n_spheres)
    rng = np.random.default_rng(7)
    env = jnp.asarray(rng.uniform(0.1, 0.9, (env_k, env_k, 3)), jnp.float32)
    return dataclasses.replace(scene, env=env), spec


def test_env_vec_kernel_fwd_and_step_grads_interpret():
    """The object-chunked (vec) kernel family on an env-mapped 40-sphere
    scene: forward bit-exact vs the unrolled kernel's dense sampler, and
    the fused vec STEP kernel's (loss, grads) — env texel grads included —
    match jax.value_and_grad of the jnp_vec path."""
    from reversible_raytracer_tpu.ops.kernels.fused_vec import (
        loss_grad_pallas_vec,
        render_pallas_vec,
    )
    from reversible_raytracer_tpu.ops.pipeline_vec import render_jnp_vec

    scene, spec = _vec_sky_scene()
    cfg = RenderConfig(height=48, width=64, shadows=True)
    from test_fused_vec import _edge_mask

    a = np.asarray(render_jnp_vec(scene, cfg))
    v = np.asarray(render_pallas_vec(scene, cfg, interpret=True))
    # Three diff populations: geometric-boundary hit/miss flips (interpret
    # vs XLA eval order; O(1) pixels, up to full color scale), the
    # dense-vs-gather half-texel bands on miss pixels (~1e-4), and
    # everything else (ulp). Bound each.
    d = np.abs(a - v).max(axis=-1)
    assert d.max() < 1e-2
    assert (d > 1e-3).mean() < 1e-3  # isolated boundary flips only
    e = _edge_mask(a, v)
    assert e.mean() < 0.7
    assert d[~e].max() < 1e-6

    target = jnp.asarray(a) * 0.92
    start = configs.perturb(scene, spec, scale=0.1, seed=3)
    # Strict: step kernel vs autodiff of the SAME kernel family (isolates
    # the in-kernel residual/cotangent path; boundary flips cancel).
    l_ref, g_ref = jax.value_and_grad(
        lambda s: mse_loss(render_pallas_vec(s, cfg, interpret=True), target)
    )(start)
    l_k, g_k = loss_grad_pallas_vec(start, cfg, target, interpret=True)
    assert abs(float(l_ref) - float(l_k)) <= 1e-5 * max(float(l_ref), 1e-9)
    for (path, a_), (_, b_) in zip(
        jax.tree_util.tree_flatten_with_path(g_k)[0],
        jax.tree_util.tree_flatten_with_path(g_ref)[0],
    ):
        a_, b_ = np.asarray(a_), np.asarray(b_)
        if not a_.size:
            continue
        scale = max(float(np.abs(b_).max()), 1e-10)
        # 3e-5, not exact: the step kernel forms the cotangent in-kernel
        # as 2*w*res while XLA's mse backward computes 2*diff*(1/N) in a
        # different rounding order — ~1-ulp cotangent differences amplify
        # to ~1e-5 relative on the env->camera chain at this residual
        # scale (observed 1.2e-5 max).
        assert float(np.abs(a_ - b_).max()) <= 3e-5 * scale, (
            path, float(np.abs(a_ - b_).max()))
    # Loose vs XLA autodiff of jnp_vec (boundary-pixel subgradient flips;
    # the strict check above pins the kernel's own correctness).
    l_j, g_j = jax.value_and_grad(
        lambda s: mse_loss(render_jnp_vec(s, cfg), target)
    )(start)
    assert abs(float(l_j) - float(l_k)) <= 1e-4 * max(float(l_j), 1e-9)
    for (path, a_), (_, b_) in zip(
        jax.tree_util.tree_flatten_with_path(g_k)[0],
        jax.tree_util.tree_flatten_with_path(g_j)[0],
    ):
        a_, b_ = np.asarray(a_), np.asarray(b_)
        if not a_.size:
            continue
        scale = max(float(np.abs(b_).max()), 1e-10)
        assert float(np.abs(a_ - b_).max()) <= 3e-2 * scale, (
            path, float(np.abs(a_ - b_).max()))
    # the sky receives gradient through the vec step kernel
    assert float(np.abs(np.asarray(g_k.env)).max()) > 0.0


def test_env_vec_dispatch(monkeypatch):
    """impl='auto' routing for env-only scenes: unrolled kernel below the
    VMEM-effective threshold, vec kernels above it (K <= 32), jnp_vec
    beyond; the step dispatch mirrors it."""
    from reversible_raytracer_tpu.ops.render import resolve_impl, resolve_step_impl

    scene, _ = _vec_sky_scene()  # 40 spheres: past the unrolled threshold
    cfg = RenderConfig(height=32, width=32, shadows=True)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolve_impl(scene, cfg) == "pallas_vec"
    assert resolve_step_impl(scene, cfg) == "step_vec"
    # env-only reflections ride the vec kernels too (round 3); spp=4
    # renders via the 4-launch wrapper over the same spp=1 compile
    assert resolve_impl(scene, dataclasses.replace(cfg, reflections=1)) == "pallas_vec"
    assert resolve_step_impl(scene, dataclasses.replace(cfg, reflections=1)) == "step_vec"
    assert resolve_impl(scene, dataclasses.replace(cfg, spp=4)) == "pallas_vec"
    # a K=64 env blows the SMEM/dense-MAC budget -> jnp_vec
    big_env = dataclasses.replace(
        scene, env=jnp.zeros((64, 64, 3), jnp.float32)
    )
    assert resolve_impl(big_env, cfg) == "jnp_vec"
    assert resolve_step_impl(big_env, cfg) == "vag"
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert resolve_impl(scene, cfg) == "jnp_vec"


def test_env_soft_compositor_blends_to_env():
    """The soft-visibility compositor must blend silhouettes toward the
    per-pixel env sample (miss_color), converging to the hard image as
    tau -> 0."""
    scene, _, _ = _sky_scene()
    hard = np.asarray(render_jnp(scene, RenderConfig(height=32, width=32)))
    for tau, tol in ((1e-4, 2e-2), (1e-6, 2e-3)):
        cfg = RenderConfig(height=32, width=32, soft_tau=tau)
        soft = np.asarray(render(scene, cfg, impl="jnp_vec"))
        assert np.abs(soft - hard).mean() < tol


def test_env_scene_json_roundtrip(tmp_path):
    from reversible_raytracer_tpu.utils.sceneio import load_scene, save_scene

    scene, _, _ = _sky_scene(env_k=4)
    p = str(tmp_path / "sky.json")
    save_scene(p, scene)
    back = load_scene(p, scene)
    for a, b in zip(jax.tree_util.tree_leaves(scene),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_env_reflective_step_kernel_grads_interpret():
    """config-9-shaped scene (env + mirror sphere, reflections=1) through
    the fused step kernel in interpret mode: loss and grads match
    jax.value_and_grad of the jnp path (the env texels' gradients flow
    through BOTH primary-miss and bounced-miss samples)."""
    from reversible_raytracer_tpu.models import configs
    from reversible_raytracer_tpu.ops.kernels.fused import loss_grad_pallas
    from reversible_raytracer_tpu.ops.render import mse_loss

    scene, spec, _ = configs.config9_sky(32, env_k=8)
    cfg = RenderConfig(height=32, width=32, shadows=True, reflections=1)
    target = render_jnp(scene, cfg)
    start = configs.perturb(scene, spec, scale=0.3, seed=9)
    l_ref, g_ref = jax.value_and_grad(
        lambda s: mse_loss(render_jnp(s, cfg), target)
    )(start)
    l_k, g_k = loss_grad_pallas(start, cfg, target, interpret=True)
    assert abs(float(l_ref) - float(l_k)) <= 1e-6 * max(float(l_ref), 1e-9)
    # Absolute floor for exact-zero reference leaves, tied to the gradient
    # scale of the whole tree. Diagnosed (round 3): the eager reference
    # evaluates op-by-op while the kernel evaluates under jit, where XLA:CPU
    # fuses multiply-adds into FMAs; the ~1-ulp ray-direction differences
    # make floor-pixel residuals (exactly 0 eagerly) ~1e-7, which puts
    # ~1e-7 * gmax of gradient dust on the rect leaves. Confirmed NOT to be
    # kernel cotangent leakage: `jax.jit(jax.value_and_grad(...))` of the
    # PURE gather-based jnp path reproduces the identical 5.5e-11 dust.
    # Real masking bugs leak at full residual scale (>= 1e-3 * gmax), far
    # above this floor.
    gmax = max(
        float(np.abs(np.asarray(l)).max())
        for l in jax.tree_util.tree_leaves(g_ref)
        if np.asarray(l).size
    )
    for a, b in zip(jax.tree_util.tree_leaves(g_k),
                    jax.tree_util.tree_leaves(g_ref)):
        a, b = np.asarray(a), np.asarray(b)
        if a.size:
            # house textured-grads tolerance (dense-vs-gather half-texel
            # edge bands; tiny-magnitude leaves see ~1e-4 relative noise)
            scale = max(float(np.abs(b).max()), 1e-10)
            assert float(np.abs(a - b).max()) <= max(1e-2 * scale, 1e-6 * gmax)
    # env grads are live (the sky is trainable in config 9)
    assert float(np.abs(np.asarray(g_k.env)).max()) > 0.0


def test_config10_chrome_field(monkeypatch):
    """Config 10 (round-3 showcase): 64 mirrored spheres under a sky.
    Dispatch lands the WHOLE training step in the object-chunked fused
    kernel on TPU (env in SMEM globals + per-level bounce replay); a
    short CPU inversion recovers mirror coefficients + sky texels."""
    from reversible_raytracer_tpu.optim import OptConfig, optimize_scan, param_error
    from reversible_raytracer_tpu.ops.pipeline_vec import render_jnp_vec
    from reversible_raytracer_tpu.ops.render import resolve_impl, resolve_step_impl

    scene, spec, cfg = configs.config10_chrome_field(48)
    assert scene.env_mapped and cfg.reflections == 1
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolve_impl(scene, cfg) == "pallas_vec"
    assert resolve_step_impl(scene, cfg) == "step_vec"
    monkeypatch.undo()

    target = render_jnp_vec(scene, cfg)
    start = configs.perturb(scene, spec, scale=0.25, seed=0)
    err0 = float(param_error(start, scene, spec))
    final, losses = optimize_scan(
        start, target, spec, cfg,
        OptConfig(iters=60, lr=2e-2, schedule="cosine"),
        render_fn=lambda s: render_jnp_vec(s, cfg),
        cache_key="test-config10",
    )
    err1 = float(param_error(final, scene, spec))
    assert float(losses[-1]) < 5e-4
    assert err1 < 0.8 * err0, (err0, err1)
    # both parameter groups receive signal
    import jax.numpy as _jnp
    assert float(_jnp.abs(final.spheres.material.mirror
                          - start.spheres.material.mirror).max()) > 1e-3
    assert float(_jnp.abs(final.env - start.env).max()) > 1e-3


def test_env_k_tile_and_dispatch_boundaries(monkeypatch):
    """Backend-conditional env boundaries. Legacy auto-vjp backend
    (RRT_ENVBWD=vjp — round-4 measurements,
    docs/env_k32_boundary_check.json): hard family fits env K=32 only at
    8-row tiles; the soft family's ~16.7M row-independent scoped-vmem
    term caps it at K <= 24 (8-row tiles past K=16). Round-5 default
    backend (mxu): the row-independent term was the auto-vjp's 2K
    hat-weight residual planes — gone, so soft admits K <= 32 (K=24 at
    16-row tiles, 1.76x faster; K=32 at 8) — scripts/envbwd_probe.py."""
    from reversible_raytracer_tpu.ops.kernels import fused_vec
    from reversible_raytracer_tpu.ops.kernels.fused_vec import auto_tiles
    from reversible_raytracer_tpu.ops.kernels.fused_vec_soft import (
        auto_tiles_soft,
        soft_kernel_ok,
    )

    scene, _, cfg = _sky_scene(env_k=16, reflections=0)
    k24 = dataclasses.replace(
        scene, env=jnp.zeros((24, 24, 3), jnp.float32)
    )
    k32 = dataclasses.replace(
        scene, env=jnp.zeros((32, 32, 3), jnp.float32)
    )

    # Default (mxu) backend. Hard family refl=0/spp=1: K>16 runs 32-row
    # tiles (probed v5e: K=24 2.60 ms vs 3.83 at 16 rows; K=32 3.42 ms
    # vs 9.50 at the vjp-era 8; 64 rows OOM for both).
    assert fused_vec._ENV_BWD == "mxu"
    tiles16 = auto_tiles(scene, cfg, None)
    tiles32 = auto_tiles(k32, cfg, None)
    assert tiles16.bh_bwd > tiles32.bh_bwd
    assert tiles32.bh_bwd == 32
    assert soft_kernel_ok(scene)
    assert soft_kernel_ok(k24)
    assert soft_kernel_ok(k32)  # round-5 capability (was impossible)
    assert auto_tiles_soft(scene, None).bh_bwd == 32  # K=16 keeps 32
    assert auto_tiles_soft(k24, None).bh_bwd == 16
    assert auto_tiles_soft(k32, None).bh_bwd == 8
    assert auto_tiles(k24, cfg, None).bh_bwd == 32
    # The 32-row lift is refl=0 only: env+reflections at K=24/32 OOMs
    # even under mxu (probed compile failures) — the vjp-era refl ladder
    # stays.
    cfg_refl = dataclasses.replace(cfg, reflections=1)
    assert auto_tiles(k24, cfg_refl, None).bh_bwd == 16
    assert auto_tiles(k32, cfg_refl, None).bh_bwd == 8

    # Legacy (vjp) backend keeps the round-4 walls.
    monkeypatch.setattr(fused_vec, "_ENV_BWD", "vjp")
    assert auto_tiles(k32, cfg, None).bh_bwd == 8
    assert soft_kernel_ok(k24)
    assert not soft_kernel_ok(k32)
    assert auto_tiles_soft(k24, None).bh_bwd == 8


def test_env_observability_mask_semantics():
    """The config-10 evidence metric (scripts/config10_check.py) defines
    texel observability as |d sum(image)/d env[i,j]| > 0 at the truth
    scene. Semantics check at tiny size: bumping an UNOBSERVABLE texel
    leaves the rendered image bitwise unchanged, bumping the strongest
    observable texel does not; and a gradient step moves only observable
    texels."""
    from reversible_raytracer_tpu.ops.pipeline_vec import render_jnp_vec

    scene, _, cfg = _sky_scene(size=24, env_k=8, reflections=1)
    g_env = np.asarray(
        jax.grad(lambda s: jnp.sum(render_jnp_vec(s, cfg)))(scene).env
    )
    mag = np.abs(g_env).max(-1)  # (K, K) any-channel
    obs = mag > 0.0
    # config 9's tilted camera sees a band of sky, not all of it
    assert obs.any() and not obs.all()

    img0 = np.asarray(render_jnp_vec(scene, cfg))

    def bumped(i, j):
        env = scene.env.at[i, j].add(0.25)
        return np.asarray(
            render_jnp_vec(dataclasses.replace(scene, env=env), cfg)
        )

    ui, uj = map(int, np.argwhere(~obs)[0])
    np.testing.assert_array_equal(bumped(ui, uj), img0)
    oi, oj = map(int, np.unravel_index(np.argmax(mag), mag.shape))
    assert np.abs(bumped(oi, oj) - img0).max() > 0.0
