"""Image-texture materials (Rects.texture, bilinear sampling) and texture
recovery via inverse rendering (config 7).

Capability extension beyond the reference. Fidelity triangulation follows
the house pattern (SURVEY.md §4.2): f64 numpy oracle == native C++ oracle
(ABI v4) == jnp == jnp_vec; gradients FD-checked against the f64 oracle
both INTO the texel grid and THROUGH the bilinear weights to the camera.
Untextured scenes are bitwise unaffected (empty texture leaf), which the
whole pre-existing suite enforces.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reversible_raytracer_tpu.models import configs
from reversible_raytracer_tpu.ops.pipeline import RenderConfig
from reversible_raytracer_tpu.ops.render import mse_loss, render, render_jnp
from reversible_raytracer_tpu.oracle import native
from reversible_raytracer_tpu.oracle import reference_np as ref


def _tex_scene(size=64):
    scene, spec, _ = configs.config7_texture(size)
    return scene, spec


def test_jnp_matches_f64_oracle():
    scene, _ = _tex_scene()
    cfg = RenderConfig(height=64, width=64)
    img = np.asarray(render_jnp(scene, cfg))
    orc = ref.render(scene, 64, 64)
    assert np.abs(img - orc).max() < 1e-3
    assert np.abs(img - orc).mean() < 1e-5


def test_native_oracle_matches_numpy():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    scene, _ = _tex_scene()
    a = ref.render(scene, 48, 56)
    b = native.render(scene, 48, 56)
    assert np.abs(a - b).max() < 1e-12


def test_jnp_vec_and_auto_match_unrolled():
    scene, _ = _tex_scene()
    cfg = RenderConfig(height=64, width=64)
    a = np.asarray(render_jnp(scene, cfg))
    assert np.abs(np.asarray(render(scene, cfg, impl="jnp_vec")) - a).max() == 0.0
    assert np.abs(np.asarray(render(scene, cfg, impl="auto")) - a).max() == 0.0


def test_texture_with_reflections_and_spp():
    """Orthogonal features compose: textured floor + mirror sphere + SSAA,
    jnp_vec bitwise vs unrolled."""
    scene, _ = _tex_scene()
    mat = scene.spheres.material
    scene = dataclasses.replace(
        scene,
        spheres=dataclasses.replace(
            scene.spheres,
            material=dataclasses.replace(
                mat, mirror=jnp.full_like(mat.mirror, 0.5)
            ),
        ),
    )
    cfg = RenderConfig(height=48, width=48, reflections=1, spp=4)
    a = np.asarray(render_jnp(scene, cfg))
    b = np.asarray(render(scene, cfg, impl="jnp_vec"))
    assert np.abs(a - b).max() < 1e-6
    orc = ref.render(scene, 48, 48, reflections=1)  # oracle is spp=1
    a1 = np.asarray(render_jnp(scene, dataclasses.replace(cfg, spp=1)))
    assert np.abs(a1 - orc).max() < 1e-3


def test_unrolled_kernels_render_textures():
    """Both Pallas families sample textures via the gather-free dense
    hat-basis path (`pipeline.sample_texture_dense`) — the unrolled family
    through the SMEM scalar view, the vec family (since round 3) through
    texel tails appended to the SMEM object rows. Same function as the jnp
    gather up to ulp-level edge bands."""
    scene, _, _ = configs.config7_texture(48, tex_k=8)  # small K: trace cost
    cfg = RenderConfig(height=16, width=128)
    from reversible_raytracer_tpu.ops.kernels.fused import render_pallas
    from reversible_raytracer_tpu.ops.kernels.fused_vec import render_pallas_vec

    a = np.asarray(render_jnp(scene, cfg))
    b = np.asarray(render_pallas(scene, cfg, interpret=True))
    assert np.abs(a - b).max() < 1e-5
    v = np.asarray(render_pallas_vec(scene, cfg, interpret=True))
    assert np.abs(v - b).max() < 1e-6  # same dense sampler, ulp-level
    # Textures + mirror reflections stay off the UNROLLED kernels (their
    # per-bounce dense-chain replay is traced per object)...
    with pytest.raises(NotImplementedError, match="texture"):
        render_pallas(scene, dataclasses.replace(cfg, reflections=1),
                      interpret=True)
    # ...but run on the vec kernels (round 3: the per-level resolve samples
    # texel tails like level 0). Same dense sampler -> ulp-level vs the
    # jnp path outside half-texel bands.
    cfg_r = dataclasses.replace(cfg, reflections=1)
    vr = np.asarray(render_pallas_vec(scene, cfg_r, interpret=True))
    ar = np.asarray(render_jnp(scene, cfg_r))
    assert np.abs(vr - ar).max() < 1e-5


def _big_textured_scene(n_spheres=40, tex_k=8, size=48):
    """Globe-style textured scene past the unrolled family's threshold —
    the round-3 vec-kernel texture capability."""
    scene, spec, _ = configs.config5_many_spheres(size, n_spheres=n_spheres)
    rng = np.random.default_rng(3)
    tex = jnp.asarray(
        rng.uniform(0.1, 0.9, (scene.spheres.count, tex_k, tex_k, 3)),
        jnp.float32,
    )
    scene = dataclasses.replace(
        scene, spheres=dataclasses.replace(scene.spheres, texture=tex)
    )
    return scene, spec


def test_vec_kernel_textured_fwd_and_step_grads():
    """Object-chunked kernels on a 40-sphere ALL-textured scene:
    forward matches jnp_vec outside boundary pixels / half-texel bands,
    and the fused vec step kernel's (loss, grads) — texel grads included —
    strictly match autodiff of render_pallas_vec (same family)."""
    from test_fused_vec import _edge_mask

    from reversible_raytracer_tpu.ops.kernels.fused_vec import (
        loss_grad_pallas_vec,
        render_pallas_vec,
    )
    from reversible_raytracer_tpu.ops.pipeline_vec import render_jnp_vec

    scene, spec = _big_textured_scene()
    cfg = RenderConfig(height=48, width=64, shadows=True)
    a = np.asarray(render_jnp_vec(scene, cfg))
    v = np.asarray(render_pallas_vec(scene, cfg, interpret=True))
    d = np.abs(a - v).max(axis=-1)
    assert d.max() < 1e-2 and (d > 1e-3).mean() < 1e-3
    e = _edge_mask(a, v)
    assert e.mean() < 0.7 and d[~e].max() < 1e-6

    target = jnp.asarray(a) * 0.92
    start = configs.perturb(scene, spec, scale=0.05, seed=2)
    l_ref, g_ref = jax.value_and_grad(
        lambda s: mse_loss(render_pallas_vec(s, cfg, interpret=True), target)
    )(start)
    l_k, g_k = loss_grad_pallas_vec(start, cfg, target, interpret=True)
    assert abs(float(l_ref) - float(l_k)) <= 1e-5 * max(float(l_ref), 1e-9)
    for (path, x), (_, y) in zip(
        jax.tree_util.tree_flatten_with_path(g_k)[0],
        jax.tree_util.tree_flatten_with_path(g_ref)[0],
    ):
        x, y = np.asarray(x), np.asarray(y)
        if not x.size:
            continue
        scale = max(float(np.abs(y).max()), 1e-10)
        # 5e-5 (was 1e-5): the MXU texel backward (fused_vec._texmix_mxu)
        # re-associates the weight-plane cotangent sums, so the
        # (a,b)->geometry/camera chains accumulate a few extra ulp between
        # the step kernel and AD-of-the-render-kernel. Still strict
        # same-family agreement.
        assert float(np.abs(x - y).max()) <= 5e-5 * scale, (
            path, float(np.abs(x - y).max()))
    assert float(np.abs(np.asarray(g_k.spheres.texture)).max()) > 0.0


def _mirrored_textured_scene(n_spheres=33, tex_k=8, size=48, mirror=0.4):
    """All-textured sphere field with uniformly mirrored materials — the
    round-3 obj-textured+reflections combo at vec scale."""
    scene, spec = _big_textured_scene(
        n_spheres=n_spheres, tex_k=tex_k, size=size
    )
    mat = dataclasses.replace(
        scene.spheres.material,
        mirror=jnp.full_like(scene.spheres.material.mirror, mirror),
    )
    return dataclasses.replace(
        scene, spheres=dataclasses.replace(scene.spheres, material=mat)
    ), spec


def test_vec_kernel_objtex_reflections_fwd_and_step_grads():
    """Round 3 closes the last refused kernel combination: OBJECT-textured
    + mirror reflections runs on the vec family (each bounce level's
    chunk-skipped resolve samples the texel tails dense, the reverse-level
    backward emits per-level texel cotangents). Forward matches jnp_vec
    outside boundary/half-texel bands; the fused step kernel's (loss,
    grads) strictly match autodiff of render_pallas_vec — texel grads
    included and nonzero."""
    from test_fused_vec import _edge_mask

    from reversible_raytracer_tpu.ops.kernels.fused_vec import (
        loss_grad_pallas_vec,
        render_pallas_vec,
    )
    from reversible_raytracer_tpu.ops.pipeline_vec import render_jnp_vec

    scene, spec = _mirrored_textured_scene()
    cfg = RenderConfig(height=32, width=48, shadows=True, reflections=1)
    a = np.asarray(render_jnp_vec(scene, cfg))
    v = np.asarray(render_pallas_vec(scene, cfg, interpret=True))
    d = np.abs(a - v).max(axis=-1)
    assert d.max() < 5e-2 and (d > 1e-3).mean() < 2e-2
    e = _edge_mask(a, v)
    assert e.mean() < 0.7 and d[~e].max() < 1e-5

    target = jnp.asarray(a) * 0.92
    start = configs.perturb(scene, spec, scale=0.05, seed=2)
    l_ref, g_ref = jax.value_and_grad(
        lambda s: mse_loss(render_pallas_vec(s, cfg, interpret=True), target)
    )(start)
    l_k, g_k = loss_grad_pallas_vec(start, cfg, target, interpret=True)
    assert abs(float(l_ref) - float(l_k)) <= 1e-5 * max(float(l_ref), 1e-9)
    for (path, x), (_, y) in zip(
        jax.tree_util.tree_flatten_with_path(g_k)[0],
        jax.tree_util.tree_flatten_with_path(g_ref)[0],
    ):
        x, y = np.asarray(x), np.asarray(y)
        if not x.size:
            continue
        scale = max(float(np.abs(y).max()), 1e-10)
        # 5e-5 (was 1e-5): the MXU texel backward (fused_vec._texmix_mxu)
        # re-associates the weight-plane cotangent sums, so the
        # (a,b)->geometry/camera chains accumulate a few extra ulp between
        # the step kernel and AD-of-the-render-kernel. Still strict
        # same-family agreement.
        assert float(np.abs(x - y).max()) <= 5e-5 * scale, (
            path, float(np.abs(x - y).max()))
    assert float(np.abs(np.asarray(g_k.spheres.texture)).max()) > 0.0
    # Dispatch: under a TPU backend this combo now picks the vec kernels.
    import jax as _jax

    from reversible_raytracer_tpu.ops.render import (
        resolve_impl,
        resolve_step_impl,
    )

    real = _jax.default_backend
    try:
        _jax.default_backend = lambda: "tpu"
        assert resolve_impl(scene, cfg) == "pallas_vec"
        assert resolve_step_impl(scene, cfg) == "step_vec"
    finally:
        _jax.default_backend = real


def test_vec_step_spp4_textured():
    """Textured spp=4 in the vec STEP kernel (in-kernel subsample loop x
    texel-tail sampling): loss and grads match autodiff over the 4-launch
    wrapper render (identical subsample math, one average)."""
    from reversible_raytracer_tpu.ops.kernels.fused_vec import (
        loss_grad_pallas_vec,
        render_pallas_vec,
    )

    scene, spec = _big_textured_scene(n_spheres=18, tex_k=8, size=32)
    cfg4 = RenderConfig(height=24, width=32, shadows=True, spp=4)
    target = jnp.asarray(
        np.asarray(render_pallas_vec(scene, cfg4, interpret=True))
    ) * 0.92
    start = configs.perturb(scene, spec, scale=0.05, seed=2)
    l_r, g_r = jax.value_and_grad(
        lambda s: mse_loss(render_pallas_vec(s, cfg4, interpret=True), target)
    )(start)
    l_k, g_k = loss_grad_pallas_vec(start, cfg4, target, interpret=True)
    assert abs(float(l_r) - float(l_k)) <= 1e-6 * float(l_r)
    for (path, x), (_, y) in zip(
        jax.tree_util.tree_flatten_with_path(g_k)[0],
        jax.tree_util.tree_flatten_with_path(g_r)[0],
    ):
        x, y = np.asarray(x), np.asarray(y)
        if not x.size:
            continue
        scale = max(float(np.abs(y).max()), 1e-10)
        assert float(np.abs(x - y).max()) <= 1e-4 * scale, (
            path, float(np.abs(x - y).max()))
    assert float(np.abs(np.asarray(g_k.spheres.texture)).max()) > 0.0


def test_vec_kernel_texture_smem_budget_refusal(monkeypatch):
    """Texel rows past the ~384 KiB SMEM budget refuse loudly and
    impl='auto' routes to jnp_vec."""
    from reversible_raytracer_tpu.ops.kernels.fused_vec import render_pallas_vec
    from reversible_raytracer_tpu.ops.render import resolve_impl

    scene, _ = _big_textured_scene(n_spheres=40, tex_k=32)  # 48 rows x 3 KiB+
    cfg = RenderConfig(height=32, width=32, shadows=True)
    with pytest.raises(NotImplementedError, match="SMEM"):
        render_pallas_vec(scene, cfg, interpret=True)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolve_impl(scene, cfg) == "jnp_vec"


def test_step_kernel_texture_grads_match_jnp():
    """Fused training-step kernel on a textured scene: loss and texel
    gradients match jax.value_and_grad of the jnp renderer (the in-kernel
    vjp pulls cotangents through the dense sampler into the SMEM texel
    scalars)."""
    from reversible_raytracer_tpu.ops.kernels.fused import loss_grad_pallas

    scene, _, _ = configs.config7_texture(48, tex_k=8)  # small K: trace cost
    H, W = 16, 128
    cfg = RenderConfig(height=H, width=W)
    target = render_jnp(scene, cfg) * 0.9
    l0, g0 = jax.value_and_grad(
        lambda s: mse_loss(render_jnp(s, cfg), target)
    )(scene)
    l1, g1 = loss_grad_pallas(scene, cfg, target, interpret=True)
    assert abs(float(l0) - float(l1)) < 1e-8
    t0 = np.asarray(g0.rects.texture)
    t1 = np.asarray(g1.rects.texture)
    assert np.isfinite(t1).all()
    scale = np.abs(t0).max()
    assert np.abs(t0 - t1).max() < 2e-3 * scale
    # Geometry/camera grads too (through the interpolation weights).
    for name in ("center", "radius"):
        a = np.asarray(getattr(g0.spheres, name))
        b = np.asarray(getattr(g1.spheres, name))
        assert np.abs(a - b).max() < 2e-3 * max(np.abs(a).max(), 1e-12)


def test_untextured_kernel_scalar_view_still_works():
    """The empty texture leaf must pass through the kernels' SMEM scalar
    plan as a sentinel — interpret-mode kernel equals jnp as before."""
    from reversible_raytracer_tpu.ops.kernels.fused import render_pallas

    scene, _, _ = configs.config2_four_spheres(32)
    cfg = RenderConfig(height=16, width=128)
    a = np.asarray(render_jnp(scene, cfg))
    b = np.asarray(render_pallas(scene, cfg, interpret=True))
    # ULP-class accumulation differences only (different fusion choices in
    # the tile-shaped graph).
    assert np.abs(a - b).max() < 1e-4
    assert np.abs(a - b).mean() < 1e-6


def test_texture_grads_match_oracle_fd():
    """Analytic gradients vs f64-oracle central differences: (a) into a
    texel, (b) through the bilinear weights to the camera eye."""
    scene, _ = _tex_scene()
    H = W = 48
    cfg = RenderConfig(height=H, width=W)
    tgt64 = ref.render(scene, H, W) * 0.9
    tgt = jnp.asarray(tgt64, jnp.float32)
    g = jax.grad(lambda s: mse_loss(render_jnp(s, cfg), tgt))(scene)

    def oracle_loss(s):
        return ref.mse_loss(ref.render(s, H, W), tgt64)

    eps = 1e-4
    gt = np.asarray(g.rects.texture)[0]
    # Pick the texel with the largest analytic gradient (clearly visible).
    ti, tj, tc = np.unravel_index(np.abs(gt).argmax(), gt.shape)

    def upd_texel(d):
        t = np.asarray(scene.rects.texture).copy()
        t[0, ti, tj, tc] += d
        return dataclasses.replace(
            scene, rects=dataclasses.replace(scene.rects, texture=jnp.asarray(t))
        )

    fd_t = (oracle_loss(upd_texel(+eps)) - oracle_loss(upd_texel(-eps))) / (2 * eps)
    an_t = float(gt[ti, tj, tc])
    assert abs(an_t - fd_t) / max(abs(fd_t), 1e-9) < 0.02, (an_t, fd_t)

    def upd_eye(d):
        e = np.asarray(scene.camera.eye).copy()
        e[0] += d
        return dataclasses.replace(
            scene, camera=dataclasses.replace(scene.camera, eye=jnp.asarray(e))
        )

    fd_e = (oracle_loss(upd_eye(+eps)) - oracle_loss(upd_eye(-eps))) / (2 * eps)
    an_e = float(np.asarray(g.camera.eye)[0])
    # The camera gradient crosses many bilinear-cell boundaries; FD vs the
    # piecewise-linear analytic value agrees to a few percent at 48^2.
    assert abs(an_e - fd_e) / max(abs(fd_e), 1e-9) < 0.05, (an_e, fd_e)


def test_texture_recovery_converges():
    """Config 7's capability: recover the texel grid from a 40%
    perturbation. Only OBSERVABLE texels (nonzero gradient at the truth)
    can recover — occluded/out-of-view ones have no signal by construction."""
    from reversible_raytracer_tpu.optim import OptConfig, optimize_scan

    scene, spec = _tex_scene()
    cfg = RenderConfig(height=64, width=64)
    target = render_jnp(scene, cfg)
    g = jax.grad(lambda s: mse_loss(render_jnp(s, cfg), target * 0.9))(scene)
    vis = np.abs(np.asarray(g.rects.texture)) > 1e-10
    assert vis.mean() > 0.5  # most of the grid is observable in config 7

    start = configs.perturb(scene, spec, scale=0.4, seed=11)
    final, losses = optimize_scan(
        start, target, spec, cfg,
        OptConfig(iters=200, lr=3e-2, schedule="cosine"),
        cache_key="test-tex-recovery",
    )
    truth = np.asarray(scene.rects.texture)
    err0 = np.sqrt(np.mean((np.asarray(start.rects.texture) - truth)[vis] ** 2))
    err1 = np.sqrt(np.mean((np.asarray(final.rects.texture) - truth)[vis] ** 2))
    assert float(losses[-1]) < 1e-5
    assert err1 < 0.25 * err0, (err0, err1)


def test_sharded_textured_render_matches_single_device():
    """Row-band shard_map composes with texture sampling (the texel grid is
    replicated scene state like every other parameter)."""
    from reversible_raytracer_tpu.parallel import make_ray_mesh
    from reversible_raytracer_tpu.parallel.shard import render_sharded

    scene, _ = _tex_scene()
    cfg = RenderConfig(height=48, width=48)
    mesh = make_ray_mesh()
    a = np.asarray(render_sharded(scene, cfg, mesh, impl="jnp"))
    b = np.asarray(render_jnp(scene, cfg))
    np.testing.assert_array_equal(a, b)


def _globe_scene(seed=0, camera=None, K=12):
    """Textured sphere ('globe') over a plain floor — the sphere-texture
    test scene. ``camera``: override to view the lat-long seam (-x axis)."""
    from reversible_raytracer_tpu.models import scene as S

    rng = np.random.default_rng(seed)
    tex = rng.uniform(0.1, 0.9, size=(K, K, 3)).astype(np.float32)
    sp = S.sphere((0.0, 0.2, 0.0), 1.0, S.Materials.make((1, 1, 1), ks=0.2),
                  texture=tex)
    floor = S.ground_plane(-1.0, 6.0, S.Materials.make((0.8, 0.8, 0.8)))
    cam = camera or S.Camera.make((0, 1.0, 4.0), (0, 0, 0))
    scene = S.Scene.make(
        spheres=sp, rects=floor,
        lights=S.lights([[3.0, 5.0, 3.0]], [[1.0, 1.0, 1.0]]),
        camera=cam,
    )
    spec = S.ParamSpec.none(scene).train("spheres.texture", lower=0.0, upper=1.0)
    return scene, spec


def test_sphere_texture_matches_oracles_including_seam():
    from reversible_raytracer_tpu.models import scene as S

    for cam in (None, S.Camera.make((-4.0, 1.0, 0.0), (0, 0, 0))):
        scene, _ = _globe_scene(camera=cam)
        cfg = RenderConfig(height=48, width=48)
        a = np.asarray(render_jnp(scene, cfg))
        o = ref.render(scene, 48, 48)
        # The -x camera looks straight at the atan2 wrap seam: the wrap
        # addressing must keep all four bilinear corners consistent there.
        assert np.abs(a - o).max() < 1e-3
        assert np.abs(np.asarray(render(scene, cfg, impl="jnp_vec")) - a).max() == 0.0
        if native.available():
            n = native.render(scene, 48, 48)
            assert np.abs(n - o).max() < 1e-12


def test_sphere_texture_grads_flow_and_match_fd():
    scene, _ = _globe_scene()
    H = W = 40
    cfg = RenderConfig(height=H, width=W)
    tgt64 = ref.render(scene, H, W) * 0.9
    tgt = jnp.asarray(tgt64, jnp.float32)
    g = jax.grad(lambda s: mse_loss(render_jnp(s, cfg), tgt))(scene)
    gt = np.asarray(g.spheres.texture)[0]
    assert np.isfinite(gt).all() and (np.abs(gt) > 0).mean() > 0.2

    def oracle_loss(s):
        return ref.mse_loss(ref.render(s, H, W), tgt64)

    ti, tj, tc = np.unravel_index(np.abs(gt).argmax(), gt.shape)
    eps = 1e-4

    def upd(d):
        t = np.asarray(scene.spheres.texture).copy()
        t[0, ti, tj, tc] += d
        return dataclasses.replace(
            scene, spheres=dataclasses.replace(scene.spheres, texture=jnp.asarray(t))
        )

    fd = (oracle_loss(upd(+eps)) - oracle_loss(upd(-eps))) / (2 * eps)
    an = float(gt[ti, tj, tc])
    assert abs(an - fd) / max(abs(fd), 1e-9) < 0.02, (an, fd)


def test_sphere_texture_recovery_converges():
    """Paint the globe: recover the sphere's texel grid from a perturbed
    start (observable texels only — the far hemisphere has no signal)."""
    from reversible_raytracer_tpu.optim import OptConfig, optimize_scan

    scene, spec = _globe_scene()
    cfg = RenderConfig(height=64, width=64)
    target = render_jnp(scene, cfg)
    g = jax.grad(lambda s: mse_loss(render_jnp(s, cfg), target * 0.9))(scene)
    vis = np.abs(np.asarray(g.spheres.texture)) > 1e-10
    assert 0.1 < vis.mean() < 0.9  # roughly the visible hemisphere

    start = configs.perturb(scene, spec, scale=0.4, seed=5)
    final, losses = optimize_scan(
        start, target, spec, cfg,
        OptConfig(iters=200, lr=3e-2, schedule="cosine"),
        cache_key="test-globe-recovery",
    )
    truth = np.asarray(scene.spheres.texture)
    err0 = np.sqrt(np.mean((np.asarray(start.spheres.texture) - truth)[vis] ** 2))
    err1 = np.sqrt(np.mean((np.asarray(final.spheres.texture) - truth)[vis] ** 2))
    assert float(losses[-1]) < 1e-5
    assert err1 < 0.3 * err0, (err0, err1)


def test_unrolled_kernel_renders_sphere_texture_including_seam():
    """Sphere lat-long textures in the unrolled kernel: the dense sampler's
    circular tent on the azimuth axis must agree with the wrap gather,
    including for a camera looking straight at the atan2 seam."""
    from reversible_raytracer_tpu.models import scene as S
    from reversible_raytracer_tpu.ops.kernels.fused import render_pallas

    for cam in (None, S.Camera.make((-4.0, 1.0, 0.0), (0, 0, 0))):
        scene, _ = _globe_scene(camera=cam, K=8)  # small K: trace cost
        cfg = RenderConfig(height=16, width=128)
        a = np.asarray(render_jnp(scene, cfg))
        b = np.asarray(render_pallas(scene, cfg, interpret=True))
        assert np.abs(a - b).max() < 1e-5
    img = np.asarray(render(scene, cfg, impl="auto"))  # auto still works
    assert np.isfinite(img).all()


def test_config8_globe_builds_and_matches_oracles():
    """Pin the config-8 registry entry: textured-sphere scene, texture-only
    ParamSpec, and three-way implementation agreement at a small size."""
    scene, spec, _ = configs.config8_globe(48)
    assert scene.spheres.textured and not scene.rects.textured
    import jax.tree_util as jtu
    trainable = [bool(t) for t in jtu.tree_leaves(spec.trainable)]
    assert sum(trainable) == 1  # only spheres.texture
    cfg = RenderConfig(height=48, width=48)
    a = np.asarray(render_jnp(scene, cfg))
    o = ref.render(scene, 48, 48)
    assert np.abs(a - o).max() < 1e-3
    assert np.abs(np.asarray(render(scene, cfg, impl="jnp_vec")) - a).max() == 0.0
    if native.available():
        assert np.abs(native.render(scene, 48, 48) - o).max() < 1e-12


def test_annealed_textured_stage_routing(monkeypatch):
    """optimize_annealed stage dispatch for textured scenes on TPU:
    since round 4 the SOFT vec kernels take object texel grids too (SMEM
    row tails, shared vec_smem_ok budget), so BOTH the soft stages and
    the hard tau=0 polish run in-kernel; over-budget textures keep every
    stage on jnp_vec. The end-to-end run is exercised with the kernels
    forced to interpret mode."""
    import functools

    from reversible_raytracer_tpu import optim as optim_mod
    from reversible_raytracer_tpu.ops.kernels import fused_vec as FV
    from reversible_raytracer_tpu.ops.kernels import fused_vec_soft as FVS
    from reversible_raytracer_tpu.optim import (
        OptConfig,
        anneal_stage_impl,
        optimize_annealed,
    )

    monkeypatch.setattr(optim_mod.jax, "default_backend", lambda: "tpu")
    scene, spec = _tex_scene(32)
    assert anneal_stage_impl(scene, 0.05) == "pallas_vec_soft"
    assert anneal_stage_impl(scene, 0.0) == "pallas_vec"
    # a budget-blowing texture keeps every stage on jnp_vec
    k = 128
    huge = dataclasses.replace(
        scene, rects=dataclasses.replace(
            scene.rects,
            texture=jnp.zeros((scene.rects.count, k, k, 3), jnp.float32),
        )
    )
    assert anneal_stage_impl(huge, 0.05) == "jnp_vec"
    assert anneal_stage_impl(huge, 0.0) == "jnp_vec"

    for mod, names in (
        (FVS, ("render_pallas_vec_soft", "loss_grad_pallas_vec_soft")),
        (FV, ("render_pallas_vec", "loss_grad_pallas_vec")),
    ):
        for n in names:
            monkeypatch.setattr(
                mod, n, functools.partial(getattr(mod, n), interpret=True)
            )
    cfg = RenderConfig(height=32, width=32)
    target = render_jnp(scene, cfg)
    start = configs.perturb(scene, spec, scale=0.2, seed=1)
    final, losses = optimize_annealed(
        start, target, spec, cfg,
        OptConfig(iters=5, lr=1e-2), taus=(0.05, 0.0), target_scene=scene,
        hard_ocfg=None,
    )
    assert np.isfinite(np.asarray(losses)).all()


def test_sceneio_roundtrip_texture(tmp_path):
    from reversible_raytracer_tpu.utils.sceneio import load_scene, save_scene

    scene, _ = _tex_scene()
    p = str(tmp_path / "scene.json")
    save_scene(p, scene)
    back = load_scene(p, scene)
    np.testing.assert_array_equal(
        np.asarray(back.rects.texture), np.asarray(scene.rects.texture)
    )


def test_auto_dispatch_textured_unrolled_kernel(monkeypatch):
    """impl='auto' routing for textured/env scenes after the TPU
    validation of the dense sampler (scripts/tpu_textured_check.py):
    small textured scenes take the UNROLLED kernel on TPU; reflections,
    spp>1, large VMEM-effective counts, and CPU all stay on jnp paths."""
    from reversible_raytracer_tpu.ops.kernels.fused import tile_object_count
    from reversible_raytracer_tpu.ops.render import resolve_impl

    scene, _ = _tex_scene(32)
    sky, _, cfg9 = configs.config9_sky(32, env_k=8)
    cfg = RenderConfig(height=32, width=32, shadows=True)
    assert tile_object_count(scene, cfg) <= 24  # stays a small-N scene

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolve_impl(scene, cfg) == "pallas"
    assert resolve_impl(sky, dataclasses.replace(cfg9, reflections=0)) == "pallas"
    # env-only reflective scenes run in-kernel (one extra dense env
    # sample per bounce); config 9 as shipped (reflections=1) qualifies
    assert resolve_impl(sky, cfg9) == "pallas"
    # obj-textured reflections refuse the UNROLLED family (per-object
    # dense-chain replay) but ride the vec kernels since round 3:
    assert resolve_impl(
        scene, dataclasses.replace(cfg, reflections=1)
    ) == "pallas_vec"
    # spp=4 textured is validated in-kernel since round 3 (halved
    # VMEM-effective threshold)
    assert resolve_impl(scene, dataclasses.replace(cfg, spp=4)) == "pallas"
    big = dataclasses.replace(
        scene, spheres=configs.config5_many_spheres(32, n_spheres=40)[0].spheres
    )
    # round 3: textured scenes past the unrolled threshold ride the vec
    # kernels (texel row tails) when they fit the SMEM budget
    assert resolve_impl(big, cfg) == "pallas_vec"
    # a texture grid big enough to blow BOTH the VMEM-effective count and
    # the vec family's SMEM row budget: jnp
    k = 128
    huge_tex = jnp.zeros((scene.rects.count, k, k, 3), jnp.float32)
    huge = dataclasses.replace(
        scene, rects=dataclasses.replace(scene.rects, texture=huge_tex)
    )
    assert tile_object_count(huge, cfg) > 24
    assert resolve_impl(huge, cfg) == "jnp"

    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert resolve_impl(scene, cfg) == "jnp"


def test_loss_and_grad_fn_textured_dispatch(monkeypatch):
    """loss_and_grad_fn picks the unrolled step kernel for small textured
    scenes on TPU (validated combo: spp=1, no reflections); everything
    else falls back to value_and_grad."""
    import sys

    import reversible_raytracer_tpu.ops.render  # noqa: F401

    R = sys.modules["reversible_raytracer_tpu.ops.render"]
    scene, _ = _tex_scene(32)
    cfg = RenderConfig(height=32, width=32, shadows=True)

    def kind(fn):
        if "vag" in getattr(fn, "__qualname__", ""):
            return "fallback"
        cells = [
            getattr(c.cell_contents, "__name__", "")
            for c in (fn.__closure__ or ())
        ]
        return "vec" if "loss_grad_pallas_vec" in cells else "unrolled"

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert kind(R.loss_and_grad_fn(scene, cfg)) == "unrolled"
    # round 3: obj-textured reflections route to the VEC step kernel (the
    # unrolled family still refuses the per-object dense-chain replay)
    assert kind(
        R.loss_and_grad_fn(scene, dataclasses.replace(cfg, reflections=1))
    ) == "vec"
    assert kind(
        R.loss_and_grad_fn(scene, dataclasses.replace(cfg, spp=4))
    ) == "unrolled"  # round 3: textured spp=4 validated in-kernel
    big = dataclasses.replace(
        scene, spheres=configs.config5_many_spheres(32, n_spheres=40)[0].spheres
    )
    # round 3: the vec step kernel takes texel row tails within budget
    assert kind(R.loss_and_grad_fn(big, cfg)) == "vec"
    # explicit impl='pallas' is honored for the validated combo
    assert kind(R.loss_and_grad_fn(scene, cfg, impl="pallas")) == "unrolled"
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert kind(R.loss_and_grad_fn(scene, cfg)) == "fallback"


def test_vec_kernel_tex_chunk_bitwise_invariant():
    """VecTileConfig.tex_chunk (round 4: finer chunk-skip granularity for
    texel-bearing groups) is a pure scheduling knob: render AND fused-step
    loss/grads are BITWISE identical at any divisor of CHUNK (disjoint
    kbest masks; skipped chunks' vjps are exactly zero)."""
    import dataclasses

    from reversible_raytracer_tpu.ops.kernels.fused_vec import (
        VecTileConfig,
        auto_tiles,
        loss_grad_pallas_vec,
        render_pallas_vec,
    )

    scene, spec = _big_textured_scene()
    cfg = RenderConfig(height=48, width=64, shadows=True)
    target = jnp.asarray(np.linspace(0, 1, 48 * 64 * 3, dtype=np.float32)
                         .reshape(48, 64, 3))
    base_tiles = auto_tiles(scene, cfg, None)
    ref_img = None
    ref = None
    for c in (16, 4, 1):
        tiles = dataclasses.replace(base_tiles, tex_chunk=c)
        img = np.asarray(render_pallas_vec(scene, cfg, tiles=tiles,
                                           interpret=True))
        l, g = loss_grad_pallas_vec(scene, cfg, target, tiles=tiles,
                                    interpret=True)
        if ref is None:
            ref_img, ref = img, (float(l), g)
            continue
        np.testing.assert_array_equal(img, ref_img)
        assert float(l) == ref[0]
        for a, b in zip(jax.tree_util.tree_leaves(g),
                        jax.tree_util.tree_leaves(ref[1])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_texel_backward_mxu_backend_matches_vjp(monkeypatch):
    """The flagged MXU texel-cotangent backend (RRT_TEXBWD=mxu — the
    round-5 measured attempt at the textured-backward gap; a perf wash
    on v5e but kept as the proven formulation) must stay grad-exact vs
    the default auto-vjp reductions. Distinct image size so the kernel
    cache cannot serve a trace from the other backend."""
    import dataclasses

    from reversible_raytracer_tpu.ops.kernels import fused_vec
    from reversible_raytracer_tpu.ops.kernels.fused_vec import (
        loss_grad_pallas_vec,
    )
    from reversible_raytracer_tpu.ops.pipeline_vec import render_jnp_vec

    scene, spec = _big_textured_scene(n_spheres=17, tex_k=8, size=40)
    cfg = RenderConfig(height=40, width=56, shadows=True)
    target = jnp.asarray(np.asarray(render_jnp_vec(scene, cfg))) * 0.92

    monkeypatch.setattr(fused_vec, "_TEXEL_BWD", "vjp")
    l_v, g_v = loss_grad_pallas_vec(scene, cfg, target, interpret=True)
    monkeypatch.setattr(fused_vec, "_TEXEL_BWD", "mxu")
    l_m, g_m = loss_grad_pallas_vec(scene, cfg, target, interpret=True)
    assert float(l_v) == float(l_m)  # identical forward
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_v)[0],
        jax.tree_util.tree_flatten_with_path(g_m)[0],
    ):
        a, b = np.asarray(a), np.asarray(b)
        if not a.size:
            continue
        scale = max(np.abs(a).max(), 1e-10)
        np.testing.assert_allclose(a, b, atol=1e-5 * scale,
                                   err_msg=str(path))
    assert np.abs(np.asarray(g_m.spheres.texture)).max() > 0.0


def test_env_backward_mxu_backend_matches_vjp(monkeypatch):
    """Round 5: the ENV dense sample routes through the custom-vjp
    backend (miss_color's env_dense_fn hook, RRT_ENVBWD — DEFAULT mxu:
    it dissolves the round-4 scoped-vmem K-walls), in BOTH vec families.
    Grads must match the legacy auto-vjp backend."""
    import dataclasses

    from reversible_raytracer_tpu.ops.kernels import fused_vec
    from reversible_raytracer_tpu.ops.kernels.fused_vec import (
        loss_grad_pallas_vec,
    )
    from reversible_raytracer_tpu.ops.kernels.fused_vec_soft import (
        loss_grad_pallas_vec_soft,
    )
    from reversible_raytracer_tpu.ops.pipeline_vec import render_jnp_vec

    scene, spec, _ = configs.config5_many_spheres(40, n_spheres=9)
    rng = np.random.default_rng(3)
    env = jnp.asarray(rng.uniform(0.1, 0.9, (8, 8, 3)), jnp.float32)
    scene = dataclasses.replace(scene, env=env)

    for fam, lg, cfg in (
        ("hard", lambda s, c, t: loss_grad_pallas_vec(s, c, t,
                                                      interpret=True),
         RenderConfig(height=40, width=48, shadows=True)),
        ("soft", lambda s, c, t: loss_grad_pallas_vec_soft(s, c, t,
                                                           interpret=True),
         RenderConfig(height=40, width=48, shadows=True, soft_tau=0.05)),
    ):
        target = jnp.asarray(np.asarray(render_jnp_vec(scene, cfg))) * 0.92
        monkeypatch.setattr(fused_vec, "_ENV_BWD", "vjp")
        l_v, g_v = lg(scene, cfg, target)
        monkeypatch.setattr(fused_vec, "_ENV_BWD", "mxu")
        l_m, g_m = lg(scene, cfg, target)
        assert float(l_v) == float(l_m), fam
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_v)[0],
            jax.tree_util.tree_flatten_with_path(g_m)[0],
        ):
            a, b = np.asarray(a), np.asarray(b)
            if not a.size:
                continue
            scale = max(np.abs(a).max(), 1e-10)
            np.testing.assert_allclose(a, b, atol=1e-5 * scale,
                                       err_msg=f"{fam} {path}")
        assert np.abs(np.asarray(g_m.env)).max() > 0.0, fam
