"""Soft-visibility Pallas kernels (ops/kernels/fused_vec_soft.py):
interpret-mode fidelity vs pipeline_vec._render_soft, forward and the
hand-planned backward (two-layer compositing, soft-shadow product
transpose via chunked exclusive products).

Soft products reduce in a different association order than XLA's reduce
and layer ranking amplifies ULP t differences at silhouettes, so parity is
allclose-grade with the same boundary-masked methodology as the hard
kernels (tests/test_fused_vec.py): stable pixels ~1e-5, flips bounded.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reversible_raytracer_tpu.models import configs
from reversible_raytracer_tpu.ops.kernels.fused_vec_soft import render_pallas_vec_soft
from reversible_raytracer_tpu.ops.pipeline import RenderConfig
from reversible_raytracer_tpu.ops.pipeline_vec import render_jnp_vec
from test_fused_vec import _edge_mask


@pytest.mark.parametrize("tau", [0.08, 0.02])
def test_soft_fwd_matches_jnp_vec(tau):
    scene, _, _ = configs.config5_many_spheres(64, n_spheres=16)
    for shadows in (True, False):
        cfg = RenderConfig(height=64, width=64, shadows=shadows, soft_tau=tau)
        a = np.asarray(render_jnp_vec(scene, cfg))
        b = np.asarray(render_pallas_vec_soft(scene, cfg, interpret=True))
        stable = ~_edge_mask(a, b)
        assert stable.mean() > 0.3
        assert np.abs(a - b)[stable].max() < 1e-3, f"tau={tau} shadows={shadows}"
        assert np.abs(a - b)[stable].mean() < 1e-6
        assert (np.abs(a - b).max(-1) > 1e-3).mean() < 2e-2


def test_soft_bwd_matches_jnp_vec_masked():
    """Masked-loss gradient parity: excluding layer-decision boundary
    pixels, the hand-planned backward (S-vjp + shadow-product transpose +
    per-object masked vjps) and XLA autodiff of the jnp soft path are
    mathematically identical."""
    scene, spec, _ = configs.config5_many_spheres(48, n_spheres=12)
    cfg = RenderConfig(height=48, width=48, shadows=True, soft_tau=0.05)
    img_v = np.asarray(render_jnp_vec(scene, cfg))
    img_p = np.asarray(render_pallas_vec_soft(scene, cfg, interpret=True))
    w = jnp.asarray(~_edge_mask(img_v, img_p), jnp.float32)[..., None]
    target = jnp.zeros((48, 48, 3), jnp.float32)

    def loss(render):
        return lambda s: jnp.sum(w * (render(s) - target) ** 2)

    gv = jax.grad(loss(lambda s: render_jnp_vec(s, cfg)))(scene)
    gp = jax.grad(loss(lambda s: render_pallas_vec_soft(s, cfg, interpret=True)))(scene)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(gv)[0],
        jax.tree_util.tree_flatten_with_path(gp)[0],
    ):
        a, b = np.asarray(a), np.asarray(b)
        if not a.size:
            continue
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=2e-5 * scale, err_msg=str(path))


def test_soft_bwd_no_shadows():
    """The shadows=False path skips the occlusion transpose entirely."""
    scene, spec, _ = configs.config5_many_spheres(48, n_spheres=8)
    cfg = RenderConfig(height=48, width=48, shadows=False, soft_tau=0.05)
    img_v = np.asarray(render_jnp_vec(scene, cfg))
    img_p = np.asarray(render_pallas_vec_soft(scene, cfg, interpret=True))
    w = jnp.asarray(~_edge_mask(img_v, img_p), jnp.float32)[..., None]
    target = jnp.zeros((48, 48, 3), jnp.float32)

    def loss(render):
        return lambda s: jnp.sum(w * (render(s) - target) ** 2)

    gv = jax.grad(loss(lambda s: render_jnp_vec(s, cfg)))(scene)
    gp = jax.grad(loss(lambda s: render_pallas_vec_soft(s, cfg, interpret=True)))(scene)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(gv)[0],
        jax.tree_util.tree_flatten_with_path(gp)[0],
    ):
        a, b = np.asarray(a), np.asarray(b)
        if not a.size:
            continue
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=2e-5 * scale, err_msg=str(path))


def test_soft_trace_is_object_count_independent():
    cfg = RenderConfig(height=16, width=128, shadows=True, soft_tau=0.05)

    def n_eqns(n):
        scene, _, _ = configs.config5_many_spheres(16, n_spheres=n)
        jaxpr = jax.make_jaxpr(
            lambda s: render_pallas_vec_soft(s, cfg, interpret=True)
        )(scene)
        return len(str(jaxpr))

    assert abs(n_eqns(64) - n_eqns(8)) < 0.02 * n_eqns(8)


def test_soft_requires_tau():
    scene, _, _ = configs.config5_many_spheres(32, n_spheres=4)
    cfg = RenderConfig(height=32, width=32, soft_tau=0.0)
    with pytest.raises(ValueError):
        render_pallas_vec_soft(scene, cfg, interpret=True)


def test_soft_band_offsets():
    scene, _, _ = configs.config5_many_spheres(64, n_spheres=8)
    cfg = RenderConfig(height=64, width=64, shadows=True, soft_tau=0.05)
    full = np.asarray(render_pallas_vec_soft(scene, cfg, interpret=True))
    band = np.asarray(
        render_pallas_vec_soft(scene, cfg, row0=16.0, out_height=16, interpret=True)
    )
    np.testing.assert_array_equal(band, full[16:32])


def _env_scene(size=48, n_spheres=10, k=8):
    """config-5 geometry under a smooth procedural sky — the soft-anneal ×
    env-map capability product (round 3: fused_vec_soft takes env maps).
    The camera is tilted toward the horizon so part of the view MISSES
    everything (env gradients need miss pixels; config 5's native
    camera looks down onto its 30-unit floor)."""
    import dataclasses

    from reversible_raytracer_tpu.models.scene import Camera

    scene, spec, _ = configs.config5_many_spheres(size, n_spheres=n_spheres)
    ii, jj = np.meshgrid(
        np.linspace(0, 1, k), np.linspace(0, 1, k), indexing="ij"
    )
    env = np.stack(
        [0.2 + 0.5 * ii, 0.3 + 0.3 * jj, 0.6 - 0.3 * ii], axis=-1
    ).astype(np.float32)
    cam = Camera.make((0.0, 1.5, 9.5), (0.0, 2.5, 0.0), fov_deg=60.0)
    return dataclasses.replace(
        scene, camera=cam, env=jnp.asarray(env)
    ), spec


def test_soft_env_fwd_matches_jnp_vec():
    """Env-mapped soft rendering: the kernel's compositor blends against
    the per-pixel miss_color env sample, exactly like _render_soft."""
    scene, _ = _env_scene()
    cfg = RenderConfig(height=48, width=48, shadows=True, soft_tau=0.05)
    a = np.asarray(render_jnp_vec(scene, cfg))
    b = np.asarray(render_pallas_vec_soft(scene, cfg, interpret=True))
    stable = ~_edge_mask(a, b)
    assert stable.mean() > 0.3
    assert np.abs(a - b)[stable].max() < 1e-3
    assert np.abs(a - b)[stable].mean() < 1e-6
    # the sky must actually show through (env != flat background)
    assert np.asarray(a).std(axis=(0, 1)).max() > 1e-3


def test_soft_env_bwd_matches_jnp_vec_masked():
    """Gradient parity on an env-mapped soft scene — including the env
    texel leaf (cotangents flow through the S-stage vjp's flat globals)."""
    scene, _ = _env_scene()
    cfg = RenderConfig(height=48, width=48, shadows=True, soft_tau=0.05)
    img_v = np.asarray(render_jnp_vec(scene, cfg))
    img_p = np.asarray(render_pallas_vec_soft(scene, cfg, interpret=True))
    w = jnp.asarray(~_edge_mask(img_v, img_p), jnp.float32)[..., None]
    target = jnp.zeros((48, 48, 3), jnp.float32)

    def loss(render):
        return lambda s: jnp.sum(w * (render(s) - target) ** 2)

    gv = jax.grad(loss(lambda s: render_jnp_vec(s, cfg)))(scene)
    gp = jax.grad(loss(lambda s: render_pallas_vec_soft(s, cfg, interpret=True)))(scene)
    assert np.abs(np.asarray(gv.env)).max() > 0.0, "env must receive gradient"
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(gv)[0],
        jax.tree_util.tree_flatten_with_path(gp)[0],
    ):
        a, b = np.asarray(a), np.asarray(b)
        if not a.size:
            continue
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=2e-5 * scale, err_msg=str(path))


def test_soft_env_step_kernel_matches_ad():
    """The fused soft TRAINING-STEP kernel on an env scene vs autodiff of
    the soft render kernel: strict agreement (same trace, cotangent formed
    in-kernel from the residual)."""
    from reversible_raytracer_tpu.ops.kernels.fused_vec_soft import (
        loss_grad_pallas_vec_soft,
    )
    from reversible_raytracer_tpu.ops.render import mse_loss

    scene, spec = _env_scene()
    cfg = RenderConfig(height=40, width=72, shadows=True, soft_tau=0.05)
    start = configs.perturb(scene, spec, scale=0.05, seed=3)
    target = jnp.asarray(
        np.asarray(render_pallas_vec_soft(scene, cfg, interpret=True))
    )
    l_ref, g_ref = jax.value_and_grad(
        lambda s: mse_loss(render_pallas_vec_soft(s, cfg, interpret=True), target)
    )(start)
    l_f, g_f = loss_grad_pallas_vec_soft(start, cfg, target, interpret=True)
    assert abs(float(l_ref) - float(l_f)) <= 1e-5 * max(float(l_ref), 1e-9)
    assert np.abs(np.asarray(g_f.env)).max() > 0.0
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_ref)[0],
        jax.tree_util.tree_flatten_with_path(g_f)[0],
    ):
        a, b = np.asarray(a), np.asarray(b)
        if not a.size:
            continue
        scale = max(np.abs(a).max(), 1e-9)
        np.testing.assert_allclose(a, b, atol=1e-4 * scale, err_msg=str(path))


def test_soft_env_routing(monkeypatch):
    """Dispatch: env-mapped soft scenes take the soft vec kernels on TPU
    up to the K <= 32 shared boundary under the round-5 default env
    backend (RRT_ENVBWD=mxu dissolved the round-4 row-independent
    scoped-vmem term); the legacy vjp backend keeps the stricter K <= 24
    cap. Oversized env maps stay on jnp_vec. Both resolve_impl and
    anneal_stage_impl agree."""
    import dataclasses

    from reversible_raytracer_tpu import optim as optim_mod
    from reversible_raytracer_tpu.ops.kernels import fused_vec
    from reversible_raytracer_tpu.ops.render import resolve_impl
    from reversible_raytracer_tpu.optim import anneal_stage_impl

    scene, _ = _env_scene()
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(optim_mod.jax, "default_backend", lambda: "tpu")
    cfg = RenderConfig(height=32, width=32, soft_tau=0.05)
    assert resolve_impl(scene, cfg) == "pallas_vec_soft"
    assert anneal_stage_impl(scene, 0.05) == "pallas_vec_soft"
    at_cap = dataclasses.replace(
        scene, env=jnp.zeros((24, 24, 3), jnp.float32)
    )
    assert resolve_impl(at_cap, cfg) == "pallas_vec_soft"
    k32 = dataclasses.replace(
        scene, env=jnp.zeros((32, 32, 3), jnp.float32)
    )
    assert resolve_impl(k32, cfg) == "pallas_vec_soft"  # round-5 capability
    assert anneal_stage_impl(k32, 0.05) == "pallas_vec_soft"
    monkeypatch.setattr(fused_vec, "_ENV_BWD", "vjp")
    assert resolve_impl(k32, cfg) == "jnp_vec"
    assert anneal_stage_impl(k32, 0.05) == "jnp_vec"
    monkeypatch.setattr(fused_vec, "_ENV_BWD", "mxu")
    huge = dataclasses.replace(
        scene, env=jnp.zeros((64, 64, 3), jnp.float32)
    )
    assert resolve_impl(huge, cfg) == "jnp_vec"
    assert anneal_stage_impl(huge, 0.05) == "jnp_vec"


def test_annealed_env_soft_kernel_stages(monkeypatch):
    """optimize_annealed on an env-mapped scene routes the SOFT stages to
    the soft vec kernels (round 3) and the hard polish to fused_vec —
    end-to-end with the kernels forced to interpret mode."""
    import dataclasses
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
    scene, spec = _env_scene(size=32, n_spheres=6)
    assert anneal_stage_impl(scene, 0.05) == "pallas_vec_soft"
    assert anneal_stage_impl(scene, 0.0) == "pallas_vec"
    for mod, names in (
        (FVS, ("render_pallas_vec_soft", "loss_grad_pallas_vec_soft")),
        (FV, ("render_pallas_vec", "loss_grad_pallas_vec")),
    ):
        for n in names:
            monkeypatch.setattr(
                mod, n, functools.partial(getattr(mod, n), interpret=True)
            )
    cfg = RenderConfig(height=32, width=32, shadows=True)
    target = render_jnp_vec(scene, cfg)
    start = configs.perturb(scene, spec, scale=0.1, seed=1)
    final, losses = optimize_annealed(
        start, target, spec, cfg,
        OptConfig(iters=4, lr=1e-2), taus=(0.05, 0.0), target_scene=scene,
        hard_ocfg=None,
    )
    assert np.isfinite(np.asarray(losses)).all()


def _textured_soft_scene(size=48, n_spheres=10, k=8, seed=5, smooth=False):
    """Sphere field with per-object texel grids — the round-4 soft ×
    object-texture capability product. ``smooth=True`` switches to the
    config-2 geometry (4 LARGE spheres) with low-contrast gradient
    textures: the boundary-masked gradient tests need textured sphere
    INTERIORS to count as stable pixels, and config-5's spheres at test
    sizes are so small that silhouette dilation masks them whole
    (measured: all-zero texel grads in BOTH paths at 40-48^2 regardless
    of texture contrast)."""
    import dataclasses

    rng = np.random.default_rng(seed)
    if smooth:
        scene, spec, _ = configs.config2_four_spheres(size)
        ii, jj = np.meshgrid(np.linspace(0, 1, k), np.linspace(0, 1, k),
                             indexing="ij")
        base = np.stack([0.35 + 0.1 * ii, 0.4 + 0.08 * jj,
                         0.45 - 0.08 * ii], axis=-1)
        per = rng.uniform(0.9, 1.1, (scene.spheres.count, 1, 1, 1))
        tex = jnp.asarray(base[None] * per, jnp.float32)
    else:
        scene, spec, _ = configs.config5_many_spheres(size, n_spheres=n_spheres)
        tex = jnp.asarray(
            rng.uniform(0.1, 0.9, (scene.spheres.count, k, k, 3)), jnp.float32
        )
    return dataclasses.replace(
        scene, spheres=dataclasses.replace(scene.spheres, texture=tex)
    ), spec


def test_soft_textured_fwd_matches_jnp_vec():
    """Round 4: OBJECT texel grids in the soft kernels (SMEM row tails,
    like fused_vec) — forward vs the jnp_vec soft compositor. Textured
    rows sample dense (hat-basis) vs jnp's gather: identical away from
    half-texel edge bands, so the textured tolerance class applies on top
    of the usual soft boundary masking."""
    scene, _ = _textured_soft_scene()
    cfg = RenderConfig(height=48, width=48, shadows=True, soft_tau=0.05)
    a = np.asarray(render_jnp_vec(scene, cfg))
    b = np.asarray(render_pallas_vec_soft(scene, cfg, interpret=True))
    stable = ~_edge_mask(a, b)
    assert stable.mean() > 0.3
    assert np.abs(a - b)[stable].max() < 1e-3
    assert (np.abs(a - b).max(-1) > 1e-3).mean() < 2e-2


def test_soft_textured_step_kernel_matches_ad():
    """The fused soft TRAINING-STEP kernel on an object-textured scene vs
    autodiff of the soft render kernel: strict agreement incl. the texel
    cotangents emitted through the per-object dpv write-back."""
    from reversible_raytracer_tpu.ops.kernels.fused_vec_soft import (
        loss_grad_pallas_vec_soft,
    )
    from reversible_raytracer_tpu.ops.render import mse_loss

    scene, spec = _textured_soft_scene(n_spheres=8)
    cfg = RenderConfig(height=40, width=72, shadows=True, soft_tau=0.05)
    start = configs.perturb(scene, spec, scale=0.05, seed=3)
    target = jnp.asarray(
        np.asarray(render_pallas_vec_soft(scene, cfg, interpret=True))
    )
    l_ref, g_ref = jax.value_and_grad(
        lambda s: mse_loss(render_pallas_vec_soft(s, cfg, interpret=True), target)
    )(start)
    l_f, g_f = loss_grad_pallas_vec_soft(start, cfg, target, interpret=True)
    assert abs(float(l_ref) - float(l_f)) <= 1e-5 * max(float(l_ref), 1e-9)
    assert np.abs(np.asarray(g_f.spheres.texture)).max() > 0.0
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_ref)[0],
        jax.tree_util.tree_flatten_with_path(g_f)[0],
    ):
        a, b = np.asarray(a), np.asarray(b)
        if not a.size:
            continue
        scale = max(np.abs(a).max(), 1e-9)
        np.testing.assert_allclose(a, b, atol=1e-4 * scale, err_msg=str(path))


def test_soft_textured_texel_grads_match_jnp_vec():
    """TEXEL-gradient parity vs XLA autodiff of the jnp_vec soft path.

    The boundary-masked methodology of the other bwd tests cannot be used
    here: texel gradients live on textured sphere INTERIORS, and at test
    sizes the edge mask (limb-shading discontinuities + dilation) covers
    the spheres whole — measured: the MASKED texel gradient is exactly
    zero in BOTH paths, making a masked comparison vacuous. Instead the
    texture leaf is compared UNMASKED: each texel's gradient is a
    reduction over many interior pixels, so the sparse boundary-flip
    pixels that the mask would have removed contribute only a small
    relative error (tolerance 2e-3 of the leaf max). The other leaves'
    parity is covered by the masked untextured test and by the strict
    kernel-vs-kernel-AD step test above."""
    scene, spec = _textured_soft_scene(smooth=True)
    cfg = RenderConfig(height=48, width=48, shadows=True, soft_tau=0.05)
    target = jnp.zeros((48, 48, 3), jnp.float32)

    def loss(render):
        return lambda s: jnp.sum((render(s) - target) ** 2)

    gv = jax.grad(loss(lambda s: render_jnp_vec(s, cfg)))(scene)
    gp = jax.grad(
        loss(lambda s: render_pallas_vec_soft(s, cfg, interpret=True))
    )(scene)
    a = np.asarray(gv.spheres.texture)
    b = np.asarray(gp.spheres.texture)
    assert np.abs(a).max() > 0.0 and np.abs(b).max() > 0.0
    np.testing.assert_allclose(a, b, atol=2e-3 * np.abs(a).max())


def test_soft_refuses_over_budget_textures():
    """Texel row plans past the probed SMEM budget still refuse loudly
    (vec_smem_ok — shared with the hard family); in-budget object
    textures are SUPPORTED since round 4."""
    import dataclasses

    scene, _ = _env_scene(n_spheres=64)
    k = 32  # 64 rows x (17 + 3072) scalars ~ 772 KiB >> 384 KiB budget
    tex = jnp.ones((scene.spheres.count, k, k, 3), jnp.float32) * 0.5
    textured = dataclasses.replace(
        scene, spheres=dataclasses.replace(scene.spheres, texture=tex)
    )
    cfg = RenderConfig(height=16, width=16, soft_tau=0.05)
    with pytest.raises(NotImplementedError):
        render_pallas_vec_soft(textured, cfg, interpret=True)


def test_soft_sharded_band_rendering():
    """Soft rendering under the row-band shard_map (jnp_vec path on the
    fake CPU mesh; the pallas_vec_soft band contract is pinned by
    test_soft_band_offsets and shares _band_render_fn dispatch)."""
    from reversible_raytracer_tpu.parallel import make_ray_mesh, render_sharded

    scene, _, _ = configs.config5_many_spheres(64, n_spheres=8)
    cfg = RenderConfig(height=64, width=64, shadows=True, soft_tau=0.05)
    mesh = make_ray_mesh(8)
    a = np.asarray(render_sharded(scene, cfg, mesh, impl="jnp_vec"))
    b = np.asarray(render_jnp_vec(scene, cfg))
    np.testing.assert_array_equal(a, b)


def test_soft_spp4_stage_dispatch_and_semantics():
    """VERDICT r4 #7: pin what an annealed spp=4 inversion's SOFT stages
    do. The decision (optim.anneal_stage_uses_step): hard vec stages fuse
    spp in {1,4} into the step kernel; soft stages fuse ONLY spp=1 — a
    spp=4 soft stage falls through to value_and_grad over the 4-launch
    wrapper-averaged soft render (semantically exact: residual of the
    post-clip subsample average, formed by XLA outside the kernels).
    Also pins: the soft step factory refuses spp=4 loudly, the spp=4
    soft render wrapper matches jnp_vec, and the fall-through vag's
    (loss, grads) match XLA autodiff of the jnp_vec soft path."""
    import dataclasses

    from reversible_raytracer_tpu.optim import anneal_stage_uses_step
    from reversible_raytracer_tpu.ops.kernels.fused_vec_soft import (
        loss_grad_pallas_vec_soft,
    )
    from reversible_raytracer_tpu.ops.render import mse_loss

    assert anneal_stage_uses_step("pallas_vec", 1)
    assert anneal_stage_uses_step("pallas_vec", 4)
    assert anneal_stage_uses_step("pallas_vec_soft", 1)
    assert not anneal_stage_uses_step("pallas_vec_soft", 4)
    assert not anneal_stage_uses_step("jnp_vec", 1)

    scene, _, _ = configs.config5_many_spheres(64, n_spheres=9)
    cfg4 = RenderConfig(height=32, width=64, shadows=True, soft_tau=0.05,
                        spp=4)
    target = jnp.zeros((32, 64, 3), jnp.float32)
    with pytest.raises(NotImplementedError, match="spp=1"):
        loss_grad_pallas_vec_soft(scene, cfg4, target, interpret=True)

    # The fall-through path: AD over the wrapper-averaged soft render
    # (kernels in interpret mode) vs AD of the jnp_vec soft path.
    tgt = jnp.asarray(np.asarray(render_jnp_vec(scene, cfg4))) * 0.9
    l_k, g_k = jax.value_and_grad(
        lambda s: mse_loss(render_pallas_vec_soft(s, cfg4, interpret=True),
                           tgt)
    )(scene)
    l_r, g_r = jax.value_and_grad(
        lambda s: mse_loss(render_jnp_vec(s, cfg4), tgt)
    )(scene)
    assert abs(float(l_k) - float(l_r)) <= 1e-4 * max(float(l_r), 1e-9)
    for (path, x), (_, y) in zip(
        jax.tree_util.tree_flatten_with_path(g_k)[0],
        jax.tree_util.tree_flatten_with_path(g_r)[0],
    ):
        x, y = np.asarray(x), np.asarray(y)
        if not x.size:
            continue
        scale = max(float(np.abs(y).max()), 1e-8)
        np.testing.assert_allclose(x, y, atol=3e-2 * scale,
                                   err_msg=str(path))
