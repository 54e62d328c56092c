"""Fused training-step kernel (loss + gradients in one Pallas launch).

`loss_grad_pallas` (ops/kernels/fused.py) replaces the per-step
value_and_grad chain (fwd kernel -> HBM image -> residual -> bwd kernel)
with a single kernel that forms the residual against the target tile in
VMEM and pulls the cotangent straight back through the in-kernel vjp.

Fidelity triangulation (SURVEY.md §4.2):
- vs value_and_grad of mse(render_pallas interpret): both trace the SAME
  `render_tile` under the same interpret-mode arithmetic, so agreement is
  strict (~1e-5 of group scale) — tiling of the loss reduction is the only
  difference and it is elementwise before the reduce.
- vs value_and_grad of mse(render_jnp): XLA's fused graph makes different
  FMA contraction choices, flipping a handful of boundary pixels' hit
  decisions — 1% group tolerance, same as the render-kernel grad tests
  (tests/test_cli_and_io.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from reversible_raytracer_tpu.models import configs
from reversible_raytracer_tpu.ops.kernels.fused import loss_grad_pallas
from reversible_raytracer_tpu.ops.pipeline import RenderConfig
from reversible_raytracer_tpu.ops.render import (
    mse_loss,
    render_jnp,
    sum_squared_loss,
)


def _tree_cmp(ga, gb, rel):
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(ga)[0],
        jax.tree_util.tree_flatten_with_path(gb)[0],
    ):
        a, b = np.asarray(a), np.asarray(b)
        if not a.size:
            continue
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=rel * scale, err_msg=str(path))


def test_loss_grad_matches_jnp_vag():
    scene, spec, _ = configs.config2_four_spheres()
    # Unaligned H/W exercises the canvas-pad masking (padded pixels must
    # contribute exactly zero loss and gradient).
    cfg = RenderConfig(height=40, width=72, shadows=True)
    start = configs.perturb(scene, spec, scale=0.1, seed=4)
    target = jnp.asarray(np.asarray(render_jnp(scene, cfg)))

    l_ref, g_ref = jax.value_and_grad(
        lambda s: mse_loss(render_jnp(s, cfg), target)
    )(start)
    l_f, g_f = loss_grad_pallas(start, cfg, target, loss="mse", interpret=True)
    assert abs(float(l_ref) - float(l_f)) <= 1e-5 * max(float(l_ref), 1e-9)
    _tree_cmp(g_ref, g_f, 1e-2)


def test_loss_grad_matches_pallas_vag_strict():
    from reversible_raytracer_tpu.ops.kernels.fused import render_pallas

    scene, spec, _ = configs.config2_four_spheres()
    cfg = RenderConfig(height=40, width=72, shadows=True)
    start = configs.perturb(scene, spec, scale=0.1, seed=4)
    target = jnp.asarray(np.asarray(render_jnp(scene, cfg)))

    l_ref, g_ref = jax.value_and_grad(
        lambda s: mse_loss(render_pallas(s, cfg, interpret=True), target)
    )(start)
    l_f, g_f = loss_grad_pallas(start, cfg, target, loss="mse", interpret=True)
    assert abs(float(l_ref) - float(l_f)) <= 1e-5 * max(float(l_ref), 1e-9)
    _tree_cmp(g_ref, g_f, 1e-5)


def test_sum_loss_scaling():
    scene, spec, _ = configs.config1_single_sphere()
    cfg = RenderConfig(height=32, width=32, shadows=False)
    start = configs.perturb(scene, spec, scale=0.1, seed=1)
    target = jnp.zeros((32, 32, 3), jnp.float32)

    l_ref, g_ref = jax.value_and_grad(
        lambda s: sum_squared_loss(render_jnp(s, cfg), target)
    )(start)
    l_f, g_f = loss_grad_pallas(start, cfg, target, loss="sum", interpret=True)
    assert abs(float(l_ref) - float(l_f)) <= 1e-4 * max(float(l_ref), 1e-9)
    _tree_cmp(g_ref, g_f, 1e-2)


def test_spp4():
    scene, spec, _ = configs.config1_single_sphere()
    cfg = RenderConfig(height=24, width=32, shadows=True, spp=4)
    start = configs.perturb(scene, spec, scale=0.1, seed=2)
    target = jnp.asarray(np.asarray(render_jnp(scene, cfg)))

    l_ref, g_ref = jax.value_and_grad(
        lambda s: mse_loss(render_jnp(s, cfg), target)
    )(start)
    l_f, g_f = loss_grad_pallas(start, cfg, target, interpret=True)
    assert abs(float(l_ref) - float(l_f)) <= 1e-5 * max(float(l_ref), 1e-9)
    _tree_cmp(g_ref, g_f, 1e-2)


def test_vec_step_strict_vs_pallas_vec_ad():
    """Object-chunked step kernel vs autodiff of render_pallas_vec (same
    kernel family, same replay semantics): strict agreement."""
    from reversible_raytracer_tpu.ops.kernels.fused_vec import (
        loss_grad_pallas_vec,
        render_pallas_vec,
    )
    from reversible_raytracer_tpu.ops.pipeline_vec import render_jnp_vec

    scene, spec, _ = configs.config5_many_spheres(64, n_spheres=33)
    cfg = RenderConfig(height=40, width=72, shadows=True)
    start = configs.perturb(scene, spec, scale=0.05, seed=3)
    target = jnp.asarray(np.asarray(render_jnp_vec(scene, cfg)))

    l_ref, g_ref = jax.value_and_grad(
        lambda s: mse_loss(render_pallas_vec(s, cfg, interpret=True), target)
    )(start)
    l_f, g_f = loss_grad_pallas_vec(start, cfg, target, interpret=True)
    assert abs(float(l_ref) - float(l_f)) <= 1e-5 * max(float(l_ref), 1e-9)
    _tree_cmp(g_ref, g_f, 1e-5)


def test_vec_step_vs_jnp_vec():
    """Same step vs XLA autodiff of the jnp_vec path: 3% group tolerance
    (dense boundary-pixel population at this scene/image scale — same
    class as tests/test_fused_vec.py's full-image comparisons; the strict
    check above pins the kernel's own correctness)."""
    from reversible_raytracer_tpu.ops.kernels.fused_vec import loss_grad_pallas_vec
    from reversible_raytracer_tpu.ops.pipeline_vec import render_jnp_vec

    scene, spec, _ = configs.config5_many_spheres(64, n_spheres=33)
    cfg = RenderConfig(height=40, width=72, shadows=True)
    start = configs.perturb(scene, spec, scale=0.05, seed=3)
    target = jnp.asarray(np.asarray(render_jnp_vec(scene, cfg)))

    l_ref, g_ref = jax.value_and_grad(
        lambda s: mse_loss(render_jnp_vec(s, cfg), target)
    )(start)
    l_f, g_f = loss_grad_pallas_vec(start, cfg, target, interpret=True)
    assert abs(float(l_ref) - float(l_f)) <= 1e-4 * max(float(l_ref), 1e-9)
    _tree_cmp(g_ref, g_f, 3e-2)


def test_vec_step_spp4_in_kernel():
    """Round 3 (VERDICT r2 item #8): the vec step kernel fuses the 2x2
    subsample loop in-kernel (the mse residual is of the post-clip
    subsample AVERAGE, so spp=4 training cannot decompose into 4
    launches). Loss must equal AD over the 4-launch wrapper exactly-ish
    (identical subsample math, one average), grads to the in-kernel
    cotangent-formation rounding bound."""
    import dataclasses

    from reversible_raytracer_tpu.ops.kernels.fused_vec import (
        loss_grad_pallas_vec,
        render_pallas_vec,
    )

    scene, spec, _ = configs.config5_many_spheres(48, n_spheres=20)
    cfg4 = RenderConfig(height=32, width=48, shadows=True, spp=4)
    target = jnp.asarray(
        np.asarray(render_pallas_vec(scene, cfg4, interpret=True))
    ) * 0.92
    start = configs.perturb(scene, spec, scale=0.05, seed=2)

    l_r, g_r = jax.value_and_grad(
        lambda s: mse_loss(render_pallas_vec(s, cfg4, interpret=True), target)
    )(start)
    l_k, g_k = loss_grad_pallas_vec(start, cfg4, target, interpret=True)
    assert abs(float(l_r) - float(l_k)) <= 1e-6 * float(l_r)
    _tree_cmp(g_r, g_k, 1e-4)
    # spp=1 of the same scene is NOT the same objective (sanity)
    cfg1 = dataclasses.replace(cfg4, spp=1)
    l_1, _ = loss_grad_pallas_vec(start, cfg1, target, interpret=True)
    assert abs(float(l_1) - float(l_k)) > 1e-9


def test_vec_step_spp4_reflections_in_kernel():
    """Round 3: the spp x bounce-level product in the vec step kernel —
    the body loops replay/shade/reverse over subsamples AND levels. Loss
    and grads must match autodiff over the 4-launch wrapper render of the
    same reflective compile."""
    import dataclasses as dc

    from reversible_raytracer_tpu.ops.kernels.fused_vec import (
        loss_grad_pallas_vec,
        render_pallas_vec,
    )

    scene, spec, _ = configs.config5_many_spheres(48, n_spheres=18)
    mat = dc.replace(
        scene.spheres.material,
        mirror=jnp.full_like(scene.spheres.material.mirror, 0.4),
    )
    scene = dc.replace(
        scene, spheres=dc.replace(scene.spheres, material=mat)
    )
    cfg4 = RenderConfig(height=24, width=32, shadows=True, spp=4,
                        reflections=1)
    target = jnp.asarray(
        np.asarray(render_pallas_vec(scene, cfg4, interpret=True))
    ) * 0.92
    start = configs.perturb(scene, spec, scale=0.05, seed=2)
    l_r, g_r = jax.value_and_grad(
        lambda s: mse_loss(render_pallas_vec(s, cfg4, interpret=True), target)
    )(start)
    l_k, g_k = loss_grad_pallas_vec(start, cfg4, target, interpret=True)
    assert abs(float(l_r) - float(l_k)) <= 1e-6 * float(l_r)
    _tree_cmp(g_r, g_k, 1e-4)
    # Dispatch: reflective spp=4 at VEC scale now reaches the vec step
    # kernel (small N keeps the unrolled step, which fuses spp in-kernel
    # too).
    from reversible_raytracer_tpu.ops.render import resolve_step_impl

    big, _, _ = configs.config5_many_spheres(48, n_spheres=33)
    real = jax.default_backend
    try:
        jax.default_backend = lambda: "tpu"
        assert resolve_step_impl(scene, cfg4) == "step_unrolled"
        assert resolve_step_impl(big, cfg4) == "step_vec"
    finally:
        jax.default_backend = real


def test_loss_and_grad_fn_dispatch(monkeypatch):
    """Dispatch table of ops.render.loss_and_grad_fn under a faked TPU
    backend: explicit impl choices are honored, auto picks by object
    count, unsupported combos fall back to value_and_grad."""
    import sys

    import reversible_raytracer_tpu.ops.render  # noqa: F401  (ensure loaded)

    R = sys.modules["reversible_raytracer_tpu.ops.render"]

    small, _, _ = configs.config2_four_spheres()  # 5 objects
    big, _, _ = configs.config5_many_spheres(64, n_spheres=33)  # 34 objects
    cfg = RenderConfig(height=32, width=32, shadows=True)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    def kind(fn):
        if "vag" in getattr(fn, "__qualname__", ""):
            return "fallback"
        cells = [
            getattr(c.cell_contents, "__name__", "")
            for c in (fn.__closure__ or ())
        ]
        return "vec" if "loss_grad_pallas_vec" in cells else "unrolled"

    assert kind(R.loss_and_grad_fn(small, cfg)) == "unrolled"
    assert kind(R.loss_and_grad_fn(big, cfg)) == "vec"
    assert kind(R.loss_and_grad_fn(small, cfg, impl="pallas_vec")) == "vec"
    assert kind(R.loss_and_grad_fn(big, cfg, impl="pallas")) == "unrolled"
    import dataclasses
    cfg4 = dataclasses.replace(cfg, spp=4)
    assert kind(R.loss_and_grad_fn(small, cfg4)) == "unrolled"  # spp=4 ok unrolled
    assert kind(R.loss_and_grad_fn(big, cfg4)) == "vec"  # round 3: in-kernel spp=4
    soft = dataclasses.replace(cfg, soft_tau=0.05)
    assert kind(R.loss_and_grad_fn(small, soft)) == "fallback"
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert kind(R.loss_and_grad_fn(small, cfg)) == "fallback"


def test_make_step_with_vag_fn():
    """The host-loop step (optim.make_step) with the fused-step override
    matches the default value_and_grad step."""
    from reversible_raytracer_tpu.optim import OptConfig, make_step

    scene, spec, _ = configs.config1_single_sphere()
    cfg = RenderConfig(height=32, width=32, shadows=False)
    target = jnp.asarray(np.asarray(render_jnp(scene, cfg)))
    start = configs.perturb(scene, spec, scale=0.05, seed=3)
    ocfg = OptConfig(iters=2, lr=1e-2)

    step_ref, tx_ref = make_step(cfg, spec, ocfg)
    vag = lambda s, t: loss_grad_pallas(s, cfg, t, interpret=True)
    step_f, tx_f = make_step(cfg, spec, ocfg, vag_fn=vag)

    s_r, o_r = start, tx_ref.init(start)
    s_f, o_f = start, tx_f.init(start)
    for _ in range(2):
        s_r, o_r, l_r, _ = step_ref(s_r, o_r, target)
        s_f, o_f, l_f, _ = step_f(s_f, o_f, target)
    assert abs(float(l_r) - float(l_f)) <= 1e-4 * max(float(l_r), 1e-9)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(s_r)[0],
        jax.tree_util.tree_flatten_with_path(s_f)[0],
    ):
        a, b = np.asarray(a), np.asarray(b)
        if not a.size:
            continue
        np.testing.assert_allclose(a, b, atol=5e-3, err_msg=str(path))


def test_soft_step_strict_vs_soft_kernel_ad():
    """Soft training-step kernel vs autodiff of render_pallas_vec_soft:
    the only difference is where the color cotangent comes from (in-kernel
    residual vs custom_vjp cotangent refs), so agreement is strict."""
    import dataclasses

    from reversible_raytracer_tpu.ops.kernels.fused_vec_soft import (
        loss_grad_pallas_vec_soft,
        render_pallas_vec_soft,
    )

    scene, spec, _ = configs.config5_many_spheres(64, n_spheres=17)
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
    _tree_cmp(g_ref, g_f, 1e-4)

    # tau is a runtime scalar: a second tau must NOT rebuild the kernel
    # (the anneal sweep shares one compile) and must change the result.
    cfg2 = dataclasses.replace(cfg, soft_tau=0.02)
    l2, _ = loss_grad_pallas_vec_soft(start, cfg2, target, interpret=True)
    assert abs(float(l2) - float(l_f)) > 0.0


def test_optimize_scan_with_fused_step():
    """optimize_scan(vag_fn=...) drives the same trajectory as the default
    value_and_grad body (config-1, few steps, interpret kernels)."""
    from reversible_raytracer_tpu.optim import OptConfig, optimize_scan

    scene, spec, _ = configs.config1_single_sphere()
    cfg = RenderConfig(height=32, width=32, shadows=False)
    target = jnp.asarray(np.asarray(render_jnp(scene, cfg)))
    start = configs.perturb(scene, spec, scale=0.05, seed=3)
    ocfg = OptConfig(iters=5, lr=1e-2)

    ref_scene, ref_losses = optimize_scan(start, target, spec, cfg, ocfg)
    vag = lambda s, t: loss_grad_pallas(s, cfg, t, interpret=True)
    f_scene, f_losses = optimize_scan(
        start, target, spec, cfg, ocfg, vag_fn=vag, cache_key="interp-step"
    )
    np.testing.assert_allclose(
        np.asarray(ref_losses), np.asarray(f_losses), rtol=2e-2
    )
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(ref_scene)[0],
        jax.tree_util.tree_flatten_with_path(f_scene)[0],
    ):
        a, b = np.asarray(a), np.asarray(b)
        if not a.size:
            continue
        np.testing.assert_allclose(a, b, atol=5e-3, err_msg=str(path))
