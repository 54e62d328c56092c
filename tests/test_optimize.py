"""End-to-end inverse rendering: driver config 1 convergence (SURVEY.md §4.3)
plus optimizer-mechanics units (masking, bounds, scan loop, checkpointing)."""

import jax
import jax.numpy as jnp
import numpy as np

from reversible_raytracer_tpu.models import configs
from reversible_raytracer_tpu.models.scene import ParamSpec
from reversible_raytracer_tpu.optim import (
    OptConfig,
    make_step,
    optimize,
    optimize_scan,
    param_error,
    project_bounds,
)
from reversible_raytracer_tpu.ops.pipeline import RenderConfig
from reversible_raytracer_tpu.ops.render import render_jnp


def test_config1_converges():
    """Recover a single sphere's center+radius from a 48^2 target image."""
    scene, spec, _ = configs.config1_single_sphere()
    cfg = RenderConfig(height=48, width=48, shadows=False)
    target = render_jnp(scene, cfg)
    start = configs.perturb(scene, spec, scale=0.25, seed=1)
    assert float(param_error(start, scene, spec)) > 0.05

    # 800 iters: the center-z vs radius depth ambiguity resolves slowly
    # (silhouette matches early; shading disambiguates late) — constant lr,
    # since cosine decay would quench the long tail this test measures.
    final, losses = optimize_scan(
        start, target, spec, cfg, OptConfig(iters=800, lr=3e-2, schedule="constant")
    )
    err = float(param_error(final, scene, spec))
    assert err < 2e-2, f"param RMS error {err} after optimization"
    assert float(losses[-1]) < float(losses[0]) * 0.05


def test_optimize_host_loop_with_history(tmp_path):
    scene, spec, _ = configs.config1_single_sphere()
    cfg = RenderConfig(height=32, width=32, shadows=False)
    target = render_jnp(scene, cfg)
    start = configs.perturb(scene, spec, scale=0.2, seed=2)
    ckpt_path = str(tmp_path / "state.npz")
    final, history = optimize(
        start, target, spec, cfg, OptConfig(iters=40, lr=3e-2),
        log_every=10, truth=scene, checkpoint_path=ckpt_path,
    )
    assert len(history) >= 4
    assert history[-1]["loss"] < history[0]["loss"]
    assert "param_err" in history[0]

    # Resume continues from the checkpoint without error.
    final2, history2 = optimize(
        start, target, spec, cfg, OptConfig(iters=50, lr=3e-2),
        log_every=10, resume=ckpt_path,
    )
    assert history2[0]["step"] == 40


def test_gradient_masking_freezes_untrained_leaves():
    scene, spec, _ = configs.config1_single_sphere()
    cfg = RenderConfig(height=24, width=24, shadows=False)
    target = render_jnp(scene, cfg)
    start = configs.perturb(scene, spec, scale=0.2, seed=3)
    step, tx = make_step(cfg, spec, OptConfig(iters=1, lr=5e-2))
    new_scene, _, _, _ = step(start, tx.init(start), target)
    # Light position is not trainable in config 1 — must be bit-identical.
    np.testing.assert_array_equal(
        np.asarray(new_scene.lights.position), np.asarray(start.lights.position)
    )
    np.testing.assert_array_equal(
        np.asarray(new_scene.camera.eye), np.asarray(start.camera.eye)
    )
    # Trainable leaves moved.
    assert not np.array_equal(
        np.asarray(new_scene.spheres.center), np.asarray(start.spheres.center)
    )


def test_bounds_projection():
    scene, spec, _ = configs.config1_single_sphere()
    # Force radius outside its [0.2, 2.5] bounds and project.
    import dataclasses

    bad = dataclasses.replace(
        scene, spheres=dataclasses.replace(
            scene.spheres, radius=jnp.asarray([9.0], jnp.float32)))
    fixed = project_bounds(bad, spec)
    assert float(fixed.spheres.radius[0]) == 2.5
    # Non-trainable leaves are untouched even if out of any range.
    np.testing.assert_array_equal(
        np.asarray(fixed.lights.position), np.asarray(bad.lights.position)
    )


def test_checkpoint_roundtrip(tmp_path):
    from reversible_raytracer_tpu.utils import checkpoint as ckpt

    scene, spec, _ = configs.config2_four_spheres()
    path = str(tmp_path / "ck.npz")
    ckpt.save(path, scene, opt_state=None, step=7)
    scene2, _, step = ckpt.load(path, scene)
    assert step == 7
    for a, b in zip(jax.tree_util.tree_leaves(scene), jax.tree_util.tree_leaves(scene2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_config2_converges():
    """Driver config 2 (4 spheres + plane, Phong, shadows): recover
    centers/radii/albedos from a 5% perturbation with the documented
    robust recipe (Adam cosine, lr<=5e-3 — see docs/OPTIMIZATION_NOTES.md)."""
    import numpy as np

    from reversible_raytracer_tpu.models import configs as cfgs

    scene, spec, _ = cfgs.config2_four_spheres()
    cfg = RenderConfig(height=96, width=96, shadows=True)
    target = render_jnp(scene, cfg)
    start = cfgs.perturb(scene, spec, scale=0.05, seed=7)
    e0 = float(param_error(start, scene, spec))
    final, losses = optimize_scan(start, target, spec, cfg, OptConfig(iters=400, lr=3e-3))
    err = float(param_error(final, scene, spec))
    assert err < 0.06, f"param RMS {e0} -> {err}"
    assert float(np.asarray(losses)[-1]) < float(np.asarray(losses)[0]) * 0.6


def test_flat_update_matches_per_leaf_step():
    """optim.make_flat_update (the single-vector optimizer update used by
    optimize_scan and the sharded steps) is element-for-element the same
    math as the per-leaf chain in make_step — including gradient masking,
    Adam, lr_scales path rules, the cosine schedule, and box projection."""
    from reversible_raytracer_tpu.optim import make_flat_update
    from reversible_raytracer_tpu.ops.render import mse_loss

    import optax as _optax

    from reversible_raytracer_tpu.optim import (
        make_optimizer,
        mask_grads,
    )

    scene, spec, _ = configs.config2_four_spheres()
    cfg = RenderConfig(height=32, width=32, shadows=True)
    target = render_jnp(scene, cfg)
    start = configs.perturb(scene, spec, scale=0.2, seed=4)
    ocfg = OptConfig(
        iters=5, lr=2e-2, schedule="cosine",
        lr_scales=(("spheres.radius", 0.3), ("spheres.material.color", 2.0)),
    )

    # Both update paths are driven by ONE gradient stream (a separately-
    # compiled grad program can differ from make_step's fused one by a few
    # ulp, which the optimizer dynamics then amplify — the claim under
    # test is the UPDATE math, so the inputs must be identical).
    vag = jax.jit(jax.value_and_grad(
        lambda s: mse_loss(render_jnp(s, cfg), target)
    ))
    tx = make_optimizer(ocfg)
    finit, fapply = make_flat_update(start, spec, ocfg)
    s_flat, o_flat = start, finit(start)
    o_leaf = tx.init(start)
    for _ in range(5):
        _, grads = vag(s_flat)
        # Per-leaf chain applied to the SAME (scene, grads).
        mg = mask_grads(grads, spec)
        gn_ref = float(_optax.global_norm(mg))
        updates, o_leaf = tx.update(mg, o_leaf, s_flat)
        s_ref = _optax.apply_updates(s_flat, updates)
        s_ref = project_bounds(s_ref, spec)
        # Flat update on the same inputs; both states advance in lockstep.
        s_flat, o_flat, gn_flat = fapply(s_flat, o_flat, grads)
        for (p, a), b in zip(
            jax.tree_util.tree_leaves_with_path(s_ref),
            jax.tree_util.tree_leaves(s_flat),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-9,
                err_msg=f"leaf {jax.tree_util.keystr(p)} diverged",
            )
        np.testing.assert_allclose(gn_ref, float(gn_flat), rtol=1e-5)


def test_flat_update_untrainable_leaves_bit_identical():
    """Frozen leaves must come back BIT-identical through the flat
    round-trip (ravel -> update -> unravel): masked gradients are exactly
    zero, Adam's update of a zero gradient is exactly zero, and the bounds
    projection is gated on the mask."""
    from reversible_raytracer_tpu.optim import make_flat_update
    from reversible_raytracer_tpu.ops.render import mse_loss

    scene, spec, _ = configs.config1_single_sphere()
    cfg = RenderConfig(height=24, width=24, shadows=False)
    target = render_jnp(scene, cfg)
    start = configs.perturb(scene, spec, scale=0.2, seed=3)
    finit, fapply = make_flat_update(start, spec, OptConfig(iters=1, lr=5e-2))
    _, grads = jax.value_and_grad(
        lambda s: mse_loss(render_jnp(s, cfg), target)
    )(start)
    new_scene, _, _ = fapply(start, finit(start), grads)
    np.testing.assert_array_equal(
        np.asarray(new_scene.lights.position), np.asarray(start.lights.position)
    )
    np.testing.assert_array_equal(
        np.asarray(new_scene.camera.eye), np.asarray(start.camera.eye)
    )
    assert not np.array_equal(
        np.asarray(new_scene.spheres.center), np.asarray(start.spheres.center)
    )


def test_flat_update_sgd_momentum_matches():
    """SGD+momentum through the flat path equals the per-leaf chain (the
    annealed hard-polish stage runs SGD — see optimize_annealed)."""
    from reversible_raytracer_tpu.optim import make_flat_update
    from reversible_raytracer_tpu.ops.render import mse_loss

    scene, spec, _ = configs.config1_single_sphere()
    cfg = RenderConfig(height=24, width=24, shadows=False)
    target = render_jnp(scene, cfg)
    start = configs.perturb(scene, spec, scale=0.2, seed=5)
    ocfg = OptConfig(iters=4, lr=0.3, optimizer="sgd", momentum=0.9,
                     schedule="constant")

    step, tx = make_step(cfg, spec, ocfg)
    s1, o1 = start, tx.init(start)
    for _ in range(4):
        s1, o1, _, _ = step(s1, o1, target)

    vag = jax.jit(jax.value_and_grad(
        lambda s: mse_loss(render_jnp(s, cfg), target)
    ))
    finit, fapply = make_flat_update(start, spec, ocfg)
    s2, o2 = start, finit(start)
    for _ in range(4):
        _, grads = vag(s2)
        s2, o2, _ = fapply(s2, o2, grads)

    for a, b in zip(jax.tree_util.tree_leaves(s1), jax.tree_util.tree_leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-6, atol=2e-7)


def test_restart_proposals():
    """optim.propose_restart: restart 0 is the start verbatim; center-only
    swaps exchange exactly the center rows; FULL-row swaps are a no-op by
    permutation symmetry (the re-indexed scene renders identically — the
    measured reason geometry_only is the default)."""
    from reversible_raytracer_tpu.optim import propose_restart, swap_spheres

    scene, spec, _ = configs.config2_four_spheres()
    cfg = RenderConfig(height=24, width=24, shadows=True)

    s0 = propose_restart(scene, spec, 0, 0.2, 7, "swap")
    for a, b in zip(jax.tree_util.tree_leaves(s0), jax.tree_util.tree_leaves(scene)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    sw = swap_spheres(scene, 0, 2, geometry_only=True)
    np.testing.assert_array_equal(
        np.asarray(sw.spheres.center[0]), np.asarray(scene.spheres.center[2])
    )
    np.testing.assert_array_equal(
        np.asarray(sw.spheres.center[2]), np.asarray(scene.spheres.center[0])
    )
    np.testing.assert_array_equal(
        np.asarray(sw.spheres.radius), np.asarray(scene.spheres.radius)
    )
    np.testing.assert_array_equal(
        np.asarray(sw.spheres.material.color),
        np.asarray(scene.spheres.material.color),
    )

    full = swap_spheres(scene, 0, 2, geometry_only=False)
    np.testing.assert_array_equal(
        np.asarray(render_jnp(full, cfg)), np.asarray(render_jnp(scene, cfg))
    )

    per = propose_restart(scene, spec, 1, 0.2, 7, "per_sphere")
    # only sphere 0's rows moved; lights/camera untouched
    assert not np.array_equal(
        np.asarray(per.spheres.center[0]), np.asarray(scene.spheres.center[0])
    )
    np.testing.assert_array_equal(
        np.asarray(per.spheres.center[1:]), np.asarray(scene.spheres.center[1:])
    )
    np.testing.assert_array_equal(
        np.asarray(per.camera.eye), np.asarray(scene.camera.eye)
    )


def test_restart_proposal_resid():
    """Round 4 `resid` proposal: re-seeds ONE suspect sphere at the
    brightest unexplained region's ray (depth preserved) and half-jitters
    the rest. Properties pinned: exactly one sphere takes a large center
    move; the reseeded center keeps its eye distance; restart 0 is the
    start verbatim; missing target/rcfg raises."""
    import pytest as _pytest

    from reversible_raytracer_tpu.optim import propose_restart
    from reversible_raytracer_tpu.ops.pipeline_vec import render_jnp_vec

    scene, spec, _ = configs.config2_four_spheres(32)
    cfg = RenderConfig(height=32, width=32, shadows=True)
    target = render_jnp_vec(scene, cfg)
    start = configs.perturb(scene, spec, scale=0.45, seed=2)

    s0 = propose_restart(start, spec, 0, 0.3, 7, "resid",
                         target=target, rcfg=cfg)
    for a, b in zip(jax.tree_util.tree_leaves(s0),
                    jax.tree_util.tree_leaves(start)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    s1 = propose_restart(start, spec, 1, 0.3, 7, "resid",
                         target=target, rcfg=cfg)
    dc = np.abs(np.asarray(s1.spheres.center)
                - np.asarray(start.spheres.center)).max(axis=1)
    big = dc > 0.5
    assert big.sum() == 1, dc  # one relocated sphere; others half-jittered
    idx = int(np.argmax(dc))
    eye = np.asarray(start.camera.eye)
    d_old = np.linalg.norm(np.asarray(start.spheres.center[idx]) - eye)
    # the reseed itself preserves eye distance; the half-jitter then moves
    # the center by <= ~0.5*jitter relative noise on top
    d_new = np.linalg.norm(np.asarray(s1.spheres.center[idx]) - eye)
    assert abs(d_new - d_old) / d_old < 0.5

    with _pytest.raises(ValueError):
        propose_restart(start, spec, 1, 0.3, 7, "resid")


def test_multistart_chain_mechanics(monkeypatch):
    """optimize_multistart(chain=True): proposals come from the best
    CONVERGED scene once one exists (sequential repair), the proposal
    index advances only while stuck and resets on improvement, and
    chain=False keeps the round-3 behavior (always from start, index=r,
    fixed seed)."""
    from reversible_raytracer_tpu import optim as optim_mod
    from reversible_raytracer_tpu.optim import optimize_multistart

    scene, spec, _ = configs.config2_four_spheres(16)
    cfg = RenderConfig(height=16, width=16, shadows=True)
    target = render_jnp(scene, cfg)

    calls = []

    def fake_propose(base, spec_, ri, jitter, sd, proposal, target=None,
                     rcfg=None):
        calls.append((base, ri, sd))
        return base

    monkeypatch.setattr(optim_mod, "propose_restart", fake_propose)

    # Inner optimizer: identity. Losses are then identical across rounds
    # (same returned scene), so the first round stays best forever.
    noop = lambda s: (s, [0.0])

    calls.clear()
    optimize_multistart(scene, target, spec, cfg, ocfg := optim_mod.OptConfig(iters=1),
                        restarts=4, jitter=0.2, seed=5, optimize_fn=noop,
                        proposal="per_sphere", chain=False)
    assert [(c[1], c[2]) for c in calls] == [(0, 5), (1, 5), (2, 5), (3, 5)]
    assert all(c[0] is scene for c in calls)

    calls.clear()
    optimize_multistart(scene, target, spec, cfg, ocfg,
                        restarts=4, jitter=0.2, seed=5, optimize_fn=noop,
                        proposal="per_sphere", chain=True)
    # r=0: no best yet -> from start, index 0. r>=1: from best (which is
    # the identity-returned scene), index = stale+1 climbing while stuck.
    assert [(c[1], c[2]) for c in calls] == [(0, 5), (1, 6), (2, 7), (3, 8)]
    assert calls[0][0] is scene
    assert all(c[0] is not None for c in calls[1:])


def test_restart_proposals_degenerate_scenes():
    """ADVICE r4: sphere-structural proposal families must not crash on
    scenes without (enough) spheres. Rect-only scenes fall back to the
    jitter family; a 1-sphere scene's swap falls back to re-kicking the
    one sphere. Both remain VALID restart proposals (trainable leaves
    move), reachable from the CLI via --restart-proposal."""
    import dataclasses

    from reversible_raytracer_tpu.models.scene import Spheres
    from reversible_raytracer_tpu.optim import propose_restart

    scene, _, _ = configs.config2_four_spheres(16)
    cfg = RenderConfig(height=16, width=16, shadows=True)
    rect_only = dataclasses.replace(scene, spheres=Spheres.empty())
    spec_r = ParamSpec.none(rect_only).train("rects.origin")
    target = render_jnp(rect_only, cfg)

    for prop in ("swap", "swap_jitter", "per_sphere", "mixed", "resid"):
        out = propose_restart(rect_only, spec_r, 1, 0.2, 7, prop,
                              target=target, rcfg=cfg)
        moved = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree_util.tree_leaves(out),
                            jax.tree_util.tree_leaves(rect_only))
        )
        assert moved, f"proposal {prop!r} returned start verbatim"

    one, spec1, _ = configs.config1_single_sphere()
    sw = propose_restart(one, spec1, 1, 0.2, 7, "swap")
    assert not np.array_equal(
        np.asarray(sw.spheres.center), np.asarray(one.spheres.center)
    )


def test_resid_reseed_orthographic_depth():
    """ADVICE r4: under orthographic projection the reseeded sphere must
    preserve its ALONG-FWD depth (ray origins are offset on the image
    plane, so |center - eye| is the wrong invariant there). jitter=0
    isolates the reseed move itself."""
    import dataclasses

    from reversible_raytracer_tpu.optim import residual_reseed

    scene, spec, _ = configs.config2_four_spheres(32)
    cfg = RenderConfig(height=32, width=32, shadows=True,
                       projection="orthographic")
    from reversible_raytracer_tpu.ops.pipeline_vec import render_jnp_vec

    target = render_jnp_vec(scene, cfg)
    start = configs.perturb(scene, spec, scale=0.4, seed=3)
    out = residual_reseed(start, spec, target, cfg, rank=0, seed=9,
                          jitter=0.0)
    dc = np.abs(np.asarray(out.spheres.center)
                - np.asarray(start.spheres.center)).max(axis=1)
    idx = int(np.argmax(dc))
    eye = np.asarray(start.camera.eye)
    fwd = np.asarray(start.camera.look_at) - eye
    fwd = fwd / np.linalg.norm(fwd)
    d_old = float(np.dot(np.asarray(start.spheres.center[idx]) - eye, fwd))
    d_new = float(np.dot(np.asarray(out.spheres.center[idx]) - eye, fwd))
    np.testing.assert_allclose(d_new, d_old, rtol=1e-5, atol=1e-5)
