"""Mirror reflections (RenderConfig.reflections, Materials.mirror).

Capability extension beyond the reference (which shades locally only):
one-or-more specular bounces with color = lerp(local, reflected, mirror).
Fidelity is triangulated exactly like the base pipeline's (SURVEY.md §4.2):

  f64 numpy oracle == native C++ oracle == jnp == jnp_vec == Pallas
  (interpret), and jax.grad == central finite differences of the f64
  oracle THROUGH the bounce (mirror coefficients and geometry seen only
  in reflection).

The reflections=0 path must remain bitwise-identical to the pre-feature
renderer (the bounce code is not traced at all), so the whole existing
test suite doubles as the no-regression guard.
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


def _mirror_scene():
    """Small mirror test scene: chrome sphere + diffuse sphere + checkered
    slightly-reflective floor (config6_mirror's geometry at test scale)."""
    scene, spec, _ = configs.config6_mirror(48)
    return scene, spec


@pytest.mark.parametrize("reflections", [0, 1, 2])
def test_jnp_matches_f64_oracle(reflections):
    scene, _ = _mirror_scene()
    cfg = RenderConfig(height=48, width=48, reflections=reflections)
    img = np.asarray(render_jnp(scene, cfg))
    orc = ref.render(scene, 48, 48, reflections=reflections)
    # f32 pipeline vs f64 oracle: everywhere-close (no boundary mask needed
    # at this scene/size; hit decisions agree).
    assert np.abs(img - orc).max() < 1e-3
    assert np.abs(img - orc).mean() < 1e-5


def test_native_oracle_matches_numpy():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    scene, _ = _mirror_scene()
    for reflections in (0, 1, 2):
        a = ref.render(scene, 40, 48, reflections=reflections)
        b = native.render(scene, 40, 48, reflections=reflections)
        assert np.abs(a - b).max() < 1e-12, f"reflections={reflections}"


def test_reflections_change_the_image():
    scene, _ = _mirror_scene()
    img0 = ref.render(scene, 48, 48, reflections=0)
    img1 = ref.render(scene, 48, 48, reflections=1)
    img2 = ref.render(scene, 48, 48, reflections=2)
    assert np.abs(img1 - img0).max() > 0.1  # first bounce is very visible
    assert np.abs(img2 - img1).max() > 1e-3  # second bounce visible too


def test_reflections_zero_is_bitwise_noop():
    """A scene WITH mirror materials rendered at reflections=0 must equal
    the pre-feature semantics bitwise — the mirror field is dead weight
    until the config enables bounces."""
    scene, _ = _mirror_scene()
    zeroed = jax.tree_util.tree_map(lambda x: x, scene)
    mat = scene.spheres.material
    zeroed = dataclasses.replace(
        scene,
        spheres=dataclasses.replace(
            scene.spheres,
            material=dataclasses.replace(mat, mirror=jnp.zeros_like(mat.mirror)),
        ),
    )
    cfg = RenderConfig(height=32, width=32, reflections=0)
    a = np.asarray(render_jnp(scene, cfg))
    b = np.asarray(render_jnp(zeroed, cfg))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("spp", [1, 4])
def test_jnp_vec_matches_unrolled(spp):
    scene, _ = _mirror_scene()
    cfg = RenderConfig(height=48, width=48, reflections=1, spp=spp)
    a = np.asarray(render_jnp(scene, cfg))
    b = np.asarray(render(scene, cfg, impl="jnp_vec"))
    # Same primitive sequences (shared shade_from_attrs / reflect_dir /
    # shadow_origin): bitwise agreement wherever hit decisions agree; at
    # this size they agree everywhere.
    assert np.abs(a - b).max() < 1e-6


def test_pallas_interpret_matches_jnp():
    scene, _ = _mirror_scene()
    from reversible_raytracer_tpu.ops.kernels.fused import render_pallas

    cfg = RenderConfig(height=16, width=128, reflections=1)
    a = np.asarray(render_jnp(scene, cfg))
    b = np.asarray(render_pallas(scene, cfg, interpret=True))
    # ULP-class accumulation differences only (different fusion choices in
    # the tile-shaped graph); no hit flips at this size.
    assert np.abs(a - b).max() < 1e-4
    assert np.abs(a - b).mean() < 1e-6


def test_fused_step_kernel_grads_match_jnp():
    """loss_grad_pallas (the fused training-step kernel) with reflections:
    loss and every gradient leaf match jax.grad of the jnp renderer."""
    scene, _ = _mirror_scene()
    from reversible_raytracer_tpu.ops.kernels.fused import loss_grad_pallas

    cfg = RenderConfig(height=16, width=128, reflections=1)
    tgt = render_jnp(scene, cfg) * 0.9
    l_ref, g_ref = jax.value_and_grad(
        lambda s: mse_loss(render_jnp(s, cfg), tgt)
    )(scene)
    l_k, g_k = loss_grad_pallas(scene, cfg, tgt, interpret=True)
    assert abs(float(l_ref) - float(l_k)) < 1e-9
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_k)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_grads_match_oracle_fd():
    """jax.grad through the bounce vs central finite differences of the f64
    oracle: the mirror coefficient AND a center coordinate of the sphere
    seen in the reflection."""
    scene, _ = _mirror_scene()
    H = W = 40
    cfg = RenderConfig(height=H, width=W, reflections=1)
    tgt64 = ref.render(scene, H, W, reflections=1) * 0.9
    tgt = jnp.asarray(tgt64, jnp.float32)
    g = jax.grad(lambda s: mse_loss(render_jnp(s, cfg), tgt))(scene)

    def oracle_loss(s):
        return ref.mse_loss(ref.render(s, H, W, reflections=1), tgt64)

    eps = 1e-5

    def fd(update):
        return (oracle_loss(update(+eps)) - oracle_loss(update(-eps))) / (2 * eps)

    def upd_mirror(d):
        m = scene.spheres.material
        mir = np.asarray(m.mirror).copy()
        mir[0] += d
        m2 = dataclasses.replace(m, mirror=jnp.asarray(mir))
        return dataclasses.replace(
            scene, spheres=dataclasses.replace(scene.spheres, material=m2)
        )

    def upd_cx(d):
        c = np.asarray(scene.spheres.center).copy()
        c[1, 0] += d
        return dataclasses.replace(
            scene, spheres=dataclasses.replace(scene.spheres, center=jnp.asarray(c))
        )

    an_m = float(np.asarray(g.spheres.material.mirror)[0])
    fd_m = fd(upd_mirror)
    assert abs(an_m - fd_m) / max(abs(fd_m), 1e-9) < 0.02

    an_c = float(np.asarray(g.spheres.center)[1, 0])
    fd_c = fd(upd_cx)
    assert abs(an_c - fd_c) / max(abs(fd_c), 1e-9) < 0.02


def test_vec_kernels_render_reflections():
    """Round 3: the vec kernels rerun their loops per bounce level —
    tests/test_fused_vec.py has the fidelity suite; here we pin that the
    small mirror scene renders (no refusal) and the soft relaxations stay
    reflections-exclusive."""
    scene, _ = _mirror_scene()
    cfg = RenderConfig(height=16, width=128, reflections=1)
    from reversible_raytracer_tpu.ops.kernels.fused_vec import render_pallas_vec

    img = np.asarray(render_pallas_vec(scene, cfg, interpret=True))
    ref = np.asarray(render(scene, cfg, impl="jnp_vec"))
    d = np.abs(img - ref).max(axis=-1)
    assert (d > 1e-3).mean() < 2e-2  # boundary flips only
    # Both soft relaxations are reflections-exclusive (staged workflow):
    with pytest.raises(NotImplementedError, match="reflections"):
        render(scene, dataclasses.replace(cfg, soft_tau=0.05), impl="jnp_vec")
    with pytest.raises(NotImplementedError, match="reflections"):
        render(scene, dataclasses.replace(cfg, checker_tau=0.3), impl="jnp_vec")
    # ...and auto dispatch surfaces the same refusal rather than silently
    # rendering mismatched semantics.
    with pytest.raises(NotImplementedError, match="reflections"):
        render(scene, dataclasses.replace(cfg, checker_tau=0.3), impl="auto")


def test_cli_reflections_zero_overrides_config6(tmp_path):
    """--reflections 0 must actually disable config 6's default bounce."""
    from reversible_raytracer_tpu.cli import main as cli
    from reversible_raytracer_tpu.utils.imageio import load_png

    p0 = str(tmp_path / "r0.png")
    p1 = str(tmp_path / "r1.png")
    cli(["render", "--config", "6", "--size", "32", "--reflections", "0", "-o", p0])
    cli(["render", "--config", "6", "--size", "32", "-o", p1])
    scene, _, _ = configs.config6_mirror(32)
    want0 = np.asarray(render_jnp(scene, RenderConfig(height=32, width=32)))
    got0 = load_png(p0)
    got1 = load_png(p1)
    assert np.abs(got0 - want0).max() < 1e-2  # PNG is 8-bit quantized
    assert np.abs(got1 - got0).max() > 0.1  # default keeps the bounce


def test_auto_dispatch_routes_reflections():
    """auto must avoid the vec kernel family when reflections are on."""
    scene, _ = _mirror_scene()
    cfg = RenderConfig(height=32, width=32, reflections=1)
    img = np.asarray(render(scene, cfg, impl="auto"))  # must not raise
    assert np.isfinite(img).all()
    # Large-N reflective scenes route to jnp_vec (O(1) compile).
    big, _, _ = configs.config5_many_spheres(32, n_spheres=40)
    # Give one sphere a mirror finish so the bounce matters.
    mat = big.spheres.material
    mir = np.zeros(big.spheres.count, np.float32)
    mir[0] = 0.5
    big = dataclasses.replace(
        big,
        spheres=dataclasses.replace(
            big.spheres, material=dataclasses.replace(mat, mirror=jnp.asarray(mir))
        ),
    )
    bigcfg = RenderConfig(height=32, width=32, reflections=1)
    img2 = np.asarray(render(big, bigcfg, impl="auto"))
    assert np.isfinite(img2).all()


def test_loss_and_grad_fn_reflections_fallback():
    """Off-TPU the step-fn factory must fall back to jax.value_and_grad and
    still produce finite grads with reflections enabled (including for
    object counts that would normally pick the vec step kernel)."""
    from reversible_raytracer_tpu.ops.render import loss_and_grad_fn

    big, _, _ = configs.config5_many_spheres(24, n_spheres=30)
    cfg = RenderConfig(height=24, width=24, reflections=1)
    vag = loss_and_grad_fn(big, cfg)
    tgt = render(big, cfg, impl="jnp_vec") * 0.9
    loss, grads = vag(big, tgt)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(grads))


def test_mirror_inversion_converges():
    """Inverse rendering THROUGH the reflection: recover every object's
    mirror coefficient from a LARGE (30%) perturbation at CI scale. The
    blend is lerp(local, reflected, mirror), so the coefficient gradient is
    informative globally — no basin limit, unlike hard-silhouette geometry
    (measured: RMS 0.19 -> 7e-5 in 150 steps at 48^2)."""
    from reversible_raytracer_tpu.optim import OptConfig, optimize_scan, param_error

    scene, spec = _mirror_scene()
    cfg = RenderConfig(height=48, width=48, reflections=1)
    target = render_jnp(scene, cfg)
    start = configs.perturb(scene, spec, scale=0.3, seed=3)
    err0 = float(param_error(start, scene, spec))
    assert err0 > 0.05  # the perturbation must be substantial
    ocfg = OptConfig(iters=150, lr=2e-2, schedule="cosine")
    final, losses = optimize_scan(start, target, spec, cfg, ocfg,
                                  cache_key="test-mirror-inv")
    err1 = float(param_error(final, scene, spec))
    assert float(losses[-1]) < 1e-6
    assert err1 < 5e-3, (err0, err1)


def test_sharded_reflective_render_matches_single_device():
    """Row-band shard_map composes with the bounce replay (each band's
    secondary rays re-trace the WHOLE scene — scene params are replicated,
    so no cross-band communication is needed)."""
    from reversible_raytracer_tpu.parallel import make_ray_mesh
    from reversible_raytracer_tpu.parallel.shard import render_sharded

    scene, _ = _mirror_scene()
    cfg = RenderConfig(height=48, width=48, reflections=1)
    mesh = make_ray_mesh()
    a = np.asarray(render_sharded(scene, cfg, mesh, impl="jnp"))
    b = np.asarray(render_jnp(scene, cfg))
    np.testing.assert_array_equal(a, b)


def test_checkpoint_schema_change_raises_clearly(tmp_path):
    """A checkpoint written under an older scene schema (no mirror leaf)
    must fail with a schema error naming the missing keys — NOT a bare
    KeyError, and NOT a silent template substitution (the flat-indexed
    optimizer moments would misalign undetectably)."""
    import numpy as np_

    from reversible_raytracer_tpu.utils import checkpoint

    scene, _ = _mirror_scene()
    p = str(tmp_path / "ck.npz")
    checkpoint.save(p, scene, step=5)
    # Simulate the pre-mirror schema: drop the mirror keys from the file.
    with np_.load(p) as data:
        arrays = {k: data[k] for k in data.files if "mirror" not in k}
    with open(p, "wb") as fh:
        np_.savez(fh, **arrays)
    with pytest.raises(ValueError, match="schema"):
        checkpoint.load(p, scene)


def test_sceneio_roundtrip_mirror(tmp_path):
    from reversible_raytracer_tpu.utils.sceneio import load_scene, save_scene

    scene, _ = _mirror_scene()
    p = str(tmp_path / "scene.json")
    save_scene(p, scene)
    back = load_scene(p, scene)
    np.testing.assert_array_equal(
        np.asarray(back.spheres.material.mirror),
        np.asarray(scene.spheres.material.mirror),
    )
