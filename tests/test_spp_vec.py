"""spp=4 supersampling on the object-vectorized family (round-1 VERDICT #6
leftover: the vec paths previously raised NotImplementedError for spp > 1).

Semantics: pipeline_vec.spp_average — four quarter-pixel subsample renders
averaged after per-subsample clipping, exactly pipeline.render_tile's spp
path, so jnp_vec stays BITWISE equal to the unrolled renderer at spp = 4.
The Pallas vec wrappers average four launches of one spp=1 compile with the
offsets riding the runtime off_ref scalars (quarter-pixel sums of dyadic
row/col values are exact in f32 -> bit-identical to in-kernel offsets).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from reversible_raytracer_tpu.models import configs
from reversible_raytracer_tpu.ops.kernels.fused_vec import render_pallas_vec
from reversible_raytracer_tpu.ops.kernels.fused_vec_soft import (
    render_pallas_vec_soft,
)
from reversible_raytracer_tpu.ops.pipeline import RenderConfig
from reversible_raytracer_tpu.ops.pipeline_vec import render_jnp_vec
from reversible_raytracer_tpu.ops.render import render_jnp
from test_fused_vec import _edge_mask


def test_jnp_vec_spp4_bitexact_vs_unrolled():
    scene, _, _ = configs.config2_four_spheres(48)
    cfg = RenderConfig(height=48, width=48, shadows=True, spp=4)
    a = np.asarray(render_jnp(scene, cfg))
    b = np.asarray(render_jnp_vec(scene, cfg))
    np.testing.assert_array_equal(a, b)


def test_jnp_vec_spp4_softens_edges():
    scene, _, _ = configs.config5_many_spheres(48, n_spheres=6)
    cfg1 = RenderConfig(height=48, width=48, shadows=True)
    cfg4 = dataclasses.replace(cfg1, spp=4)
    i1 = np.asarray(render_jnp_vec(scene, cfg1))
    i4 = np.asarray(render_jnp_vec(scene, cfg4))
    assert not np.array_equal(i1, i4)
    # Fractional-coverage values appear at silhouettes: pixel values not in
    # the spp=1 image's value set.
    frac = np.abs(i4 - i1).max(-1) > 1e-3
    assert 0.001 < frac.mean() < 0.25


def test_pallas_vec_spp4_matches_jnp_vec():
    scene, _, _ = configs.config5_many_spheres(48, n_spheres=30)
    cfg = RenderConfig(height=48, width=48, shadows=True, spp=4)
    a = np.asarray(render_jnp_vec(scene, cfg))
    b = np.asarray(render_pallas_vec(scene, cfg, interpret=True))
    stable = ~_edge_mask(a, b)
    assert stable.mean() > 0.5
    assert np.abs(a - b)[stable].max() < 1e-5
    assert (np.abs(a - b).max(-1) > 1e-3).mean() < 2e-2


def test_pallas_vec_spp4_grads_match_jnp_vec():
    scene, _, _ = configs.config5_many_spheres(32, n_spheres=26)
    cfg = RenderConfig(height=32, width=32, shadows=True, spp=4)
    img_v = np.asarray(render_jnp_vec(scene, cfg))
    img_p = np.asarray(render_pallas_vec(scene, cfg, interpret=True))
    w = jnp.asarray(~_edge_mask(img_v, img_p), jnp.float32)[..., None]
    target = jnp.zeros(img_v.shape, jnp.float32)

    def loss(render):
        return lambda s: jnp.sum(w * (render(s) - target) ** 2)

    gv = jax.grad(loss(lambda s: render_jnp_vec(s, cfg)))(scene)
    gp = jax.grad(loss(lambda s: render_pallas_vec(s, cfg, interpret=True)))(scene)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(gv)[0],
        jax.tree_util.tree_flatten_with_path(gp)[0],
    ):
        a, b = np.asarray(a), np.asarray(b)
        if not a.size:
            continue
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=2e-5 * scale, err_msg=str(path))


def test_soft_kernel_spp4_matches_jnp_soft():
    scene, _, _ = configs.config5_many_spheres(48, n_spheres=12)
    cfg = RenderConfig(height=48, width=48, shadows=True, soft_tau=0.05, spp=4)
    a = np.asarray(render_jnp_vec(scene, cfg))
    b = np.asarray(render_pallas_vec_soft(scene, cfg, interpret=True))
    stable = ~_edge_mask(a, b)
    assert stable.mean() > 0.3
    assert np.abs(a - b)[stable].max() < 1e-3
    assert (np.abs(a - b).max(-1) > 1e-3).mean() < 3e-2


def test_auto_dispatch_spp4_large_n(monkeypatch):
    """spp=4 at large N no longer forces the O(N)-compile unrolled family."""
    import sys

    import reversible_raytracer_tpu.ops.render  # noqa: F401  (ensure loaded)

    R = sys.modules["reversible_raytracer_tpu.ops.render"]

    big, _, _ = configs.config5_many_spheres(32, n_spheres=33)
    cfg = RenderConfig(height=32, width=32, shadows=True, spp=4)
    seen = {}
    monkeypatch.setattr(
        R, "render_jnp", lambda s, c: seen.setdefault("impl", "jnp") or 0
    )
    import reversible_raytracer_tpu.ops.pipeline_vec as PV

    real = PV.render_jnp_vec
    monkeypatch.setattr(
        PV, "render_jnp_vec",
        lambda s, c: seen.setdefault("impl", "jnp_vec") or real(s, c),
    )
    R.render(big, cfg, impl="auto")  # CPU backend -> jnp_vec at 34 objects
    assert seen["impl"] == "jnp_vec"
