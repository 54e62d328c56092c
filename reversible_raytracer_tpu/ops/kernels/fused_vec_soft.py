"""Soft-visibility fused Pallas kernels (the RenderConfig.soft_tau mode).

The annealed joint-geometry inversion (optim.optimize_annealed; BASELINE
config 5 "full joint inverse render") spends almost all of its device time
in the SOFT (tau > 0) stages, which previously only existed as
`pipeline_vec._render_soft` — an XLA path that materializes (N, H, W)
tensors for every per-object quantity and is HBM-bound. This module is the
TPU-native soft renderer: the same object-chunked SMEM design as
`fused_vec` (O(1) compile in N, scene objects walked by fori_loop), with
the soft math fused into one kernel per tile.

Semantics mirror `pipeline_vec._render_soft` primitive-for-primitive:

  1. phase 1 — a TWO-MIN t_rank loop tracks the nearest and next-nearest
     soft layers (t1, k1, t2, k2). Strict `<` comparisons reproduce
     argmin's first-wins ties and the winner-masked re-argmin of the jnp
     path (distinct-pair ties included);
  2. phase 2 — chunk-skipped resolve of each layer's 10 attribute planes
     plus its soft coverage alpha (`_sphere_soft_eval`: the sigmoid
     silhouette alpha whose d/d(center, radius) is the gradient hard
     raytracing lacks; rect layers stay hard, alpha = 1);
  3. per-layer shading through the SHARED `pipeline.shade_from_attrs`
     with a soft-occlusion product loop (1 - prod_k (1 - alpha_k), rect
     occluders hard) injected as occluded_fn;
  4. two-layer alpha compositing over the background, exactly the jnp
     path's `a1*c1 + (1-a1)*(a2*c2 + (1-a2)*bg)`.

The backward is hand-planned (recompute-in-backward, custom_vjp) like
`fused_vec`, with two soft-specific additions: the composite weights
(a1, a2) carry real gradients (silhouettes!), routed to the winning
objects' scalars via masked alpha vjps; and the soft shadow product's
transpose needs per-object EXCLUSIVE products, computed exactly with
chunked prefix/suffix products in VMEM scratch (no O(N) residuals).

Fidelity contract: soft products reduce in a different association order
than XLA's reduce, so parity vs `_render_soft` is allclose-grade
(~1e-5 relative away from layer-decision boundaries), not bitwise —
tests/test_fused_vec_soft.py pins it with the same boundary-masked
methodology as the hard kernels.

Environment maps (round 3): `Scene.env` rides the SMEM globals plan
exactly as in `fused_vec` (`globals_tree` already carries it) — the only
soft-specific site is the compositor's blend target, which becomes the
per-pixel `pipeline.miss_color` env sample of the primary ray direction
(mirroring `pipeline_vec._render_soft`'s `bg`); env texel gradients fall
out of the backward's S-stage vjp (shade + composite), which already
differentiates w.r.t. the flat globals.

Object texel grids (round 4, VERDICT r3 #6): textured groups append
their texel grids to the SMEM object rows exactly like `fused_vec` (the
shared `_row_plan` / `vec_smem_ok` budget); `_sphere_eval`/`_rect_eval`
auto-detect the long rows and sample dense, and the backward's
per-object masked vjps emit texel cotangents through the same dpv
write-back. Soft anneal stages of object-textured vec-scale scenes now
run in-kernel instead of on render_jnp_vec (~140-310 ms/step class).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as np

from ...models.scene import Scene, scene_object_textured
from .. import vecmath as vm
from ..pipeline import (
    BIG,
    T_EPS,
    RenderConfig,
    camera_rays,
    intersect_rect,
    light_geometry,
    miss_color,
    shade_from_attrs,
    shadow_origin,
)
from .fused import _round_up, _scalar_view, flatten_scene, scene_layout
from .fused_vec import (
    ATTR_NAMES,
    CHUNK,
    P_RCT,
    P_SPH,
    _RCT_PAD_ROW,
    _SPH_PAD_ROW,
    VecTileConfig,
    _globals_ns,
    _rect_eval,
    _sphere_eval,
    _unrolled_fori,
    globals_tree,
    pack_rects,
    pack_spheres,
    pad_rows,
)


def _sphere_soft_geom(geom, o, d, tau):
    """(t_rank, alpha) of one sphere from its 4 geometry scalars
    (cx, cy, cz, r) — the primitive sequence of pipeline_vec._sphere_soft.

    t_rank: the hit t where the ray hits, the closest-approach t for a
    near-miss whose coverage is non-negligible (> 1e-3), BIG otherwise.
    alpha: sigmoid(disc / (tau r^2)) gated to rays pointing at the sphere.
    """
    center = (geom[0], geom[1], geom[2])
    radius = geom[3]
    oc = vm.vsub(o, vm.splat(center))
    b = vm.vdot(oc, d)
    cc = vm.vdot(oc, oc) - radius * radius
    disc = b * b - cc
    t = -b - vm.safe_sqrt(disc)
    hit = (disc > 0.0) & (t > T_EPS)
    ahead = hit | (-b > T_EPS)
    alpha = jnp.where(ahead, jax.nn.sigmoid(disc / (tau * radius * radius)), 0.0)
    near = alpha > 1e-3
    t_rank = jnp.where(hit, t, jnp.where(near & (-b > T_EPS), -b, BIG))
    return t_rank, alpha


def _sphere_shadow_alpha(geom, so, ld, dist, tau):
    """Soft occluder coverage of one sphere for a shadow ray — the
    primitive sequence of pipeline_vec._occluded_soft's sphere branch."""
    center = (geom[0], geom[1], geom[2])
    radius = geom[3]
    oc = vm.vsub(so, vm.splat(center))
    b = vm.vdot(oc, ld)
    cc = vm.vdot(oc, oc) - radius * radius
    disc = b * b - cc
    t = -b - vm.safe_sqrt(disc)
    hit_between = (disc > 0.0) & (t > T_EPS) & (t < dist)
    ca_between = (-b > T_EPS) & (-b < dist)
    return jnp.where(
        hit_between | ca_between,
        jax.nn.sigmoid(disc / (tau * radius * radius)),
        0.0,
    )


def _rect_t_only(pv9, o, d):
    t, _, _, _ = intersect_rect(
        o, d, (pv9[0], pv9[1], pv9[2]), (pv9[3], pv9[4], pv9[5]),
        (pv9[6], pv9[7], pv9[8]),
    )
    return t


def _two_min_loop(sph_read, n_sph, rct_read, n_rct, o, d, shape, rct_offset,
                  tau, unroll=1):
    """Track the two smallest t_rank layers (t1, k1, t2, k2) over all
    objects. Strict `<` updates reproduce pipeline_vec's argmin (first
    index wins ties) and its winner-masked second argmin (the later of a
    tied pair becomes layer 2)."""
    f32 = jnp.float32
    t1 = jnp.full(shape, BIG, f32)
    t2 = jnp.full(shape, BIG, f32)
    k1 = jnp.full(shape, -1, jnp.int32)
    k2 = jnp.full(shape, -1, jnp.int32)

    def update(carry, k_global, t):
        t1, k1, t2, k2 = carry
        lt1 = t < t1
        lt2 = t < t2
        t2n = jnp.where(lt1, t1, jnp.where(lt2, t, t2))
        k2n = jnp.where(lt1, k1, jnp.where(lt2, k_global, k2))
        t1n = jnp.where(lt1, t, t1)
        k1n = jnp.where(lt1, k_global, k1)
        return t1n, k1n, t2n, k2n

    def sph_body(k, carry):
        geom = (sph_read(k, 0), sph_read(k, 1), sph_read(k, 2), sph_read(k, 3))
        t_rank, _ = _sphere_soft_geom(geom, o, d, tau)
        return update(carry, k, t_rank)

    def rct_body(k, carry):
        pv9 = tuple(rct_read(k, j) for j in range(9))
        return update(carry, rct_offset + k, _rect_t_only(pv9, o, d))

    carry = (t1, k1, t2, k2)
    if n_sph:
        carry = _unrolled_fori(n_sph, sph_body, carry, unroll)
    if n_rct:
        carry = _unrolled_fori(n_rct, rct_body, carry, unroll)
    return carry


def _resolve_soft_layer(sph_read, n_sph, rct_read, n_rct, o, d, shape, t_sel,
                        kbest, rct_offset, tau, checker_tau,
                        p_sph: int = P_SPH, p_rct: int = P_RCT,
                        sph_chunk: int = CHUNK, rct_chunk: int = CHUNK):
    """Chunk-skipped resolve of one layer's attribute planes + its soft
    alpha (same pattern as fused_vec._resolve_attrs; sphere alpha is the
    sigmoid coverage, rect alpha is 1 — a rect can only win with a real
    hit). Returns (attrs dict, alpha plane). ``checker_tau`` is the runtime
    soft-checker temperature (see fused_vec._sphere_eval). ``p_sph``/
    ``p_rct`` > the base widths mean texel row tails (round 4 — the eval
    fns auto-detect and sample dense); ``sph_chunk``/``rct_chunk`` are the
    skip granularities (finer for texel rows, fused_vec.tex_chunk)."""
    f32 = jnp.float32
    zero = jnp.zeros(shape, f32)
    planes = tuple([zero] * 9 + [jnp.ones(shape, f32)] + [zero])  # + alpha

    def group(is_sphere, read, P, k_offset, n_obj, planes, chunk):
        def per_object(k, planes):
            mask = kbest == (k + k_offset)
            pv = tuple(read(k, c) for c in range(P))
            if is_sphere:
                _, n_unit, col, coeffs = _sphere_eval(
                    pv, o, d, t_known=t_sel, checker_tau=checker_tau
                )
                _, alpha = _sphere_soft_geom(pv[:4], o, d, tau)
            else:
                _, n_unit, col, coeffs = _rect_eval(pv, o, d, checker_tau=checker_tau)
                alpha = jnp.ones(shape, f32)
            new = list(n_unit) + list(col) + list(coeffs) + [alpha]
            return tuple(jnp.where(mask, nv, ov) for nv, ov in zip(new, planes))

        def chunk_body(ci, planes):
            k0 = ci * chunk
            lo = k0 + k_offset
            in_chunk = ((kbest >= lo) & (kbest < lo + chunk)).astype(f32)
            any_live = jnp.max(in_chunk) > 0.0
            return jax.lax.cond(
                any_live,
                lambda p: jax.lax.fori_loop(k0, k0 + chunk, per_object, p),
                lambda p: p,
                planes,
            )

        n_chunks = (n_obj + chunk - 1) // chunk
        return jax.lax.fori_loop(0, n_chunks, chunk_body, planes)

    if n_sph:
        planes = group(True, sph_read, p_sph, 0, n_sph, planes, sph_chunk)
    if n_rct:
        planes = group(False, rct_read, p_rct, rct_offset, n_rct, planes,
                       rct_chunk)
    return dict(zip(ATTR_NAMES, planes[:10])), planes[10]


def _occluded_soft_loop(sph_read, n_sph, rct_read, n_rct, tau, unroll=1):
    """Soft occlusion as a product loop: occ = 1 - prod_k (1 - alpha_k)
    (sphere occluders soft, rect occluders hard). Returned as f32 in
    [0, 1]; shade_from_attrs's non-bool branch turns it into vis = 1-occ
    with gradients flowing to the occluders."""

    def occluded_fn(so, ld, dist):
        prod = jnp.ones_like(dist)

        def sph_body(k, prod):
            geom = (sph_read(k, 0), sph_read(k, 1), sph_read(k, 2), sph_read(k, 3))
            alpha = _sphere_shadow_alpha(geom, so, ld, dist, tau)
            return prod * (1.0 - alpha)

        def rct_body(k, prod):
            pv9 = tuple(rct_read(k, j) for j in range(9))
            t = _rect_t_only(pv9, so, ld)
            return prod * jnp.where(t < dist, 0.0, 1.0)

        if n_sph:
            prod = _unrolled_fori(n_sph, sph_body, prod, unroll)
        if n_rct:
            prod = _unrolled_fori(n_rct, rct_body, prod, unroll)
        return 1.0 - prod

    return occluded_fn


def soft_kernel_ok(scene_like: Scene) -> bool:
    """Can the soft kernel family handle this scene? The ONE shared
    eligibility predicate for every dispatch site (ops.render.resolve_impl
    and optim.anneal_stage_impl — round-3 ADVICE flagged the duplicated
    inline copies as drift-prone). True when the scene has no OBJECT texel
    grids (the soft SMEM object rows hold scalars) and any env map fits
    the dense-sampler budget. The env threshold is K <= 24 — STRICTER
    than the hard vec family's 32: the soft STEP kernel's scoped-vmem
    demand has a row-count-independent term that scales ~K² (the S-stage
    vjp's three dense env samples x 2K hat-weight planes). Measured on
    v5e: K=32 is impossible at ANY tile size (38.86M scoped at 32-row
    backward tiles, still 22.27M at 8 rows, limit 16M — ~16.7M fixed);
    K=24 fits at 8-row tiles (20.82M at 16 rows fails, 8 rows compiles
    and runs — `auto_tiles_soft` shrinks for K > 16). Dispatch routes
    K > 24 soft env scenes to the jnp_vec soft path instead.
    Round 4: OBJECT texel grids are supported too — they ride per-row
    SMEM tails exactly like the hard family (same probed `vec_smem_ok`
    budget), so the soft anneal stages of an object-textured vec-scale
    scene now run in-kernel instead of at XLA speed (VERDICT r3 #6).

    Round 5: under the default env backend (RRT_ENVBWD=mxu) the
    row-independent term IS GONE — it was the auto-vjp's 2K hat-weight
    residual planes, which the custom vjp rebuilds in the backward
    instead of carrying. K=32 compiles and runs at 8-row tiles
    (21.85 ms on v5e, scripts/envbwd_probe.py), so the soft cap rises
    to the families' shared K <= 32 dispatch boundary. The legacy
    RRT_ENVBWD=vjp backend keeps the measured K <= 24 cap."""
    from .fused_vec import _ENV_BWD, vec_smem_ok

    k = int(np.shape(scene_like.env)[0])
    k_cap = 32 if _ENV_BWD != "vjp" else 24
    return vec_smem_ok(scene_like) and k <= k_cap


def auto_tiles_soft(scene_like: Scene,
                    tiles: "VecTileConfig | None") -> VecTileConfig:
    """Default tiling with a backward-tile shrink for env-mapped scenes:
    the soft backward's S-stage vjp keeps THREE dense env samples live
    (one per composited layer's miss color + the blend target), each with
    its 2K hat-weight planes and per-texel reduction partials — the same
    scoped-vmem pressure class as fused_vec's env+reflections backward,
    which OOM'd at 64-row tiles and runs at 32 (see fused_vec.auto_tiles).
    Explicitly-passed tiles are honored verbatim (sweep scripts)."""
    if tiles is not None:
        return tiles
    from .fused_vec import _ENV_BWD

    t = VecTileConfig()
    bwd = t.bh_bwd
    if scene_like.env_mapped:
        bwd = 32
        env_k = int(np.shape(scene_like.env)[0])
        if _ENV_BWD != "vjp":
            # Round-5 custom env backend (no 2K weight-plane residuals):
            # K=24 fits 16-row tiles (9.51 ms vs 16.72 at the old 8 —
            # 1.76x; 32 rows still OOMs), K=32 runs at 8-row tiles
            # (21.85 ms; 16 rows OOMs). Probed on v5e,
            # scripts/envbwd_probe.py.
            if env_k > 24:
                bwd = 8
            elif env_k > 16:
                bwd = 16
        elif env_k > 16:
            # Legacy auto-vjp backend: K=24 fits ONLY at 8-row tiles
            # (16 rows OOM scoped vmem at 20.82M vs the 16M limit,
            # measured on v5e); K capped at 24 by soft_kernel_ok.
            bwd = 8
    if scene_object_textured(scene_like):
        # Texel-tail rows (round 4): same live-set class as the hard
        # family's textured backward (per-texel reduction partials x the
        # TWO composited layers) — adopt its 32-row shrink and its swept
        # skip granularity (tex_chunk=2, fused_vec.auto_tiles).
        bwd = min(bwd, 32)
        t = dataclasses.replace(t, tex_chunk=2)
    return dataclasses.replace(t, bh_bwd=bwd)


# ---------------------------------------------------------------------------
# Kernel factory
# ---------------------------------------------------------------------------

_CACHE: dict = {}


def _make_fused_vec_soft(
    scene_like: Scene,
    cfg: RenderConfig,
    tiles: VecTileConfig,
    interpret: bool,
    out_h: int | None = None,
):
    if cfg.spp != 1:
        # Measured refusal (VERDICT r4 #7; scripts/soft_spp4_probe.py,
        # 64-obj 512^2 v5e): the documented fall-through — value_and_grad
        # over the 4-launch wrapper-averaged soft render, semantically
        # exact since XLA forms the subsample average and the residual
        # outside the kernels — costs 23.26 ms/step vs the 4.38 ms spp=1
        # fused step (5.31x; a perfectly fused spp=4 soft step would be
        # ~4x = ~17.5 ms, so fusion's ceiling is ~25%). Against that
        # ~25%: the soft backward has ZERO scoped-vmem headroom at its
        # swept tiles (soft textured already needs 32-row tiles, soft env
        # K=24 needs 8 — OPTIMIZATION_NOTES tile ladder), and the hard
        # family's spp=4 fusion forced exactly the tile halvings that
        # cost 1.4-2.4x elsewhere. Fusing is therefore expected to give
        # back most of its ceiling; the wrapper stands. Dispatch is
        # pinned by optim.anneal_stage_uses_step + its test.
        raise NotImplementedError("fused_vec_soft kernels are spp=1 (wrapper averages)")
    if not cfg.soft_tau > 0.0:
        raise ValueError("fused_vec_soft requires soft_tau > 0 (hard path: fused_vec)")
    if cfg.reflections:
        raise NotImplementedError(
            "mirror reflections require hard semantics (reflections=0 when "
            "soft_tau > 0; anneal to hard, then polish with reflections on)"
        )
    out_h = cfg.height if out_h is None else out_h
    n_sph = scene_like.spheres.count
    n_rct = scene_like.rects.count
    n_lights = scene_like.lights.count
    env_shape = tuple(np.shape(scene_like.env))
    sph_tex_shape = tuple(np.shape(scene_like.spheres.texture))
    rct_tex_shape = tuple(np.shape(scene_like.rects.texture))
    # Texel row tails (round 4, VERDICT r3 #6): same SMEM row plan as the
    # hard family — textured groups append K*K*3 texel scalars per row,
    # the eval fns auto-detect, and the backward's per-object vjps emit
    # texel cotangents through the same dpv write-back.
    from .fused_vec import SMEM_BUDGET_BYTES, _row_plan, vec_smem_ok

    (p_sph, p_rct, ns_pad_est, nr_pad_est,
     sph_tex_len, rct_tex_len, smem_bytes) = _row_plan(scene_like)
    if not vec_smem_ok(scene_like):
        raise NotImplementedError(
            f"textured object rows need {smem_bytes//1024} KiB of SMEM "
            f"(> the ~{SMEM_BUDGET_BYTES//1024} KiB budget) — this scene "
            "renders via jnp_vec (impl='auto' routes)"
        )
    # tau enters the kernels as a runtime SMEM scalar, NOT a compile-time
    # constant: the annealed inversion sweeps tau per stage and must reuse
    # ONE compiled kernel pair (the soft fwd compile is minutes-long).
    # Both taus are runtime SMEM scalars — neutralize them in the cache key
    # so every anneal stage (soft AND checker temperature) shares ONE compile.
    # env_shape is in the key: the flat-globals width Sg depends on it.
    from .fused_vec import _ENV_BWD, _TEXEL_BWD  # backends change the bwd

    key = ((n_sph, n_rct, n_lights, env_shape, sph_tex_shape, rct_tex_shape),
           dataclasses.replace(cfg, soft_tau=1.0, checker_tau=1.0),
           tiles, interpret, out_h, _TEXEL_BWD, _ENV_BWD)
    hit_entry = _CACHE.get(key)
    if hit_entry is not None:
        return hit_entry

    gtreedef, gmeta, Sg = scene_layout(globals_tree(scene_like))
    H, W = out_h, cfg.width
    bh, bw = min(tiles.bh, _round_up(H, 8)), min(tiles.bw, _round_up(W, 128))
    bhb = min(tiles.bh_bwd, _round_up(H, 8))
    bwb = min(tiles.bw_bwd, _round_up(W, 128))
    Hp = _round_up(H, math.lcm(bh, bhb))
    Wp = _round_up(W, math.lcm(bw, bwb))
    f32 = jnp.float32
    ns_pad = ns_pad_est
    nr_pad = nr_pad_est
    sph_pad_row = np.concatenate(
        [_SPH_PAD_ROW, np.full(sph_tex_len, 0.5, np.float32)]
    ) if sph_tex_len else _SPH_PAD_ROW
    rct_pad_row = np.concatenate(
        [_RCT_PAD_ROW, np.full(rct_tex_len, 0.5, np.float32)]
    ) if rct_tex_len else _RCT_PAD_ROW
    tc = max(1, min(tiles.tex_chunk, CHUNK))
    assert CHUNK % tc == 0, f"tex_chunk {tc} must divide CHUNK {CHUNK}"
    sph_chunk = tc if sph_tex_len else CHUNK
    rct_chunk = tc if rct_tex_len else CHUNK
    cfg_layer = dataclasses.replace(cfg, clip=False, soft_tau=0.0)

    def tile_coords(off_ref, i, j, bh_, bw_):
        row0 = off_ref[0, 0] + (i * bh_).astype(f32)
        col0 = off_ref[0, 1] + (j * bw_).astype(f32)
        ii = row0 + jax.lax.broadcasted_iota(jnp.int32, (bh_, bw_), 0).astype(f32)
        jj = col0 + jax.lax.broadcasted_iota(jnp.int32, (bh_, bw_), 1).astype(f32)
        return ii, jj

    def rays_for(gvals, ii, jj, shape):
        gview = _scalar_view(gtreedef, gmeta, lambda idx: gvals[idx])
        o, d = camera_rays(gview["camera"], ii, jj, cfg.height, cfg.width, cfg.projection)
        return vm.vbroadcast(o, shape), vm.vbroadcast(d, shape), gview

    def soft_image(gvals, sph_read, rct_read, o, d, gview, shape, unroll, tau,
                   ctau):
        """The full soft pipeline for one tile — shared by the forward
        kernel and (re-traced under jax.vjp stage-wise) the backward."""
        t1, k1, t2, k2 = _two_min_loop(
            sph_read, n_sph, rct_read, n_rct, o, d, shape, ns_pad, tau, unroll
        )
        occluded_fn = _occluded_soft_loop(sph_read, n_sph, rct_read, n_rct, tau, unroll)
        layers = []
        for t_sel, kb in ((t1, k1), (t2, k2)):
            live = t_sel < BIG * 0.5
            at, alpha = _resolve_soft_layer(
                sph_read, n_sph, rct_read, n_rct, o, d, shape, t_sel, kb,
                ns_pad, tau, ctau, p_sph=p_sph, p_rct=p_rct,
                sph_chunk=sph_chunk, rct_chunk=rct_chunk,
            )
            a = jnp.where(live, alpha, 0.0)
            col = shade_from_attrs(
                _globals_ns(gview), o, d, cfg_layer, shape, t_sel, live, at,
                occluded_fn=occluded_fn,
            )
            layers.append((a, col))
        (a1, c1), (a2, c2) = layers
        # Per-pixel miss color: the env-map sample of the primary ray when
        # Scene.env is present (dense hat-basis via the tuple-leaf
        # dispatch), else the flat background — identical blend target to
        # pipeline_vec._render_soft.
        bg = miss_color(_globals_ns(gview), d, shape)
        out = []
        for ch in range(3):
            behind = a2 * c2[ch] + (1.0 - a2) * bg[ch]
            comp = a1 * c1[ch] + (1.0 - a1) * behind
            out.append(jnp.clip(comp, 0.0, 1.0) if cfg.clip else comp)
        return tuple(out)

    # ------------------------------------------------------------- forward
    def fwd_kernel(off_ref, tau_ref, glob_ref, sph_ref, rct_ref, r_ref, g_ref, b_ref):
        i, j = pl.program_id(0), pl.program_id(1)
        ii, jj = tile_coords(off_ref, i, j, bh, bw)
        tau = tau_ref[0, 0]
        ctau = tau_ref[0, 1]
        gvals = tuple(glob_ref[0, idx] for idx in range(Sg))
        o, d, gview = rays_for(gvals, ii, jj, (bh, bw))
        sph_read = lambda k, c: sph_ref[k, c]
        rct_read = lambda k, c: rct_ref[k, c]
        r, g, b = soft_image(
            gvals, sph_read, rct_read, o, d, gview, (bh, bw), tiles.unroll, tau,
            ctau,
        )
        r_ref[:, :] = r
        g_ref[:, :] = g
        b_ref[:, :] = b

    fwd_call = pl.pallas_call(
        fwd_kernel,
        grid=(Hp // bh, Wp // bw),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Sg), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ns_pad, p_sph), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((nr_pad, p_rct), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((bh, bw), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        ] * 3,
        out_shape=[jax.ShapeDtypeStruct((Hp, Wp), f32)] * 3,
        interpret=interpret,
    )

    # ------------------------------------------------------------ backward
    #
    # Hand-planned recompute-in-backward. Unlike the hard kernels, soft
    # visibility and the composite alphas CARRY gradients, so the plan is:
    #
    #   replay two-min + per-layer resolve + per-layer vis (values only)
    #   S-vjp: shade(vis_in_grad=True) + composite as one jax.vjp
    #        -> d_t, d_planes, d_alpha, d_vis per layer, d_o/d_d/d_gvals
    #   shadow transpose per layer: occlusion-product transpose (chunked
    #        EXCLUSIVE products in VMEM scratch — exact, no division, no
    #        O(N) residuals) -> per-occluder geometry grads + (d_so,
    #        d_ldir, d_dist), then jax.vjp through shadow_origin/
    #        light_geometry adds to d_t/d_normals/d_o/d_d/d_gvals
    #   per-object masked vjps per layer (chunk-skipped): t_rank, attrs
    #        and alpha routed to the winning object's scalars
    #   rays vjp closes the camera path.
    with_vis = cfg.shadows and cfg.shader == "phong" and n_lights > 0
    n_chunks_s = ns_pad // CHUNK

    def make_bwd_kernel(step_mode: bool):
        """One body, two kernels. step_mode=False: the render backward —
        a/b/c refs are COTANGENT tiles. step_mode=True: the fused TRAINING
        STEP — a/b/c refs are TARGET tiles, the S-stage's primal colors are
        kept, the cotangent is formed in-kernel from the residual, and a
        squared-error accumulator is emitted (the soft forward kernel
        disappears from the optimizer step)."""
        return _bwd_kernel_impl(step_mode)

    def _bwd_kernel_impl(step_mode):
      def bwd_kernel(off_ref, tau_ref, glob_ref, sph_ref, rct_ref, gr_ref, gg_ref,
                     gb_ref, *rest):
        if step_mode:
            loss_ref, dglob_ref, dsph_ref, drct_ref, q_scr, pre_scr = rest
        else:
            dglob_ref, dsph_ref, drct_ref, q_scr, pre_scr = rest
        i, j = pl.program_id(0), pl.program_id(1)
        tau = tau_ref[0, 0]
        ctau = tau_ref[0, 1]
        ii, jj = tile_coords(off_ref, i, j, bhb, bwb)
        shape = (bhb, bwb)
        gvals = tuple(glob_ref[0, idx] for idx in range(Sg))
        sph_read = lambda k, c: sph_ref[k, c]
        rct_read = lambda k, c: rct_ref[k, c]
        f32_ = jnp.float32
        zero = jnp.zeros(shape, f32_)
        zero3 = (zero,) * 3

        def rays_fn(gvals):
            o, d, _ = rays_for(gvals, ii, jj, shape)
            return o, d

        (o, d), rays_vjp = jax.vjp(rays_fn, gvals)
        gview = _scalar_view(gtreedef, gmeta, lambda idx: gvals[idx])

        # ---- replay (values only) ----
        t1, k1, t2, k2 = _two_min_loop(
            sph_read, n_sph, rct_read, n_rct, o, d, shape, ns_pad, tau,
            tiles.unroll,
        )
        t1 = jax.lax.stop_gradient(t1)
        t2 = jax.lax.stop_gradient(t2)
        k1 = jax.lax.stop_gradient(k1)
        k2 = jax.lax.stop_gradient(k2)
        lives = (t1 < BIG * 0.5, t2 < BIG * 0.5)
        resolved = []
        for t_sel, kb in ((t1, k1), (t2, k2)):
            at_l, alpha_l = _resolve_soft_layer(
                sph_read, n_sph, rct_read, n_rct, o, d, shape, t_sel, kb,
                ns_pad, tau, ctau, p_sph=p_sph, p_rct=p_rct,
                sph_chunk=sph_chunk, rct_chunk=rct_chunk,
            )
            planes = tuple(
                jax.lax.stop_gradient(at_l[name]) for name in ATTR_NAMES
            )
            resolved.append((planes, jax.lax.stop_gradient(alpha_l)))

        occluded_fn = _occluded_soft_loop(
            sph_read, n_sph, rct_read, n_rct, tau, tiles.unroll
        )
        lights_view = gview["lights"]

        vis_layers = []
        if with_vis:
            for (t_sel, _kb), (planes, _a) in zip(((t1, k1), (t2, k2)), resolved):
                nrm = planes[:3]
                so = shadow_origin(o, d, t_sel, nrm)
                vs = []
                for li in range(n_lights):
                    ldir, dist = light_geometry(lights_view, li, so)
                    vs.append(1.0 - occluded_fn(so, ldir, dist))
                vis_layers.append(tuple(jax.lax.stop_gradient(v) for v in vs))
        else:
            vis_layers = [None, None]

        # ---- stage S: shade + composite (one vjp) ----
        def S(gvals, o, d, t1v, planes1, alpha1, vis1, t2v, planes2, alpha2, vis2):
            gv = _scalar_view(gtreedef, gmeta, lambda idx: gvals[idx])
            outs = []
            for t_sel, planes, alpha, vis, live in (
                (t1v, planes1, alpha1, vis1, lives[0]),
                (t2v, planes2, alpha2, vis2, lives[1]),
            ):
                at = dict(zip(ATTR_NAMES, planes))
                a = jnp.where(live, alpha, 0.0)
                col = shade_from_attrs(
                    _globals_ns(gv), o, d, cfg_layer, shape, t_sel, live, at,
                    vis_in=vis, vis_in_grad=True,
                )
                outs.append((a, col))
            (a1, c1), (a2, c2) = outs
            # miss_color under the S vjp: env texel cotangents flow into
            # d_gvals (the flat globals) and direction cotangents into d_d.
            bg = miss_color(_globals_ns(gv), d, shape)
            res = []
            for ch in range(3):
                behind = a2 * c2[ch] + (1.0 - a2) * bg[ch]
                comp = a1 * c1[ch] + (1.0 - a1) * behind
                res.append(jnp.clip(comp, 0.0, 1.0) if cfg.clip else comp)
            return tuple(res)

        (planes1, alpha1), (planes2, alpha2) = resolved
        S_out, S_vjp = jax.vjp(
            S, gvals, o, d, t1, planes1, alpha1, vis_layers[0],
            t2, planes2, alpha2, vis_layers[1],
        )
        if step_mode:
            w = off_ref[0, 2]
            ri_ = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + i * bhb
            ci_ = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + j * bwb
            pmask = ((ri_ < H) & (ci_ < W)).astype(f32_)
            res_r = (S_out[0] - gr_ref[:, :]) * pmask
            res_g = (S_out[1] - gg_ref[:, :]) * pmask
            res_b = (S_out[2] - gb_ref[:, :]) * pmask
            sq = (jnp.sum(res_r * res_r) + jnp.sum(res_g * res_g)
                  + jnp.sum(res_b * res_b))
            two_w = 2.0 * w
            dcol = (two_w * res_r, two_w * res_g, two_w * res_b)
        else:
            dcol = (gr_ref[:, :], gg_ref[:, :], gb_ref[:, :])
        (dg_S, dS_o, dS_d, d_t1, d_pl1, d_a1, d_vis1,
         d_t2, d_pl2, d_a2, d_vis2) = S_vjp(dcol)

        d_o_acc = list(dS_o)
        d_d_acc = list(dS_d)
        dg_acc = list(dg_S)
        d_t_tot = [d_t1, d_t2]
        d_pl_tot = [list(d_pl1), list(d_pl2)]

        # ---- zero-init output grads on the first tile ----
        first = (i == 0) & (j == 0)

        @pl.when(first)
        def _():
            if step_mode:
                loss_ref[0, 0] = 0.0
            for idx in range(Sg):
                dglob_ref[0, idx] = 0.0

            def z_sph(k, _):
                for c in range(p_sph):
                    dsph_ref[k, c] = 0.0
                return 0

            def z_rct(k, _):
                for c in range(p_rct):
                    drct_ref[k, c] = 0.0
                return 0

            jax.lax.fori_loop(0, ns_pad, z_sph, 0)
            jax.lax.fori_loop(0, nr_pad, z_rct, 0)

        if step_mode:
            loss_ref[0, 0] = loss_ref[0, 0] + sq

        # ---- shadow transpose per layer ----
        if with_vis:
            for l_idx, ((t_sel, _kb), (planes, _a), d_vis_l) in enumerate(
                zip(((t1, k1), (t2, k2)), resolved, (d_vis1, d_vis2))
            ):
                nrm = planes[:3]

                def shadow_stage(gvals, o, d, t_sel, nrm):
                    gv = _scalar_view(gtreedef, gmeta, lambda idx: gvals[idx])
                    so = shadow_origin(o, d, t_sel, nrm)
                    geoms = tuple(
                        light_geometry(gv["lights"], li, so)
                        for li in range(n_lights)
                    )
                    return so, geoms

                (so, geoms), shadow_vjp = jax.vjp(
                    shadow_stage, gvals, o, d, t_sel, nrm
                )

                d_so = list(zero3)
                d_geoms = []
                for li in range(n_lights):
                    ldir, dist = geoms[li]
                    dV = d_vis_l[li]
                    d_ld = list(zero3)
                    d_dist = zero

                    # Rect occluders: hard factor R (zero gradient).
                    R = jnp.ones(shape, f32_)

                    def rct_body(k, R):
                        pv9 = tuple(rct_read(k, c) for c in range(9))
                        t = _rect_t_only(pv9, so, ldir)
                        return R * jnp.where(t < dist, 0.0, 1.0)

                    if n_rct:
                        R = _unrolled_fori(n_rct, rct_body, R, tiles.unroll)

                    if n_sph:
                        # Pass 1: per-chunk products Q_c and prefixes.
                        def chunk_q(ci, running):
                            def obj_body(k, q):
                                geom = tuple(sph_read(k, c) for c in range(4))
                                a = _sphere_shadow_alpha(geom, so, ldir, dist, tau)
                                return q * (1.0 - a)

                            q_c = jax.lax.fori_loop(
                                ci * CHUNK, (ci + 1) * CHUNK, obj_body,
                                jnp.ones(shape, f32_),
                            )
                            pre_scr[ci] = running
                            q_scr[ci] = q_c
                            return running * q_c

                        jax.lax.fori_loop(0, n_chunks_s, chunk_q,
                                          jnp.ones(shape, f32_))

                        # Pass 2 (reverse): exteriors + per-object vjps.
                        def chunk_bwd(rev, carry):
                            suf, d_so0, d_so1, d_so2, d_ld0, d_ld1, d_ld2, d_dist = carry
                            ci = n_chunks_s - 1 - rev
                            q_c = q_scr[ci]
                            exterior = pre_scr[ci] * suf

                            def live_branch(args):
                                d_so0, d_so1, d_so2, d_ld0, d_ld1, d_ld2, d_dist = args
                                k0 = ci * CHUNK
                                geoms_c = [
                                    tuple(sph_read(k0 + u, c) for c in range(4))
                                    for u in range(CHUNK)
                                ]
                                alphas = [
                                    _sphere_shadow_alpha(g, so, ldir, dist, tau)
                                    for g in geoms_c
                                ]
                                one_m = [1.0 - a for a in alphas]
                                pre = [None] * CHUNK
                                run = jnp.ones(shape, f32_)
                                for u in range(CHUNK):
                                    pre[u] = run
                                    run = run * one_m[u]
                                sufs = [None] * CHUNK
                                run = jnp.ones(shape, f32_)
                                for u in reversed(range(CHUNK)):
                                    sufs[u] = run
                                    run = run * one_m[u]
                                for u in range(CHUNK):
                                    d_alpha = -dV * exterior * pre[u] * sufs[u]

                                    def alpha_fn(geom, so, ldir, dist):
                                        return _sphere_shadow_alpha(
                                            geom, so, ldir, dist, tau
                                        )

                                    _, avjp = jax.vjp(
                                        alpha_fn, geoms_c[u], so, ldir, dist
                                    )
                                    dgeom, dso_u, dld_u, ddist_u = avjp(d_alpha)
                                    for c in range(4):
                                        dsph_ref[k0 + u, c] = (
                                            dsph_ref[k0 + u, c] + dgeom[c]
                                        )
                                    d_so0 = d_so0 + dso_u[0]
                                    d_so1 = d_so1 + dso_u[1]
                                    d_so2 = d_so2 + dso_u[2]
                                    d_ld0 = d_ld0 + dld_u[0]
                                    d_ld1 = d_ld1 + dld_u[1]
                                    d_ld2 = d_ld2 + dld_u[2]
                                    d_dist = d_dist + ddist_u
                                return (d_so0, d_so1, d_so2, d_ld0, d_ld1,
                                        d_ld2, d_dist)

                            # Skip chunks with no soft coverage anywhere
                            # (Q_c == 1 exactly => every alpha is exactly 0
                            # => every masked vjp is exactly 0).
                            any_soft = jnp.max(1.0 - q_c) > 0.0
                            outs = jax.lax.cond(
                                any_soft, live_branch, lambda a: a,
                                (d_so0, d_so1, d_so2, d_ld0, d_ld1, d_ld2,
                                 d_dist),
                            )
                            return (suf * q_c,) + outs

                        # The exterior must include the rect factor R and
                        # the cotangent is scaled once by it via `suf` init.
                        carry = (R, d_so[0], d_so[1], d_so[2],
                                 d_ld[0], d_ld[1], d_ld[2], d_dist)
                        carry = jax.lax.fori_loop(0, n_chunks_s, chunk_bwd, carry)
                        (_suf, d_so0, d_so1, d_so2,
                         d_ld0, d_ld1, d_ld2, d_dist) = carry
                        d_so = [d_so0, d_so1, d_so2]
                        d_ld = [d_ld0, d_ld1, d_ld2]

                    d_geoms.append((tuple(d_ld), d_dist))

                dg_sh, d_o_sh, d_d_sh, d_t_sh, d_n_sh = shadow_vjp(
                    (tuple(d_so), tuple(d_geoms))
                )
                for c in range(3):
                    d_o_acc[c] = d_o_acc[c] + d_o_sh[c]
                    d_d_acc[c] = d_d_acc[c] + d_d_sh[c]
                    d_pl_tot[l_idx][c] = d_pl_tot[l_idx][c] + d_n_sh[c]
                d_t_tot[l_idx] = d_t_tot[l_idx] + d_t_sh
                dg_acc = [a + b for a, b in zip(dg_acc, dg_sh)]

        # ---- per-object masked vjps per layer (chunk-skipped) ----
        def layer_obj_backward(kbest_l, d_t, d_planes, d_alpha, acc):
            def sph_group(acc):
                def per_object(k, acc2):
                    d_o_a, d_d_a = acc2
                    mask = (kbest_l == k).astype(f32_)
                    pv = tuple(sph_read(k, c) for c in range(p_sph))

                    def f(pv, o, d):
                        t_rank, alpha = _sphere_soft_geom(pv[:4], o, d, tau)
                        _, n_unit, col, coeffs = _sphere_eval(
                            pv, o, d, t_known=t_rank, checker_tau=ctau
                        )
                        outs = (t_rank,) + tuple(n_unit) + tuple(col) + tuple(
                            coeffs
                        ) + (alpha,)
                        return tuple(jnp.broadcast_to(x, shape) for x in outs)

                    _, obj_vjp = jax.vjp(f, pv, o, d)
                    cots = ((d_t * mask,)
                            + tuple(p * mask for p in d_planes)
                            + (d_alpha * mask,))
                    dpv, d_o_k, d_d_k = obj_vjp(cots)
                    for c in range(p_sph):
                        dsph_ref[k, c] = dsph_ref[k, c] + dpv[c]
                    return (vm.vadd(d_o_a, d_o_k), vm.vadd(d_d_a, d_d_k))

                def chunk_body(ci, acc2):
                    k0 = ci * sph_chunk
                    in_chunk = ((kbest_l >= k0) & (kbest_l < k0 + sph_chunk)).astype(f32_)
                    return jax.lax.cond(
                        jnp.max(in_chunk) > 0.0,
                        lambda a: jax.lax.fori_loop(k0, k0 + sph_chunk, per_object, a),
                        lambda a: a,
                        acc2,
                    )

                n_chunks_f = (n_sph + sph_chunk - 1) // sph_chunk
                return jax.lax.fori_loop(0, n_chunks_f, chunk_body, acc)

            def rct_group(acc):
                def per_object(k, acc2):
                    d_o_a, d_d_a = acc2
                    mask = (kbest_l == (ns_pad + k)).astype(f32_)
                    pv = tuple(rct_read(k, c) for c in range(p_rct))

                    def f(pv, o, d):
                        t, n_unit, col, coeffs = _rect_eval(pv, o, d, checker_tau=ctau)
                        outs = (t,) + tuple(n_unit) + tuple(col) + tuple(coeffs)
                        return tuple(jnp.broadcast_to(x, shape) for x in outs)

                    _, obj_vjp = jax.vjp(f, pv, o, d)
                    cots = (d_t * mask,) + tuple(p * mask for p in d_planes)
                    dpv, d_o_k, d_d_k = obj_vjp(cots)
                    for c in range(p_rct):
                        drct_ref[k, c] = drct_ref[k, c] + dpv[c]
                    return (vm.vadd(d_o_a, d_o_k), vm.vadd(d_d_a, d_d_k))

                def chunk_body(ci, acc2):
                    k0 = ci * rct_chunk
                    lo = ns_pad + k0
                    in_chunk = ((kbest_l >= lo) & (kbest_l < lo + rct_chunk)).astype(f32_)
                    return jax.lax.cond(
                        jnp.max(in_chunk) > 0.0,
                        lambda a: jax.lax.fori_loop(k0, k0 + rct_chunk, per_object, a),
                        lambda a: a,
                        acc2,
                    )

                n_chunks_r = (n_rct + rct_chunk - 1) // rct_chunk
                return jax.lax.fori_loop(0, n_chunks_r, chunk_body, acc)

            if n_sph:
                acc = sph_group(acc)
            if n_rct:
                acc = rct_group(acc)
            return acc

        acc = (zero3, zero3)
        acc = layer_obj_backward(k1, d_t_tot[0], tuple(d_pl_tot[0]), d_a1, acc)
        acc = layer_obj_backward(k2, d_t_tot[1], tuple(d_pl_tot[1]), d_a2, acc)
        d_o_obj, d_d_obj = acc

        # ---- rays transpose + global accumulation ----
        (dg_rays,) = rays_vjp((
            vm.vadd(tuple(d_o_acc), d_o_obj),
            vm.vadd(tuple(d_d_acc), d_d_obj),
        ))
        for idx in range(Sg):
            dglob_ref[0, idx] = (
                dglob_ref[0, idx] + dg_acc[idx] + dg_rays[idx]
            )

      return bwd_kernel

    bwd_call = pl.pallas_call(
        make_bwd_kernel(False),
        grid=(Hp // bhb, Wp // bwb),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Sg), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ns_pad, p_sph), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((nr_pad, p_rct), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ]
        + [
            pl.BlockSpec((bhb, bwb), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        ] * 3,
        out_specs=[
            pl.BlockSpec((1, Sg), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ns_pad, p_sph), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((nr_pad, p_rct), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Sg), f32),
            jax.ShapeDtypeStruct((ns_pad, p_sph), f32),
            jax.ShapeDtypeStruct((nr_pad, p_rct), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_chunks_s, bhb, bwb), jnp.float32),
            pltpu.VMEM((n_chunks_s, bhb, bwb), jnp.float32),
        ],
        interpret=interpret,
    )

    # Fused training step: target tiles in, (sq_sum, grads) out — the soft
    # optimizer step drops its forward kernel entirely.
    step_call = pl.pallas_call(
        make_bwd_kernel(True),
        grid=(Hp // bhb, Wp // bwb),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Sg), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ns_pad, p_sph), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((nr_pad, p_rct), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ]
        + [
            pl.BlockSpec((bhb, bwb), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        ] * 3,
        out_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Sg), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ns_pad, p_sph), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((nr_pad, p_rct), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), f32),
            jax.ShapeDtypeStruct((1, Sg), f32),
            jax.ShapeDtypeStruct((ns_pad, p_sph), f32),
            jax.ShapeDtypeStruct((nr_pad, p_rct), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_chunks_s, bhb, bwb), jnp.float32),
            pltpu.VMEM((n_chunks_s, bhb, bwb), jnp.float32),
        ],
        interpret=interpret,
    )

    # --------------------------------------------------------- custom_vjp
    @jax.custom_vjp
    def fused(gflat, sph, rct, offsets, tau_arr):
        return tuple(fwd_call(
            offsets, tau_arr, gflat.reshape(1, Sg),
            pad_rows(sph, ns_pad, sph_pad_row),
            pad_rows(rct, nr_pad, rct_pad_row),
        ))

    def fused_fwd(gflat, sph, rct, offsets, tau_arr):
        return fused(gflat, sph, rct, offsets, tau_arr), (
            gflat, sph, rct, offsets, tau_arr,
        )

    def fused_bwd(res, cotangents):
        gflat, sph, rct, offsets, tau_arr = res
        gr, gg, gb = cotangents
        dglob, dsph, drct = bwd_call(
            offsets, tau_arr, gflat.reshape(1, Sg),
            pad_rows(sph, ns_pad, sph_pad_row),
            pad_rows(rct, nr_pad, rct_pad_row),
            gr, gg, gb,
        )
        return (
            dglob.reshape(Sg),
            dsph[: sph.shape[0]],
            drct[: rct.shape[0]],
            jnp.zeros_like(offsets),
            jnp.zeros_like(tau_arr),
        )

    fused.defvjp(fused_fwd, fused_bwd)

    def apply(gflat, sph, rct, offsets, tau_arr):
        outs = fused(gflat, sph, rct, offsets, tau_arr)
        r, g, b = outs[0], outs[1], outs[2]
        return jnp.stack([r[:H, :W], g[:H, :W], b[:H, :W]], axis=-1)

    def apply_step(gflat, sph, rct, meta_row, tau_arr, tr, tg, tb):
        sq, dglob, dsph, drct = step_call(
            meta_row, tau_arr, gflat.reshape(1, Sg),
            pad_rows(sph, ns_pad, sph_pad_row),
            pad_rows(rct, nr_pad, rct_pad_row),
            tr, tg, tb,
        )
        return sq[0, 0], dglob.reshape(Sg), dsph, drct

    entry = (apply, apply_step, (Hp, Wp, ns_pad, nr_pad))
    _CACHE[key] = entry
    return entry


def render_pallas_vec_soft(
    scene: Scene,
    cfg: RenderConfig,
    row0=0.0,
    col0=0.0,
    tiles: VecTileConfig | None = None,
    interpret: bool = False,
    out_height: int | None = None,
):
    """Render the soft-visibility image (RenderConfig.soft_tau > 0) via the
    object-chunked soft Pallas kernel. Semantics: pipeline_vec._render_soft
    (allclose-grade parity; see module docstring). spp = 4 averages four
    launches of the same spp=1 compile at quarter-pixel runtime offsets
    (see fused_vec.render_pallas_vec)."""
    from ..pipeline_vec import spp_average

    tiles = auto_tiles_soft(scene, tiles)
    cfg1 = dataclasses.replace(cfg, spp=1) if cfg.spp != 1 else cfg
    apply, _, _ = _make_fused_vec_soft(scene, cfg1, tiles, interpret, out_h=out_height)
    gflat = flatten_scene(globals_tree(scene))
    sph, rct = pack_spheres(scene), pack_rects(scene)
    tau_arr = jnp.stack(
        [jnp.asarray(cfg.soft_tau, jnp.float32),
         jnp.asarray(cfg.checker_tau, jnp.float32)]
    ).reshape(1, 2)

    def once(oi, oj):
        offsets = jnp.stack(
            [jnp.asarray(row0, jnp.float32) + oi,
             jnp.asarray(col0, jnp.float32) + oj]
        ).reshape(1, 2)
        return apply(gflat, sph, rct, offsets, tau_arr)

    return spp_average(once, cfg)


def loss_grad_pallas_vec_soft(
    scene: Scene,
    cfg: RenderConfig,
    target,
    loss: str = "mse",
    row0=0.0,
    col0=0.0,
    tiles: VecTileConfig | None = None,
    interpret: bool = False,
    out_height: int | None = None,
    norm: float | None = None,
):
    """Fused SOFT training step: (loss, grads) of ``loss(
    render_pallas_vec_soft(scene), target)`` in ONE kernel launch — the
    annealed inversion's per-stage step cost drops by the whole soft
    forward kernel. Same contract as fused.loss_grad_pallas; tau stays a
    runtime scalar so the anneal sweep shares one compile."""
    tiles = auto_tiles_soft(scene, tiles)
    H = out_height or cfg.height
    _, apply_step, (Hp, Wp, _, _) = _make_fused_vec_soft(
        scene, cfg, tiles, interpret, out_h=out_height
    )
    if norm is None:
        norm = 1.0 / (cfg.height * cfg.width * 3) if loss == "mse" else 1.0
    target = jnp.asarray(target, jnp.float32)
    pads = ((0, Hp - H), (0, Wp - cfg.width))
    tr = jnp.pad(target[..., 0], pads)
    tg = jnp.pad(target[..., 1], pads)
    tb = jnp.pad(target[..., 2], pads)
    meta_row = jnp.stack(
        [
            jnp.asarray(row0, jnp.float32),
            jnp.asarray(col0, jnp.float32),
            jnp.asarray(norm, jnp.float32),
        ]
    ).reshape(1, 3)
    tau_arr = jnp.stack(
        [jnp.asarray(cfg.soft_tau, jnp.float32),
         jnp.asarray(cfg.checker_tau, jnp.float32)]
    ).reshape(1, 2)

    def pack_all(scene):
        return (
            flatten_scene(globals_tree(scene)),
            pack_spheres(scene),
            pack_rects(scene),
        )

    (gflat, sph, rct), pack_vjp = jax.vjp(pack_all, scene)
    sq, dglob, dsph, drct = apply_step(
        gflat, sph, rct, meta_row, tau_arr, tr, tg, tb
    )
    (grads,) = pack_vjp(
        (dglob, dsph[: scene.spheres.count], drct[: scene.rects.count])
    )
    return norm * sq, grads
