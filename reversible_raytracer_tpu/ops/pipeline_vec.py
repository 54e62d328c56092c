"""Object-vectorized renderer: compile time O(1) in object count.

The primary pipeline (ops/pipeline.py) unrolls a Python loop over objects —
ideal for the Pallas kernels at the driver scales (<= ~100 objects; scene
parameters are SMEM scalars broadcast against pixel tiles), but its trace
and Mosaic/XLA compile time grow linearly with N (65 objects ~ 2 min).

This module is the large-N path: objects live on a leading array axis
(`t_all: (N, H, W)`), the nearest hit is an argmin + one-hot select, and
the whole thing is a fixed-size XLA graph for ANY object count. Semantics
are identical to the unrolled pipeline (near-root sphere intersection,
first-wins ties, hard shadows, checker materials, Phong) — enforced by
tests against both the unrolled path and the f64 oracles.

Use `render_jnp_vec` (exported via ops.render.render(..., impl="jnp_vec"))
for scenes with hundreds-to-thousands of objects; a Pallas version of this
layout (objects on lanes, (N, bh, bw) tiles) is the planned round-2 kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.scene import Scene
from . import vecmath as vm
from .pipeline import (
    BIG,
    SHADOW_EPS,
    T_EPS,
    RenderConfig,
    camera_rays,
    reflect_dir,
    miss_color,
    sample_texture,
    shade_from_attrs,
    shadow_origin,
    soft_checker_q,
    sphere_uv,
    texture_weights,
)


def _dotN(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _sphere_ts(scene: Scene, ox, oy, oz, dx, dy, dz):
    """t for all spheres: (N, H, W); BIG on miss."""
    c = scene.spheres.center  # (N, 3)
    r = scene.spheres.radius  # (N,)
    cx = c[:, 0][:, None, None]
    cy = c[:, 1][:, None, None]
    cz = c[:, 2][:, None, None]
    rr = r[:, None, None]
    ocx, ocy, ocz = ox[None] - cx, oy[None] - cy, oz[None] - cz
    b = _dotN(ocx, ocy, ocz, dx[None], dy[None], dz[None])
    cc = _dotN(ocx, ocy, ocz, ocx, ocy, ocz) - rr * rr
    disc = b * b - cc
    hit = disc > 0.0
    t = -b - vm.safe_sqrt(disc)
    return jnp.where(hit & (t > T_EPS), t, BIG)


def _rect_ts(scene: Scene, ox, oy, oz, dx, dy, dz):
    """(t, a, b) for all rects: each (M, H, W)."""
    p0 = scene.rects.origin  # (M, 3)
    eu = scene.rects.edge_u
    ev = scene.rects.edge_v
    n = jnp.cross(eu, ev)  # (M, 3)
    nx, ny, nz = (n[:, k][:, None, None] for k in range(3))
    denom = _dotN(dx[None], dy[None], dz[None], nx, ny, nz)
    grazing = jnp.abs(denom) > 1e-9
    denom_safe = jnp.where(grazing, denom, 1.0)
    px, py, pz = (p0[:, k][:, None, None] for k in range(3))
    t = _dotN(px - ox[None], py - oy[None], pz - oz[None], nx, ny, nz) / denom_safe
    hx = ox[None] + t * dx[None] - px
    hy = oy[None] + t * dy[None] - py
    hz = oz[None] + t * dz[None] - pz
    eux, euy, euz = (eu[:, k][:, None, None] for k in range(3))
    evx, evy, evz = (ev[:, k][:, None, None] for k in range(3))
    inv_u2 = 1.0 / jnp.sum(eu * eu, axis=1)[:, None, None]
    inv_v2 = 1.0 / jnp.sum(ev * ev, axis=1)[:, None, None]
    a = _dotN(hx, hy, hz, eux, euy, euz) * inv_u2
    b = _dotN(hx, hy, hz, evx, evy, evz) * inv_v2
    valid = grazing & (t > T_EPS) & (a >= 0) & (a <= 1) & (b >= 0) & (b <= 1)
    return jnp.where(valid, t, BIG), a, b


def _occluded_any(scene: Scene, ox, oy, oz, dx, dy, dz, dist):
    occ = jnp.zeros_like(dist, dtype=bool)
    if scene.spheres.count:
        ts = _sphere_ts(scene, ox, oy, oz, dx, dy, dz)
        occ = occ | (ts < dist[None]).any(axis=0)
    if scene.rects.count:
        tr, _, _ = _rect_ts(scene, ox, oy, oz, dx, dy, dz)
        occ = occ | (tr < dist[None]).any(axis=0)
    return occ


SPP4_OFFSETS = ((-0.25, -0.25), (-0.25, 0.25), (0.25, -0.25), (0.25, 0.25))


def spp_average(render_once, cfg: RenderConfig):
    """spp dispatch shared by the vec renderers: spp subsamples are
    independent renders at quarter-pixel ray offsets averaged AFTER
    per-subsample clipping — exactly pipeline.render_tile's spp semantics
    (same offsets, same clip placement), so the vec paths stay bit-exact
    vs the unrolled pipeline at spp = 4 too. ``render_once(oi, oj)``
    renders one subsample."""
    if cfg.spp == 1:
        return render_once(0.0, 0.0)
    if cfg.spp == 4:
        acc = None
        for oi, oj in SPP4_OFFSETS:
            img = render_once(oi, oj)
            acc = img if acc is None else acc + img
        return acc * 0.25
    raise ValueError(f"spp must be 1 or 4, got {cfg.spp}")


def render_jnp_vec(scene: Scene, cfg: RenderConfig, row0=0, height: int | None = None):
    """Object-vectorized full render. Returns (H, W, 3) float32."""
    if cfg.reflections and (cfg.soft_tau > 0.0 or cfg.checker_tau > 0.0):
        raise NotImplementedError(
            "mirror reflections require hard semantics (reflections=0 when "
            "soft_tau/checker_tau > 0; anneal to hard, then polish with "
            "reflections on)"
        )
    if cfg.soft_tau > 0.0:
        return spp_average(
            lambda oi, oj: _render_soft(scene, cfg, row0, height, oi, oj), cfg
        )
    return spp_average(
        lambda oi, oj: _render_hard_once(scene, cfg, row0, height, oi, oj), cfg
    )


def _trace_shade_hard(scene: Scene, cfg: RenderConfig, o, d, H, W,
                      with_mirror: bool = False):
    """One hard trace + local shade for rays (o, d) — the body shared by the
    primary rays and each reflection bounce. Returns (col, t, hit, at);
    ``at`` includes "mir" when ``with_mirror``. ``cfg.clip`` applies here
    (the reflective caller passes clip=False per level and clips at top)."""
    ox, oy, oz = o
    dx, dy, dz = d
    n_sph = scene.spheres.count
    n_rct = scene.rects.count
    parts = []
    if n_sph:
        parts.append(_sphere_ts(scene, ox, oy, oz, dx, dy, dz))
    ra = rb = None
    if n_rct:
        tr, ra, rb = _rect_ts(scene, ox, oy, oz, dx, dy, dz)
        parts.append(tr)

    t_all = jnp.concatenate(parts, axis=0)  # (N+M, H, W)
    k_best = jnp.argmin(t_all, axis=0)  # first-wins ties == unrolled chain
    t = jnp.take_along_axis(t_all, k_best[None], axis=0)[0]
    hit = t < BIG * 0.5

    at = _gather_layer(scene, k_best, t, (ox, oy, oz), (dx, dy, dz), ra, rb,
                       checker_tau=cfg.checker_tau, with_mirror=with_mirror)

    def occluded_fn(so, ld, dist):
        return _occluded_any(scene, so[0], so[1], so[2], ld[0], ld[1], ld[2], dist)

    col = shade_from_attrs(
        scene, (ox, oy, oz), (dx, dy, dz), cfg, (H, W), t, hit, at,
        occluded_fn=occluded_fn,
    )
    return col, t, hit, at


def _render_hard_once(scene: Scene, cfg: RenderConfig, row0=0,
                      height: int | None = None, oi: float = 0.0, oj: float = 0.0):
    H = cfg.height if height is None else height
    W = cfg.width
    ii = row0 + jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).astype(jnp.float32)
    jj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(jnp.float32)
    if oi or oj:  # render_tile's operand order: (row0 + iota) + offset
        ii, jj = ii + oi, jj + oj
    o, d = camera_rays(scene.camera, ii, jj, cfg.height, cfg.width, cfg.projection)
    o = tuple(jnp.broadcast_to(c, (H, W)) for c in o)
    d = tuple(jnp.broadcast_to(c, (H, W)) for c in d)

    if not (scene.spheres.count or scene.rects.count):
        img = jnp.stack(miss_color(scene, d, (H, W)), axis=-1)
        return jnp.clip(img, 0.0, 1.0) if cfg.clip else img

    bounces = cfg.reflections if cfg.shader == "phong" else 0
    if bounces == 0:
        col, _, _, _ = _trace_shade_hard(scene, cfg, o, d, H, W)
        return jnp.stack(col, axis=-1)

    # Mirror bounces: unclipped per level, lerp(local, reflected, mirror)
    # composed deepest-first, one clip at top — the same convention as
    # pipeline.shade's reflective path (tests assert agreement).
    import dataclasses

    cfg_level = dataclasses.replace(cfg, clip=False)

    def level(o_l, d_l, depth):
        col, t, hit, at = _trace_shade_hard(
            scene, cfg_level, o_l, d_l, H, W, with_mirror=depth < bounces
        )
        if depth < bounces:
            n = (at["nx"], at["ny"], at["nz"])
            rdir = reflect_dir(d_l, n)
            ro = shadow_origin(o_l, d_l, t, n)
            rcol = level(ro, rdir, depth + 1)
            m = jnp.where(hit, at["mir"], 0.0)
            col = tuple(c + m * (rc - c) for c, rc in zip(col, rcol))
        return col

    col = level(o, d, 0)
    if cfg.clip:
        col = tuple(jnp.clip(c, 0.0, 1.0) for c in col)
    return jnp.stack(col, axis=-1)


def _gather_layer(scene: Scene, k_best, t, o, d, ra, rb, checker_tau: float = 0.0,
                  with_mirror: bool = False):
    """Per-pixel attribute planes of the objects selected by ``k_best``
    (spheres first, then rects — pipeline_vec's concatenated object axis).
    Returns the `at` dict consumed by pipeline.shade_from_attrs
    (plus "mir" when ``with_mirror`` — the reflective path's blend weight).

    ``checker_tau`` (static float): 0.0 keeps the reference-faithful hard
    checker select (bit-exact with the unrolled pipeline); > 0 blends
    color/color2 by the smooth parity `pipeline.soft_checker_q`, giving hit
    positions — and through them the camera pose — texture gradients
    (RenderConfig.checker_tau; the config-4 capability)."""
    ox, oy, oz = o
    dx, dy, dz = d
    H, W = t.shape
    n_sph = scene.spheres.count
    n_rct = scene.rects.count

    # Hit position.
    px, py, pz = ox + t * dx, oy + t * dy, oz + t * dz

    # Stack per-object attributes (object axis N+M) and gather per pixel.
    def stacked(f_sph, f_rct):
        cols = []
        if n_sph:
            cols.append(f_sph(scene.spheres.material))
        if n_rct:
            cols.append(f_rct(scene.rects.material))
        return jnp.concatenate(cols, axis=0)

    def gather_obj(arr_n):  # (N+M,) -> (H, W)
        return jnp.take(arr_n, k_best)

    ka = gather_obj(stacked(lambda m: m.ka, lambda m: m.ka))
    kd = gather_obj(stacked(lambda m: m.kd, lambda m: m.kd))
    ks = gather_obj(stacked(lambda m: m.ks, lambda m: m.ks))
    shin = gather_obj(stacked(lambda m: m.shininess, lambda m: m.shininess))
    checker = gather_obj(stacked(lambda m: m.checker, lambda m: m.checker))
    cscale = gather_obj(stacked(lambda m: m.checker_scale, lambda m: m.checker_scale))
    col1 = [gather_obj(stacked(lambda m, k=k: m.color[:, k], lambda m, k=k: m.color[:, k])) for k in range(3)]
    col2 = [gather_obj(stacked(lambda m, k=k: m.color2[:, k], lambda m, k=k: m.color2[:, k])) for k in range(3)]

    is_sph = k_best < n_sph
    # Normals + checker parity, sphere vs rect branches (both computed
    # vectorized per pixel from gathered object parameters).
    if n_sph:
        sc = scene.spheres.center
        sr = jnp.concatenate([scene.spheres.radius, jnp.ones((n_rct,), jnp.float32)])
        scx = jnp.concatenate([sc[:, 0], jnp.zeros((n_rct,), jnp.float32)])
        scy = jnp.concatenate([sc[:, 1], jnp.zeros((n_rct,), jnp.float32)])
        scz = jnp.concatenate([sc[:, 2], jnp.zeros((n_rct,), jnp.float32)])
        lx, ly, lz = px - jnp.take(scx, k_best), py - jnp.take(scy, k_best), pz - jnp.take(scz, k_best)
        inv_r = 1.0 / jnp.take(sr, k_best)
        sph_n = (lx * inv_r, ly * inv_r, lz * inv_r)
        if checker_tau > 0.0:
            sph_parity = 0.5 - 0.5 * soft_checker_q(
                (lx * cscale, ly * cscale, lz * cscale), checker_tau
            )
        else:
            sph_parity = jnp.mod(
                jnp.floor(lx * cscale) + jnp.floor(ly * cscale) + jnp.floor(lz * cscale), 2.0
            )
    else:
        sph_n = (jnp.zeros((H, W)),) * 3
        sph_parity = jnp.zeros((H, W))

    if n_rct:
        n_face = jnp.cross(scene.rects.edge_u, scene.rects.edge_v)  # (M,3)
        # rsqrt-based normalize: the same primitive sequence as
        # vm.vnormalize, so this path agrees BITWISE with the unrolled
        # pipeline and the fused_vec kernels.
        n2 = jnp.sum(n_face * n_face, axis=1, keepdims=True)
        n_unit = n_face * jax.lax.rsqrt(jnp.where(n2 > 1e-12, n2, 1.0))
        pad = jnp.zeros((n_sph, 3), jnp.float32)
        n_full = jnp.concatenate([pad, n_unit], axis=0)
        rnx = jnp.take(n_full[:, 0], k_best)
        rny = jnp.take(n_full[:, 1], k_best)
        rnz = jnp.take(n_full[:, 2], k_best)
        facing = jnp.where(rnx * dx + rny * dy + rnz * dz < 0.0, 1.0, -1.0)
        rct_n = (rnx * facing, rny * facing, rnz * facing)
        # Gather rect (a, b) texture coords per pixel.
        za = jnp.concatenate([jnp.zeros((n_sph, H, W)), ra], axis=0) if ra is not None else None
        zb = jnp.concatenate([jnp.zeros((n_sph, H, W)), rb], axis=0) if rb is not None else None
        ga = jnp.take_along_axis(za, k_best[None], axis=0)[0]
        gb = jnp.take_along_axis(zb, k_best[None], axis=0)[0]
        if checker_tau > 0.0:
            rct_parity = 0.5 - 0.5 * soft_checker_q(
                (ga * cscale, gb * cscale), checker_tau
            )
        else:
            rct_parity = jnp.mod(jnp.floor(ga * cscale) + jnp.floor(gb * cscale), 2.0)
    else:
        rct_n = (jnp.zeros((H, W)),) * 3
        rct_parity = jnp.zeros((H, W))

    nx = jnp.where(is_sph, sph_n[0], rct_n[0])
    ny = jnp.where(is_sph, sph_n[1], rct_n[1])
    nz = jnp.where(is_sph, sph_n[2], rct_n[2])
    parity = jnp.where(is_sph, sph_parity, rct_parity)
    if checker_tau > 0.0:
        # Continuous blend: gradients flow to colors AND (via the parity)
        # to hit positions / camera pose. parity in [0, 1].
        use2f = checker * parity
        base = [c1 + use2f * (c2 - c1) for c1, c2 in zip(col1, col2)]
    else:
        use2 = (checker * parity) > 0.5
        base = [jnp.where(use2, c2, c1) for c1, c2 in zip(col1, col2)]

    if n_rct and scene.rects.textured:
        # Image texture overrides the checker/solid base on rect pixels
        # (pipeline.rect_color semantics): bilinear-sample each rect's
        # texel grid at the gathered (a, b), selected by the winning rect.
        # O(M) trace in RECT count — acceptable: the large-N axis of this
        # module is spheres; texel counts live inside each sample.
        tex = scene.rects.texture  # (M, K, K, 3)
        tex_base = [jnp.zeros_like(base[0]) for _ in range(3)]
        for m_i in range(n_rct):
            tm = sample_texture(tex[m_i], ga, gb)
            sel_m = k_best == (n_sph + m_i)
            tex_base = [jnp.where(sel_m, t, tb) for t, tb in zip(tm, tex_base)]
        base = [jnp.where(is_sph, b, tb) for b, tb in zip(base, tex_base)]

    if n_sph and scene.spheres.textured:
        # Lat-long sphere texture (pipeline.sphere_color semantics), but
        # O(1) trace in N: gather the 4 bilinear corners from the FLAT
        # (N*K*K, 3) texel table with per-pixel indices (winner k_best +
        # texture_weights corners) — the arithmetic matches
        # pipeline.sample_texture term-for-term, so this path stays
        # bitwise-equal to the unrolled renderer.
        tex = scene.spheres.texture  # (N, K, K, 3)
        K = tex.shape[1]
        u, v = sphere_uv(sph_n)
        i0, i1, j0, j1, fi, fj = texture_weights(u, v, K, K, wrap_a=True)
        ksel = jnp.clip(k_best, 0, n_sph - 1)
        flat = tex.reshape(n_sph * K * K, 3)

        def g(i, j, c):
            return jnp.take(flat[:, c], (ksel * K + i) * K + j)

        tex_sph = [
            (1.0 - fi) * ((1.0 - fj) * g(i0, j0, c) + fj * g(i0, j1, c))
            + fi * ((1.0 - fj) * g(i1, j0, c) + fj * g(i1, j1, c))
            for c in range(3)
        ]
        base = [jnp.where(is_sph, t, b) for t, b in zip(tex_sph, base)]

    # Shading is shared VERBATIM with the unrolled pipeline and the
    # object-chunked Pallas kernels (fused_vec): only the object stage
    # (intersection + attribute gather) is path-specific, so the three
    # implementations agree bitwise wherever the hit decision agrees.
    at = {
        "nx": nx, "ny": ny, "nz": nz,
        "cr": base[0], "cg": base[1], "cb": base[2],
        "ka": ka, "kd": kd, "ks": ks, "shin": shin,
    }
    if with_mirror:
        at["mir"] = gather_obj(stacked(lambda m: m.mirror, lambda m: m.mirror))
    return at


# ---------------------------------------------------------------------------
# Soft-visibility rendering (silhouette-aware gradients; RenderConfig.soft_tau)
# ---------------------------------------------------------------------------


def _sphere_soft(scene: Scene, ox, oy, oz, dx, dy, dz, tau):
    """(t_rank, alpha) for all spheres, each (N, H, W).

    t_rank is the hit t where the ray hits, the closest-approach t for
    forward near-misses (so near-miss layers have a well-defined shading
    point), BIG otherwise. alpha = sigmoid(disc / (tau r^2)): the sphere's
    soft coverage — 0.5 exactly at the silhouette, ~1 inside, ~0 outside,
    with width ~2*tau*r in closest-approach distance. d(alpha)/d(center,
    radius) is the silhouette gradient the hard renderer lacks.
    """
    c = scene.spheres.center
    r = scene.spheres.radius
    cx, cy, cz = (c[:, k][:, None, None] for k in range(3))
    rr = r[:, None, None]
    ocx, ocy, ocz = ox[None] - cx, oy[None] - cy, oz[None] - cz
    b = _dotN(ocx, ocy, ocz, dx[None], dy[None], dz[None])
    cc = _dotN(ocx, ocy, ocz, ocx, ocy, ocz) - rr * rr
    disc = b * b - cc
    t = -b - vm.safe_sqrt(disc)
    hit = (disc > 0.0) & (t > T_EPS)
    ahead = hit | (-b > T_EPS)
    alpha = jnp.where(ahead, jax.nn.sigmoid(disc / (tau * rr * rr)), 0.0)
    # A near-miss only RANKS as a layer where its coverage is non-negligible
    # (the ~3.5*tau*r silhouette ring). Without this gate every sphere's
    # closest-approach point becomes a phantom layer for every pixel, and
    # two phantom layers hide the true surface behind them.
    near = alpha > 1e-3
    t_rank = jnp.where(hit, t, jnp.where(near & (-b > T_EPS), -b, BIG))
    return t_rank, alpha


def _occluded_soft(scene: Scene, ox, oy, oz, dx, dy, dz, dist, tau):
    """Soft occlusion in [0, 1]: 1 - prod_k (1 - alpha_k) over sphere
    occluders between the surface point and the light (rect occluders stay
    hard). Shadow silhouettes thus carry gradients to occluder centers and
    radii — the depth signal hard shadows discard (a sphere's shadow
    position on the ground plane pins its height)."""
    occ_parts = []
    if scene.spheres.count:
        c = scene.spheres.center
        r = scene.spheres.radius
        cx, cy, cz = (c[:, k][:, None, None] for k in range(3))
        rr = r[:, None, None]
        ocx, ocy, ocz = ox[None] - cx, oy[None] - cy, oz[None] - cz
        b = _dotN(ocx, ocy, ocz, dx[None], dy[None], dz[None])
        cc = _dotN(ocx, ocy, ocz, ocx, ocy, ocz) - rr * rr
        disc = b * b - cc
        t = -b - vm.safe_sqrt(disc)
        hit_between = (disc > 0.0) & (t > T_EPS) & (t < dist[None])
        ca_between = (-b > T_EPS) & (-b < dist[None])
        alpha = jnp.where(
            hit_between | ca_between,
            jax.nn.sigmoid(disc / (tau * rr * rr)),
            0.0,
        )
        occ_parts.append(alpha)
    if scene.rects.count:
        tr, _, _ = _rect_ts(scene, ox, oy, oz, dx, dy, dz)
        occ_parts.append((tr < dist[None]).astype(jnp.float32))
    if not occ_parts:
        return jnp.zeros_like(dist)
    alpha_all = jnp.concatenate(occ_parts, axis=0)
    return 1.0 - jnp.prod(1.0 - alpha_all, axis=0)


def _render_soft(scene: Scene, cfg: RenderConfig, row0=0, height: int | None = None,
                 oi: float = 0.0, oj: float = 0.0):
    """Two-layer soft compositing: the nearest (by t_rank) surface's shaded
    color is alpha-blended over the next-nearest surface's (which itself
    blends over the background). Sphere alphas are soft (silhouette
    gradients); rect alphas stay hard (config-5 optimizes spheres; rect
    silhouette relaxation would need an analogous edge distance).

    As soft_tau -> 0 alpha -> the hard step and the image converges to
    render_jnp_vec's: annealing recovers reference semantics.
    """
    import dataclasses

    H = cfg.height if height is None else height
    W = cfg.width
    ii = row0 + jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).astype(jnp.float32)
    jj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(jnp.float32)
    if oi or oj:  # spp subsample offset (see spp_average)
        ii, jj = ii + oi, jj + oj
    o, d = camera_rays(scene.camera, ii, jj, cfg.height, cfg.width, cfg.projection)
    ox, oy, oz = (jnp.broadcast_to(v, (H, W)) for v in o)
    dx, dy, dz = (jnp.broadcast_to(v, (H, W)) for v in d)

    n_sph = scene.spheres.count
    n_rct = scene.rects.count
    t_parts, a_parts = [], []
    ra = rb = None
    if n_sph:
        ts, alphas = _sphere_soft(scene, ox, oy, oz, dx, dy, dz, cfg.soft_tau)
        t_parts.append(ts)
        a_parts.append(alphas)
    if n_rct:
        tr, ra, rb = _rect_ts(scene, ox, oy, oz, dx, dy, dz)
        t_parts.append(tr)
        a_parts.append((tr < BIG * 0.5).astype(jnp.float32))
    if not t_parts:
        img = jnp.stack(miss_color(scene, (dx, dy, dz), (H, W)), axis=-1)
        return jnp.clip(img, 0.0, 1.0) if cfg.clip else img

    t_all = jnp.concatenate(t_parts, axis=0)
    a_all = jnp.concatenate(a_parts, axis=0)

    cfg_layer = dataclasses.replace(cfg, clip=False, soft_tau=0.0)

    def occluded_fn(so, ld, dist):
        return _occluded_soft(
            scene, so[0], so[1], so[2], ld[0], ld[1], ld[2], dist, cfg.soft_tau
        )

    def shade_layer(t_layers):
        k = jnp.argmin(t_layers, axis=0)
        t = jnp.take_along_axis(t_layers, k[None], axis=0)[0]
        a = jnp.take_along_axis(a_all, k[None], axis=0)[0]
        live = t < BIG * 0.5
        a = jnp.where(live, a, 0.0)
        at = _gather_layer(scene, k, t, (ox, oy, oz), (dx, dy, dz), ra, rb,
                           checker_tau=cfg.checker_tau)
        col = shade_from_attrs(
            scene, (ox, oy, oz), (dx, dy, dz), cfg_layer, (H, W), t, live, at,
            occluded_fn=occluded_fn,
        )
        return k, a, col

    k1, a1, c1 = shade_layer(t_all)
    # Mask the winner out and composite against the next-nearest surface,
    # so silhouette gradients blend toward the TRUE local background.
    n_all = t_all.shape[0]
    winner = jnp.arange(n_all)[:, None, None] == k1[None]
    t_all2 = jnp.where(winner, BIG, t_all)
    _, a2, c2 = shade_layer(t_all2)

    # Per-pixel miss color: the env-map sample of the primary ray when
    # Scene.env is present, else the flat background (shared miss_color —
    # identical to the hard paths' blend target).
    bg = miss_color(scene, (dx, dy, dz), (H, W))
    out = []
    for ch in range(3):
        behind = a2 * c2[ch] + (1.0 - a2) * bg[ch]
        out.append(a1 * c1[ch] + (1.0 - a1) * behind)
    img = jnp.stack(out, axis=-1)
    return jnp.clip(img, 0.0, 1.0) if cfg.clip else img
