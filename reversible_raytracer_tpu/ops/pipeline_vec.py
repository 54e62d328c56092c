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
from .pipeline import BIG, SHADOW_EPS, T_EPS, RenderConfig, camera_rays


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


def render_jnp_vec(scene: Scene, cfg: RenderConfig, row0=0, height: int | None = None):
    """Object-vectorized full render. Returns (H, W, 3) float32."""
    if cfg.spp != 1:
        raise NotImplementedError("spp>1: use the primary pipeline")
    H = cfg.height if height is None else height
    W = cfg.width
    ii = row0 + jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).astype(jnp.float32)
    jj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(jnp.float32)
    o, d = camera_rays(scene.camera, ii, jj, cfg.height, cfg.width, cfg.projection)
    ox, oy, oz = (jnp.broadcast_to(c, (H, W)) for c in o)
    dx, dy, dz = (jnp.broadcast_to(c, (H, W)) for c in d)

    n_sph = scene.spheres.count
    n_rct = scene.rects.count
    parts = []
    if n_sph:
        parts.append(_sphere_ts(scene, ox, oy, oz, dx, dy, dz))
    ra = rb = None
    if n_rct:
        tr, ra, rb = _rect_ts(scene, ox, oy, oz, dx, dy, dz)
        parts.append(tr)
    if not parts:
        img = jnp.broadcast_to(scene.background, (H, W, 3))
        return jnp.clip(img, 0.0, 1.0) if cfg.clip else img

    t_all = jnp.concatenate(parts, axis=0)  # (N+M, H, W)
    k_best = jnp.argmin(t_all, axis=0)  # first-wins ties == unrolled chain
    t = jnp.take_along_axis(t_all, k_best[None], axis=0)[0]
    hit = t < BIG * 0.5

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
        sph_parity = jnp.mod(
            jnp.floor(lx * cscale) + jnp.floor(ly * cscale) + jnp.floor(lz * cscale), 2.0
        )
    else:
        sph_n = (jnp.zeros((H, W)),) * 3
        sph_parity = jnp.zeros((H, W))

    if n_rct:
        n_face = jnp.cross(scene.rects.edge_u, scene.rects.edge_v)  # (M,3)
        n_unit = n_face / jnp.linalg.norm(n_face, axis=1, keepdims=True)
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
        rct_parity = jnp.mod(jnp.floor(ga * cscale) + jnp.floor(gb * cscale), 2.0)
    else:
        rct_n = (jnp.zeros((H, W)),) * 3
        rct_parity = jnp.zeros((H, W))

    nx = jnp.where(is_sph, sph_n[0], rct_n[0])
    ny = jnp.where(is_sph, sph_n[1], rct_n[1])
    nz = jnp.where(is_sph, sph_n[2], rct_n[2])
    parity = jnp.where(is_sph, sph_parity, rct_parity)
    use2 = (checker * parity) > 0.5
    base = [jnp.where(use2, c2, c1) for c1, c2 in zip(col1, col2)]

    if cfg.shader == "depth":
        z = jnp.where(hit, 1.0 / (1.0 + t), 0.0)
        return jnp.stack([z, z, z], axis=-1)
    if cfg.shader == "normal":
        return jnp.stack(
            [jnp.where(hit, c * 0.5 + 0.5, 0.0) for c in (nx, ny, nz)], axis=-1
        )

    amb = scene.ambient
    col = [ka * base[k] * amb[k] for k in range(3)]
    sx, sy, sz = px + SHADOW_EPS * nx, py + SHADOW_EPS * ny, pz + SHADOW_EPS * nz
    for li in range(scene.lights.count):
        lp = scene.lights.position[li]
        lc = scene.lights.color[li]
        lvx, lvy, lvz = lp[0] - sx, lp[1] - sy, lp[2] - sz
        dist = vm.safe_sqrt(lvx * lvx + lvy * lvy + lvz * lvz)
        inv = 1.0 / jnp.where(dist > 1e-9, dist, 1.0)
        ldx, ldy, ldz = lvx * inv, lvy * inv, lvz * inv
        if cfg.shadows:
            vis = jnp.where(_occluded_any(scene, sx, sy, sz, ldx, ldy, ldz, dist), 0.0, 1.0)
        else:
            vis = 1.0
        ndotl = jnp.maximum(nx * ldx + ny * ldy + nz * ldz, 0.0)
        rx, ry, rz = 2 * ndotl * nx - ldx, 2 * ndotl * ny - ldy, 2 * ndotl * nz - ldz
        rdotv = jnp.maximum(-(rx * dx + ry * dy + rz * dz), 0.0)
        spec = ks * vm.safe_pow(rdotv, shin)
        for k in range(3):
            col[k] = col[k] + vis * (kd * ndotl * base[k] + spec) * lc[k]

    img = jnp.stack(
        [jnp.where(hit, c, scene.background[k]) for k, c in enumerate(col)], axis=-1
    )
    return jnp.clip(img, 0.0, 1.0) if cfg.clip else img
