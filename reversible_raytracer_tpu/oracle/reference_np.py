"""Float64 pure-numpy oracle renderer.

Role (SURVEY.md P5, §4): the BASELINE fidelity requirement is "images and
pixel gradients match the Theano reference allclose" (BASELINE.json:5).
Theano cannot be installed here (no network egress), so this module is the
equivalence oracle: a deliberately *independent* implementation — numpy,
float64, array-of-structs (H, W, 3) layout, no code shared with the jnp/SoA
pipeline — of exactly the reference semantics:

- nearest-hit select via masked argmin (≙ Theano nested `T.switch`),
- `max(., 0)` clamps in shading,
- hard step-function shadows,
- near-root-only sphere intersection with t > eps.

Tests assert `allclose(render_jnp(scene), oracle_render(scene))` at f32
tolerances, and check `jax.grad` against central finite differences of the
oracle loss (the gradient-fidelity triangulation described in SURVEY.md §4.2).
"""

from __future__ import annotations

import numpy as np

BIG = 1e10
T_EPS = 1e-3
SHADOW_EPS = 1e-3


def _np(x):
    return np.asarray(x, dtype=np.float64)


def _normalize(v, axis=-1):
    n = np.linalg.norm(v, axis=axis, keepdims=True)
    return v / np.where(n > 1e-12, n, 1.0)


def _camera_rays(cam, H, W, projection="perspective"):
    eye = _np(cam.eye)
    look = _np(cam.look_at)
    up_hint = _np(cam.up)
    fwd = _normalize(look - eye, axis=0)
    right = _normalize(np.cross(fwd, up_hint), axis=0)
    up = np.cross(right, fwd)
    tanf = np.tan(np.deg2rad(float(cam.fov_deg)) * 0.5)
    aspect = W / H
    jj, ii = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    sx = ((jj + 0.5) * (2.0 / W) - 1.0) * tanf * aspect
    sy = (1.0 - (ii + 0.5) * (2.0 / H)) * tanf
    if projection == "orthographic":
        dist = np.linalg.norm(look - eye)
        o = (
            eye[None, None, :]
            + (sx * dist)[..., None] * right[None, None, :]
            + (sy * dist)[..., None] * up[None, None, :]
        )
        d = np.broadcast_to(fwd, o.shape)
        return o, d
    d = fwd[None, None, :] + sx[..., None] * right[None, None, :] + sy[..., None] * up[None, None, :]
    d = _normalize(d)
    o = np.broadcast_to(eye, d.shape)
    return o, d


def _intersect_spheres(o, d, centers, radii):
    """t for every sphere: (N, H, W). BIG where miss."""
    if len(centers) == 0:
        return np.zeros((0,) + o.shape[:2])
    oc = o[None] - centers[:, None, None, :]  # (N, H, W, 3)
    b = np.einsum("nhwc,hwc->nhw", oc, d)
    c = np.einsum("nhwc,nhwc->nhw", oc, oc) - (radii**2)[:, None, None]
    disc = b * b - c
    hit = disc > 0.0
    t = -b - np.sqrt(np.where(hit, disc, 0.0))
    valid = hit & (t > T_EPS)
    return np.where(valid, t, BIG)


def _intersect_rects(o, d, origin, eu, ev):
    """(t, a, b) for every rect: each (M, H, W)."""
    M = len(origin)
    if M == 0:
        z = np.zeros((0,) + o.shape[:2])
        return z, z, z
    n = np.cross(eu, ev)  # (M, 3)
    denom = np.einsum("hwc,mc->mhw", d, n)
    grazing = np.abs(denom) > 1e-9
    denom_safe = np.where(grazing, denom, 1.0)
    t = np.einsum("mhwc,mc->mhw", origin[:, None, None, :] - o[None], n) / denom_safe
    p = o[None] + t[..., None] * d[None]
    rel = p - origin[:, None, None, :]
    a = np.einsum("mhwc,mc->mhw", rel, eu) / np.einsum("mc,mc->m", eu, eu)[:, None, None]
    b = np.einsum("mhwc,mc->mhw", rel, ev) / np.einsum("mc,mc->m", ev, ev)[:, None, None]
    valid = grazing & (t > T_EPS) & (a >= 0) & (a <= 1) & (b >= 0) & (b <= 1)
    return np.where(valid, t, BIG), a, b


def _checker(mat_checker, mat_scale, c1, c2, parity):
    use2 = (mat_checker * parity) > 0.5
    return np.where(use2[..., None], c2, c1)


def _soft_checker_q(parts, tau):
    """float64 mirror of pipeline.soft_checker_q (RenderConfig.checker_tau),
    INCLUDING the 1e-6 denominator guard, so finite differences of this
    oracle validate the jnp analytic gradient of the same function."""
    q = 1.0
    for p in parts:
        tri = 2.0 * np.abs(np.mod(p - 0.5, 2.0) - 1.0) - 1.0
        q = q * (tri / (np.abs(tri) + tau + 1e-6))
    return q


def _checker_soft(mat_checker, c1, c2, parts, tau):
    use2 = mat_checker * (0.5 - 0.5 * _soft_checker_q(parts, tau))
    return c1 + use2[..., None] * (c2 - c1)


def _sample_texture(tex, a, b, wrap_a=False):
    """f64 mirror of pipeline.sample_texture: bilinear, clamp-at-edge
    (``wrap_a`` wraps the first axis — the lat-long azimuth seam).
    tex (Ka, Kb, 3); a, b (H, W) in [0, 1]. Returns (H, W, 3)."""
    ka, kb = tex.shape[0], tex.shape[1]
    u = a * ka - 0.5
    v = b * kb - 0.5
    if wrap_a:
        i0f = np.floor(u)
        fi = (u - i0f)[..., None]
        i0 = np.mod(i0f.astype(np.int64), ka)
        i1 = np.mod(i0 + 1, ka)
    else:
        i0f = np.clip(np.floor(u), 0.0, ka - 1)
        fi = np.clip(u - i0f, 0.0, 1.0)[..., None]
        i0 = i0f.astype(np.int64)
        i1 = np.minimum(i0 + 1, ka - 1)
    j0f = np.clip(np.floor(v), 0.0, kb - 1)
    fj = np.clip(v - j0f, 0.0, 1.0)[..., None]
    j0 = j0f.astype(np.int64)
    j1 = np.minimum(j0 + 1, kb - 1)
    t00 = tex[i0, j0]
    t01 = tex[i0, j1]
    t10 = tex[i1, j0]
    t11 = tex[i1, j1]
    return (1.0 - fi) * ((1.0 - fj) * t00 + fj * t01) + fi * ((1.0 - fj) * t10 + fj * t11)


_MAT_FIELDS = ("color", "color2", "checker", "checker_scale", "ka", "kd",
               "ks", "shininess", "mirror")


def _scene_arrays(scene):
    sp = scene.spheres
    rc = scene.rects
    return {
        "sc": _np(sp.center),
        "sr": _np(sp.radius),
        "smat": {f: _np(getattr(sp.material, f)) for f in _MAT_FIELDS},
        "stex": _np(sp.texture),  # (N, K, K, 3); K == 0 -> untextured
        "ro": _np(rc.origin),
        "ru": _np(rc.edge_u),
        "rv": _np(rc.edge_v),
        "rtex": _np(rc.texture),  # (M, K, K, 3); K == 0 -> untextured
        "rmat": {f: _np(getattr(rc.material, f)) for f in _MAT_FIELDS},
        "lp": _np(scene.lights.position),
        "lc": _np(scene.lights.color),
        "ambient": _np(scene.ambient),
        "bg": _np(scene.background),
        "env": _np(scene.env),  # (K, K, 3); K == 0 -> flat background
    }


def _all_hits(arr, o, d):
    """Concatenated t-maps + per-object shading attrs for spheres then rects."""
    H, W = o.shape[:2]
    ts = _intersect_spheres(o, d, arr["sc"], arr["sr"])  # (N, H, W)
    tr, ra, rb = _intersect_rects(o, d, arr["ro"], arr["ru"], arr["rv"])
    return ts, tr, ra, rb


def _occluded(arr, o, ldir, dist):
    ts, tr, _, _ = _all_hits(arr, o, ldir)
    occ = np.zeros(dist.shape, dtype=bool)
    if ts.shape[0]:
        occ |= (ts < dist[None]).any(axis=0)
    if tr.shape[0]:
        occ |= (tr < dist[None]).any(axis=0)
    return occ


def render(scene, height, width, shadows=True, clip=True, projection="perspective",
           checker_tau=0.0, reflections=0):
    """Render the scene exactly like the jnp/Pallas pipeline claims to.

    Returns float64 (H, W, 3). ``checker_tau`` > 0 enables the soft-checker
    relaxation (RenderConfig.checker_tau) in f64 — the FD oracle for the
    texture->position->camera gradient path. ``reflections`` mirrors
    RenderConfig.reflections (specular bounces, lerp(local, reflected,
    material.mirror), unclipped per level, one clip at top).
    """
    arr = _scene_arrays(scene)
    o, d = _camera_rays(scene.camera, height, width, projection)
    H, W = height, width
    colimg = _radiance(arr, o, d, H, W, shadows, checker_tau, reflections)
    if clip:
        colimg = np.clip(colimg, 0.0, 1.0)
    return colimg


def _radiance(arr, o, d, H, W, shadows, checker_tau, depth):
    """Unclipped radiance for rays (o, d), recursing ``depth`` mirror
    bounces. The hit/background select applies at every level (a reflected
    ray that misses sees the background color)."""
    col, hit, p, normal, mir = _shade_level(arr, o, d, H, W, shadows, checker_tau)
    if depth > 0:
        ddotn = np.einsum("hwc,hwc->hw", d, normal)
        rdir = d - 2.0 * ddotn[..., None] * normal
        ro = p + SHADOW_EPS * normal
        rcol = _radiance(arr, ro, rdir, H, W, shadows, checker_tau, depth - 1)
        m = np.where(hit, mir, 0.0)
        col = col + m[..., None] * (rcol - col)
    return col


def _miss_color(arr, d, H, W):
    """f64 mirror of pipeline.miss_color: the lat-long env-map sample of
    the (unit) ray direction when Scene.env is present (sphere_uv of d —
    azimuth wraps, polar clamps, guard included), else the background."""
    if arr["env"].size:
        uu = np.arctan2(d[..., 2], d[..., 0]) * (0.5 / np.pi) + 0.5
        vv = 0.5 - np.arcsin(
            np.clip(d[..., 1], -1.0 + 1e-6, 1.0 - 1e-6)
        ) / np.pi
        return _sample_texture(arr["env"], uu, vv, wrap_a=True)
    return np.broadcast_to(arr["bg"], (H, W, 3))


def _shade_level(arr, o, d, H, W, shadows, checker_tau):
    """One trace + local shade. Returns (color-with-bg-select, hit, hit
    point, normal, mirror plane) — everything a bounce level needs."""
    ts, tr, ra, rb = _all_hits(arr, o, d)
    t_all = np.concatenate([ts, tr], axis=0)  # (N+M, H, W)
    n_sph = ts.shape[0]
    n_obj = t_all.shape[0]

    if n_obj == 0:
        img = _miss_color(arr, d, H, W).copy()
        zero = np.zeros((H, W))
        return img, np.zeros((H, W), bool), o * np.ones((H, W, 3)), np.zeros((H, W, 3)), zero

    # Nearest hit with ties toward the earlier object (matching the unrolled
    # where-chain: a strictly-closer later object wins, ties keep earlier).
    k_best = np.argmin(t_all, axis=0)  # numpy argmin takes first min == earlier
    t_best = np.take_along_axis(t_all, k_best[None], axis=0)[0]
    hit = t_best < BIG * 0.5

    p = o + t_best[..., None] * d

    # Per-pixel normals, colors, coefficients.
    normal = np.zeros((H, W, 3))
    base = np.zeros((H, W, 3))
    coeff = {f: np.zeros((H, W)) for f in ("ka", "kd", "ks", "shininess", "mirror")}
    for k in range(n_obj):
        sel = k_best == k
        if not sel.any():
            continue
        if k < n_sph:
            m = arr["smat"]
            center = arr["sc"][k]
            plocal = p - center
            nrm = plocal / arr["sr"][k]
            s = m["checker_scale"][k]
            if arr["stex"].size:
                # Lat-long texture (pipeline.sphere_uv semantics, guard
                # included): azimuth wraps, polar clamps.
                uu = np.arctan2(nrm[..., 2], nrm[..., 0]) * (0.5 / np.pi) + 0.5
                vv = 0.5 - np.arcsin(
                    np.clip(nrm[..., 1], -1.0 + 1e-6, 1.0 - 1e-6)
                ) / np.pi
                col = _sample_texture(arr["stex"][k], uu, vv, wrap_a=True)
            elif checker_tau > 0.0:
                col = _checker_soft(
                    m["checker"][k], m["color"][k], m["color2"][k],
                    (plocal[..., 0] * s, plocal[..., 1] * s, plocal[..., 2] * s),
                    checker_tau,
                )
            else:
                parity = np.mod(
                    np.floor(plocal[..., 0] * s)
                    + np.floor(plocal[..., 1] * s)
                    + np.floor(plocal[..., 2] * s),
                    2.0,
                )
                col = _checker(m["checker"][k], s, m["color"][k], m["color2"][k], parity)
            mk = k
        else:
            m = arr["rmat"]
            mk = k - n_sph
            n_face = np.cross(arr["ru"][mk], arr["rv"][mk])
            n_unit = n_face / np.linalg.norm(n_face)
            nrm = np.broadcast_to(n_unit, (H, W, 3)).copy()
            facing = np.where(np.einsum("hwc,c->hw", d, n_unit) < 0.0, 1.0, -1.0)
            nrm = nrm * facing[..., None]
            s = m["checker_scale"][mk]
            if arr["rtex"].size:
                # Image texture replaces the checker/solid base color
                # (pipeline.rect_color semantics).
                col = _sample_texture(arr["rtex"][mk], ra[mk], rb[mk])
            elif checker_tau > 0.0:
                col = _checker_soft(
                    m["checker"][mk], m["color"][mk], m["color2"][mk],
                    (ra[mk] * s, rb[mk] * s), checker_tau,
                )
            else:
                parity = np.mod(
                    np.floor(ra[mk] * s) + np.floor(rb[mk] * s),
                    2.0,
                )
                col = _checker(m["checker"][mk], s, m["color"][mk], m["color2"][mk], parity)
        normal[sel] = nrm[sel]
        base[sel] = col[sel]
        for f in coeff:
            coeff[f][sel] = m[f][mk]

    # Shading.
    colimg = coeff["ka"][..., None] * base * arr["ambient"][None, None, :]
    view = -d
    shadow_o = p + SHADOW_EPS * normal
    for li in range(arr["lp"].shape[0]):
        lvec = arr["lp"][li] - shadow_o
        dist = np.linalg.norm(lvec, axis=-1)
        ldir = lvec / np.where(dist[..., None] > 1e-9, dist[..., None], 1.0)
        vis = np.ones((H, W))
        if shadows:
            vis = np.where(_occluded(arr, shadow_o, ldir, dist), 0.0, 1.0)
        ndotl = np.maximum(np.einsum("hwc,hwc->hw", normal, ldir), 0.0)
        refl = 2.0 * ndotl[..., None] * normal - ldir
        rdotv = np.maximum(np.einsum("hwc,hwc->hw", refl, view), 0.0)
        spec = coeff["ks"] * np.where(rdotv > 0, rdotv, 1.0) ** coeff["shininess"] * (rdotv > 0)
        contrib = (coeff["kd"] * ndotl)[..., None] * base + spec[..., None]
        colimg = colimg + (vis[..., None] * contrib) * arr["lc"][li][None, None, :]

    colimg = np.where(hit[..., None], colimg, _miss_color(arr, d, H, W))
    return colimg, hit, p, normal, coeff["mirror"]


def mse_loss(image, target):
    d = image - np.asarray(target, dtype=np.float64)
    return float(np.mean(d * d))
