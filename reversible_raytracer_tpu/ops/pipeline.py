"""The differentiable raytracing pipeline, SoA, tile-oriented.

This module is the single source of truth for the render math. Both the
pure-jnp renderer (`ops.render`) and the fused Pallas TPU kernels
(`ops.kernels.fused`) call `render_tile` — the jnp path with the tile equal
to the whole image, the Pallas path with (bh, bw) VMEM-resident tiles. That
one-source design is what makes the "Pallas kernels match the jnp path
exactly" fidelity requirement (SURVEY.md §4.2) hold by construction.

Capability parity with the reference (lebek/reversible-raytracer; mount was
empty — SURVEY.md §0 — so parity targets come from BASELINE.json:5):
  - pinhole camera ray generation            (SURVEY.md C3)
  - ray-sphere + ray-rect intersection       (C4, C5)
  - nearest-hit resolution via where-select  (C6; Theano `T.switch` ≙ jnp.where,
    so subgradient conventions at hit boundaries match)
  - Lambertian + Phong shading               (C7)
  - shadow rays (binary visibility)          (C8)
  - checker materials, optimizable camera    (driver configs 4-5)

Everything here is pure jnp on tuples-of-arrays: it traces inside jit,
shard_map, Pallas kernel bodies, and under jax.vjp (which is how the fused
backward kernel replays the forward — SURVEY.md §7 "recompute-in-backward").
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..models.scene import Scene
from . import vecmath as vm
from .vecmath import Vec3

# Sentinel for "no hit". Big but finite: keeps t arithmetic NaN-free.
BIG = 1e10
# Minimum ray parameter for a valid hit (avoids self-intersection re-hits).
T_EPS = 1e-3
# Offset of shadow-ray origins along the surface normal.
SHADOW_EPS = 1e-3


@dataclass(frozen=True)
class RenderConfig:
    """Static (trace-time) render options. Not part of the scene pytree."""

    height: int
    width: int
    shadows: bool = True
    clip: bool = True  # clip final color to [0, 1] (reference-faithful output)
    # Shader variant (SURVEY.md C15): "phong" is the full Lambertian+Phong
    # pipeline; "depth" renders 1/(1+t) (white near, black far, 0 on miss);
    # "normal" renders the camera-facing normal mapped to [0,1]^3.
    shader: str = "phong"
    # Camera projection (SURVEY.md C3 mentions an orthographic variant).
    # "orthographic" keeps the perspective framing at the look_at plane:
    # the ortho half-height is tan(fov/2) * |look_at - eye|, so switching
    # projections frames the same scene comparably.
    projection: str = "perspective"  # "perspective" | "orthographic"
    # Samples per pixel (anti-aliasing): 1 = pixel centers (reference
    # semantics); 4 = a 2x2 subpixel grid averaged in place — fully fused in
    # the kernels (no extra HBM traffic), and the area-averaging slightly
    # softens silhouette edges, which also improves gradient quality at
    # geometric boundaries.
    spp: int = 1  # 1 | 4
    # Soft-visibility relaxation (silhouette-aware gradients; a capability
    # extension beyond the reference's hard-step semantics). 0.0 = hard
    # (reference-faithful, the default). tau > 0 renders sphere silhouettes
    # with coverage alpha = sigmoid(disc / (tau * r^2)) composited over the
    # next-nearest surface, so sphere centers/radii receive gradient signal
    # AT their silhouettes (raytracer autodiff otherwise has none — see
    # docs/OPTIMIZATION_NOTES.md). Anneal tau -> 0 during inverse rendering
    # (optim.optimize_annealed); the tau -> 0 limit is the hard image.
    # jnp_vec-path only.
    soft_tau: float = 0.0
    # Mirror reflections (capability extension beyond the reference's
    # local-shading model): number of specular bounces. 0 = off (reference
    # semantics, zero extra cost — the bounce code is not traced at all).
    # With k bounces the color at each level is lerp(local, reflected,
    # material.mirror) — a continuous blend, so mirror coefficients AND the
    # geometry seen through reflections receive gradients. Phong shader
    # only (depth/normal shaders ignore it); hard semantics only (the soft
    # soft_tau / checker_tau relaxations refuse reflections). Implemented
    # by the unrolled family (jnp / pallas, incl. the fused step kernel —
    # they all trace render_tile) and the object-vectorized jnp_vec path;
    # the object-chunked Pallas kernels (pallas_vec[_soft]) refuse.
    reflections: int = 0
    # Soft-checker relaxation (texture-aware CAMERA/position gradients).
    # The reference-faithful checker is a floor/mod step: zero gradient to
    # hit positions, so camera pose optimized against a checkered scene
    # (driver config 4) receives only aliasing noise and diverges (measured:
    # camera-only inversion loss 0.012 -> 0.060 over 150 Adam steps).
    # checker_tau > 0 replaces the parity step with a smooth triangle-wave
    # product q = prod_i tri(u_i*s) / (|tri| + tau) — transcendental-free
    # (Mosaic-safe: mod/abs/div only), gradient support EVERYWHERE (not just
    # a boundary ring), exact hard parity as tau -> 0. Units: checker cells
    # (tau ~ 1 = near-linear low-contrast wave; 0.1 = sharp). Anneal with
    # soft_tau (optim.optimize_annealed checker_ratio). Soft-family only
    # (jnp_vec / pallas_vec_soft); the hard kernels refuse it.
    checker_tau: float = 0.0

    @property
    def shape(self):
        return (self.height, self.width)


# ---------------------------------------------------------------------------
# Camera
# ---------------------------------------------------------------------------


def camera_basis(cam) -> tuple[Vec3, Vec3, Vec3]:
    """Orthonormal (right, up, forward) from eye/look_at/up.

    Differentiable w.r.t. the pose (config 4 optimizes eye/look_at)."""
    eye = vm.splat(cam.eye)
    look = vm.splat(cam.look_at)
    up_hint = vm.splat(cam.up)
    fwd = vm.vnormalize(vm.vsub(look, eye))
    right = vm.vnormalize(vm.vcross(fwd, up_hint))
    up = vm.vcross(right, fwd)
    return right, up, fwd


def camera_rays(cam, ii, jj, H: int, W: int, projection: str = "perspective") -> tuple[Vec3, Vec3]:
    """Per-pixel ray (origin, unit direction) for pixel rows ``ii`` / cols
    ``jj`` (float arrays of any broadcastable shape).

    The Pallas kernel calls this with tile-local iota + tile offset, so ray
    generation is *fused into the kernel*: rays never touch HBM (the
    reference materialized the full H*W*3 ray tensors; SURVEY.md §3.2).
    """
    right, up, fwd = camera_basis(cam)
    tanf = jnp.tan(jnp.deg2rad(cam.fov_deg) * 0.5)
    aspect = W / H
    # Pixel centers -> NDC in [-1, 1], y up.
    sx = ((jj + 0.5) * (2.0 / W) - 1.0) * tanf * aspect
    sy = (1.0 - (ii + 0.5) * (2.0 / H)) * tanf
    if projection == "orthographic":
        # Parallel rays along +fwd; the image plane spans the perspective
        # frustum's footprint at the look_at distance.
        eye = vm.splat(cam.eye)
        dist = vm.vnorm(vm.vsub(vm.splat(cam.look_at), eye))
        o = vm.vadd(
            eye,
            vm.vadd(vm.vscale(right, sx * dist), vm.vscale(up, sy * dist)),
        )
        return o, fwd  # scalar components broadcast against pixel arrays
    d = vm.vnormalize(
        vm.vadd(fwd, vm.vadd(vm.vscale(right, sx), vm.vscale(up, sy)))
    )
    o = vm.splat(cam.eye)
    return o, d


# ---------------------------------------------------------------------------
# Intersection
# ---------------------------------------------------------------------------


def intersect_sphere(o: Vec3, d: Vec3, center, radius):
    """Nearest positive ray-sphere intersection t, BIG on miss.

    Quadratic with unit ``d``: t^2 + 2 b t + c = 0, b = oc.d, c = |oc|^2-r^2.
    Near root ``-b - sqrt(disc)``. The discriminant sqrt is guarded so
    tangent rays don't emit NaN in reverse mode (SURVEY.md §7 hard parts).
    """
    oc = vm.vsub(o, vm.splat(center))
    b = vm.vdot(oc, d)
    c = vm.vdot(oc, oc) - radius * radius
    disc = b * b - c
    hit = disc > 0.0
    t = -b - vm.safe_sqrt(disc)
    valid = hit & (t > T_EPS)
    return jnp.where(valid, t, BIG)


def intersect_rect(o: Vec3, d: Vec3, origin, edge_u, edge_v):
    """Ray-parallelogram intersection.

    Returns (t, a, b, n) where (a, b) are the in-face coordinates in [0, 1]
    (doubling as texture coordinates) and n the *unnormalized* face normal
    edge_u x edge_v. t = BIG outside the patch or behind the origin.
    """
    p0 = vm.splat(origin)
    eu = vm.splat(edge_u)
    ev = vm.splat(edge_v)
    n = vm.vcross(eu, ev)
    denom = vm.vdot(d, n)
    grazing = jnp.abs(denom) > 1e-9
    denom_safe = jnp.where(grazing, denom, 1.0)
    t = vm.vdot(vm.vsub(p0, o), n) / denom_safe
    p = vm.vadd(o, vm.vscale(d, t))
    rel = vm.vsub(p, p0)
    inv_u2 = 1.0 / vm.vdot(eu, eu)
    inv_v2 = 1.0 / vm.vdot(ev, ev)
    a = vm.vdot(rel, eu) * inv_u2
    b = vm.vdot(rel, ev) * inv_v2
    valid = (
        grazing
        & (t > T_EPS)
        & (a >= 0.0)
        & (a <= 1.0)
        & (b >= 0.0)
        & (b <= 1.0)
    )
    return jnp.where(valid, t, BIG), a, b, n


# ---------------------------------------------------------------------------
# Materials
# ---------------------------------------------------------------------------


def _checker_select(mat, k, parity) -> Vec3:
    """Blend color/color2 by checker parity; solid color when checker==0.

    ``parity`` is 0/1 per pixel. The select is a step function (zero
    gradient to positions, full gradient to the two colors) — the same
    subgradient convention as a Theano switch-based checker.
    """
    c1 = vm.splat(mat.color[k])
    c2 = vm.splat(mat.color2[k])
    use2 = mat.checker[k] * parity  # 0 or 1 per pixel
    return vm.vwhere(use2 > 0.5, c2, c1)


def soft_checker_q(parts, tau):
    """Smooth parity sign q in [-1, 1]: +1 deep in even cells, -1 in odd,
    crossing 0 at cell boundaries (RenderConfig.checker_tau semantics).

    Per axis: tri(x) = 2*|mod(x - 0.5, 2) - 1| - 1 is the piecewise-linear
    wave equal to (-1)^floor(x) at cell centers and 0 at integers; the
    rational squash tri / (|tri| + tau) -> sign(tri) as tau -> 0 (the hard
    parity, since (-1)^{sum floor} = prod (-1)^{floor}), with gradient
    tau / (|tri| + tau)^2 — non-zero over the WHOLE cell, which is what
    lets a misaligned camera feel the texture from up to half a cell away.
    Transcendental-free (mod/abs/div): lowers on the Mosaic VPU, where
    `powf`/float-iota do not (see ops/kernels/fused.py docstring).

    ``tau`` may be a traced scalar (runtime SMEM value in the soft kernels);
    the 1e-6 guard keeps q AND its vjp finite at tri == 0 even when
    tau == 0, so a `where(tau > 0, soft, hard)` select around it is AD-safe.
    (The guard must stay well above f32 underflow: the div vjp squares the
    denominator, and a 1e-30 guard makes denom^2 flush to 0 -> 0/0 NaN,
    which then poisons masked-out camera cotangents via 0 * NaN.)
    """
    q = 1.0
    for p in parts:
        # 2|mod(x-0.5, 2) - 1| - 1: +1 at even-cell centers (x = 0.5), -1 at
        # odd (x = 1.5), 0 at integer cell boundaries.
        tri = 2.0 * jnp.abs(jnp.mod(p - 0.5, 2.0) - 1.0) - 1.0
        q = q * (tri / (jnp.abs(tri) + tau + 1e-6))
    return q


def texture_weights(a, b, ka: int, kb: int, wrap_a: bool = False):
    """Bilinear corner indices + weights for uv (a, b) over a (ka, kb)
    grid: returns (i0, i1, j0, j1, fi, fj), all (pixel-shaped). ``wrap_a``
    wraps the first axis (lat-long azimuth seam) instead of clamping —
    the b axis always clamps. Shared by every implementation (unrolled,
    object-vectorized flat-gather, and the oracles mirror it) so the
    corner/weight choice is identical everywhere.

    Differentiable BOTH ways: d/d(texels) is the gather's scatter-add
    transpose (every visible texel receives gradient — texture recovery),
    and d/d(a, b) is the piecewise-linear interpolation weight gradient,
    which flows through the hit coordinates to geometry and the camera."""
    u = a * ka - 0.5
    v = b * kb - 0.5
    if wrap_a:
        i0f = jnp.floor(u)
        fi = u - i0f
        i0 = jnp.mod(i0f.astype(jnp.int32), ka)
        i1 = jnp.mod(i0 + 1, ka)
    else:
        i0f = jnp.clip(jnp.floor(u), 0.0, ka - 1)
        fi = jnp.clip(u - i0f, 0.0, 1.0)
        i0 = i0f.astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, ka - 1)
    j0f = jnp.clip(jnp.floor(v), 0.0, kb - 1)
    fj = jnp.clip(v - j0f, 0.0, 1.0)
    j0 = j0f.astype(jnp.int32)
    j1 = jnp.minimum(j0 + 1, kb - 1)
    return i0, i1, j0, j1, fi, fj


def sample_texture(tex, a, b, wrap_a: bool = False) -> Vec3:
    """Bilinear sample of a (Ka, Kb, 3) texel grid at uv (a, b) in [0,1]^2
    (a indexes the first texture axis). Clamp-at-edge addressing; pass
    ``wrap_a`` for the lat-long azimuth axis. See `texture_weights`.

    Two implementations of the SAME math, chosen by the texel container:

    - jnp array: 4-corner gather (`texture_weights` indices) — XLA's job.
    - nested tuple (the Pallas kernels' SMEM scalar view of the scene —
      ops/kernels/fused.py): `sample_texture_dense`, which needs only
      STATICALLY-indexed texel reads, because Mosaic has no per-pixel
      gather. Dispatching on the container keeps every caller
      (rect_color/sphere_color, hence render_tile and all kernels that
      trace it) on one code path.
    """
    if isinstance(tex, (tuple, list)):
        return sample_texture_dense(tex, a, b, wrap_a)
    ka, kb = tex.shape[0], tex.shape[1]
    i0, i1, j0, j1, fi, fj = texture_weights(a, b, ka, kb, wrap_a)
    out = []
    for c in range(3):
        t00 = tex[i0, j0, c]
        t01 = tex[i0, j1, c]
        t10 = tex[i1, j0, c]
        t11 = tex[i1, j1, c]
        out.append((1.0 - fi) * ((1.0 - fj) * t00 + fj * t01)
                   + fi * ((1.0 - fj) * t10 + fj * t11))
    return tuple(out)


def sample_texture_dense(tex, a, b, wrap_a: bool = False) -> Vec3:
    """Gather-free bilinear sample for the Pallas kernels: ``tex`` is a
    nested tuple (Ka)(Kb)(3) of scalars (the SMEM scene view).

    Bilinear interpolation is the hat-basis expansion
        out_c = sum_i w_i(u) * sum_j w_j(v) * tex[i][j][c],
    with w_i(u) = max(0, 1 - |clip(u) - i|) (tent function; circular
    distance on a wrapped axis). At most two w's per axis are non-zero and
    they equal the gather's (1-f, f) weights, so this is the SAME function
    as the gather path — zero terms add exactly (+0.0) in f32, leaving
    only ulp-level differences in the half-texel edge bands, where the
    clamp makes the gather split its weight across one texel ((1-f)+f
    rounds once) while the hat reads it directly. Every texel read is
    statically indexed, so the whole sample is scalar*tile multiply-adds —
    the Mosaic VPU's happy path (no per-pixel gather, which Mosaic cannot
    lower). Cost: O(Ka*Kb) MACs/pixel vs the gather's O(4) — at K=16 and
    512^2 that is ~0.2 GFLOP/render, noise on a VPU.

    d/d(texels) is exact (each texel's weight is its hat product);
    d/d(a, b) matches the gather's piecewise-linear subgradient except at
    texel centers (measure-zero kinks of the tent).
    """
    wis, wjs = hat_weights(tex, a, b, wrap_a)
    return texmix(tex, wis, wjs)


def hat_weights(tex, a, b, wrap_a: bool = False):
    """The (wis, wjs) tent-weight planes of `sample_texture_dense`,
    factored out so kernel families can swap the texel CONTRACTION (e.g.
    fused_vec's MXU backward) while keeping the weight math — and its
    autodiff wrt (a, b) — byte-identical to this reference."""
    ka, kb = len(tex), len(tex[0])
    u = a * ka - 0.5
    v = b * kb - 0.5
    if wrap_a and ka == 1:
        def wi(i):
            # Degenerate 1-texel wrapped axis: the gather's two corners
            # coincide and their weights sum to 1.
            return jnp.ones_like(u)
    elif wrap_a:
        def wi(i):
            # Circular tent: distance to texel i around the seam.
            m = jnp.mod(u - i, float(ka))
            return jnp.maximum(0.0, 1.0 - jnp.minimum(m, ka - m))
    else:
        uc = jnp.clip(u, 0.0, ka - 1)

        def wi(i):
            return jnp.maximum(0.0, 1.0 - jnp.abs(uc - i))

    vc = jnp.clip(v, 0.0, kb - 1)
    wis = tuple(wi(i) for i in range(ka))
    wjs = tuple(jnp.maximum(0.0, 1.0 - jnp.abs(vc - j)) for j in range(kb))
    return wis, wjs


def texmix(tex, wis, wjs) -> Vec3:
    """The texel contraction of `sample_texture_dense`:
    out_c = sum_i w_i * (sum_j tex[i][j][c] * w_j), in exactly this
    association order (the kernels' bit-exactness contracts ride on it)."""
    ka, kb = len(tex), len(tex[0])
    out = []
    for c in range(3):
        acc = 0.0
        for i in range(ka):
            row = 0.0
            for j in range(kb):
                row = row + tex[i][j][c] * wjs[j]
            acc = acc + wis[i] * row
        out.append(acc)
    return tuple(out)


def sphere_uv(n_unit: Vec3):
    """Lat-long UV of a unit sphere normal (y up): u = azimuth of (x, z)
    in [0, 1) (wraps at the atan2 seam — sample with wrap_a), v = polar
    angle in [0, 1] (0 at +y). The asin argument is clamped INSIDE ±1 so
    the pole derivative stays finite (asin' diverges at ±1; the clamp's
    zero-gradient band is one ulp-scale ring at the poles). Both oracles
    mirror this exact formula, guard included (they use libm
    atan2/asin — the ~2 ulp polynomial error of `vecmath.atan2` is far
    inside the oracle tolerances). vm.atan2/vm.asin, NOT jnp.arctan2:
    Mosaic has no atan/atan2/asin lowering, and using the polynomial in
    the jnp path too keeps kernel-vs-jnp comparisons tight."""
    nx, ny, nz = n_unit
    u = vm.atan2(nz, nx) * (0.5 / jnp.pi) + 0.5
    v = 0.5 - vm.asin(jnp.clip(ny, -1.0 + 1e-6, 1.0 - 1e-6)) / jnp.pi
    return u, v


def miss_color(scene, d: Vec3, shape) -> Vec3:
    """Color a missed ray sees: the lat-long environment-map sample of the
    (unit) ray direction when `Scene.env` is present (azimuth wraps —
    `sphere_uv` of d, same addressing as sphere textures; the Pallas
    kernels get the dense hat-basis sampler via the tuple-leaf dispatch),
    else the flat background color. Shared by the unrolled pipeline, the
    object-vectorized paths, and the soft compositor so the miss/blend
    color is identical everywhere; both oracles mirror it."""
    if getattr(scene, "env_mapped", False):
        u, v = sphere_uv(d)
        fn = getattr(scene, "env_dense_fn", None)
        if fn is not None and isinstance(scene.env, (tuple, list)):
            # Kernel-family override of the tuple-leaf dense sampler
            # (fused_vec's RRT_TEXBWD backend): identical forward math,
            # swapped cotangent computation. Real Scene objects have no
            # such attribute, so every jnp path is untouched.
            return fn(scene.env, u, v, True)
        return sample_texture(scene.env, u, v, wrap_a=True)
    bg = vm.splat(scene.background)
    return vm.vbroadcast(bg, shape)


def rect_color(rc, k, a, b) -> Vec3:
    """Base color of rect ``k`` at its (a, b) hit coordinates: the bilinear
    texture sample when the scene is textured, else the checker/solid
    select (``rc`` is the Rects pytree)."""
    if rc.textured:
        return sample_texture(rc.texture[k], a, b)
    mat = rc.material
    s = mat.checker_scale[k]
    parity = jnp.mod(jnp.floor(a * s) + jnp.floor(b * s), 2.0)
    return _checker_select(mat, k, parity)


def sphere_color(sp, k, p_local: Vec3, n_unit: Vec3) -> Vec3:
    """Base color of sphere ``k``: the lat-long texture sample when the
    group is textured (``sp`` is the Spheres pytree), else the 3-D solid
    checker in the sphere's local frame (transcendental-free — no atan2
    needed in the kernel; VPU-friendly floor/mod only)."""
    if sp.textured:
        u, v = sphere_uv(n_unit)
        return sample_texture(sp.texture[k], u, v, wrap_a=True)
    mat = sp.material
    s = mat.checker_scale[k]
    parity = jnp.mod(
        jnp.floor(p_local[0] * s)
        + jnp.floor(p_local[1] * s)
        + jnp.floor(p_local[2] * s),
        2.0,
    )
    return _checker_select(mat, k, parity)


# ---------------------------------------------------------------------------
# Nearest hit across all objects (the reference's T.switch chain, C6)
# ---------------------------------------------------------------------------


def trace_nearest(scene: Scene, o: Vec3, d: Vec3, shape, with_mirror: bool = False):
    """Closest hit over all spheres and rects.

    Returns dict of SoA pixel arrays: t, hit mask, unit normal n, base color,
    and scalar material fields (ka, kd, ks, shininess) selected per pixel.
    ``with_mirror`` adds the per-pixel mirror coefficient ("mir") to the
    attribute dict — only the reflective path pays for its select chain.

    The object loop is a *Python* loop over a static object count: it
    unrolls at trace time into a chain of `jnp.where` selects — exactly the
    nested switch chain of the reference, so the nearest-hit subgradient
    convention (ties broken toward the earlier object; zero gradient through
    the selector) matches Theano's (SURVEY.md C6).
    """
    f32 = jnp.float32
    t_best = jnp.full(shape, BIG, f32)
    zero = jnp.zeros(shape, f32)
    best = {
        "nx": zero, "ny": zero, "nz": zero,
        "cr": zero, "cg": zero, "cb": zero,
        "ka": zero, "kd": zero, "ks": zero, "shin": jnp.ones(shape, f32),
    }
    if with_mirror:
        best["mir"] = zero

    def update(t_new, closer, n_unit, col, mat, k):
        nonlocal t_best, best
        t_best = jnp.where(closer, t_new, t_best)
        new = {
            "nx": n_unit[0], "ny": n_unit[1], "nz": n_unit[2],
            "cr": col[0], "cg": col[1], "cb": col[2],
            "ka": mat.ka[k], "kd": mat.kd[k], "ks": mat.ks[k],
            "shin": mat.shininess[k],
        }
        if with_mirror:
            new["mir"] = mat.mirror[k]
        best = {key: jnp.where(closer, new[key], best[key]) for key in best}

    sp = scene.spheres
    for k in range(sp.count):
        t = intersect_sphere(o, d, sp.center[k], sp.radius[k])
        closer = t < t_best
        p = vm.vadd(o, vm.vscale(d, t))
        p_local = vm.vsub(p, vm.splat(sp.center[k]))
        # Outward unit normal; radius>0 enforced by bounds.
        inv_r = 1.0 / sp.radius[k]
        n_unit = vm.vscale(p_local, inv_r)
        col = sphere_color(sp, k, p_local, n_unit)
        update(t, closer, n_unit, col, sp.material, k)

    rc = scene.rects
    for k in range(rc.count):
        t, a, b, n = intersect_rect(o, d, rc.origin[k], rc.edge_u[k], rc.edge_v[k])
        closer = t < t_best
        n_unit = vm.vnormalize(n)
        # Two-sided shading: flip the normal toward the incoming ray.
        facing = jnp.where(vm.vdot(n_unit, d) < 0.0, 1.0, -1.0)
        n_unit = vm.vscale(n_unit, facing)
        col = rect_color(rc, k, a, b)
        update(t, closer, n_unit, col, rc.material, k)

    hit = t_best < BIG * 0.5
    return t_best, hit, best


def occluded(scene: Scene, o: Vec3, ldir: Vec3, dist):
    """Binary any-hit test toward a light (shadow ray, SURVEY.md C8).

    Pure step function: visibility contributes no gradient, matching the
    reference's hard-shadow semantics."""
    occ = jnp.zeros_like(dist, dtype=bool)
    sp = scene.spheres
    for k in range(sp.count):
        t = intersect_sphere(o, ldir, sp.center[k], sp.radius[k])
        occ = occ | (t < dist)
    rc = scene.rects
    for k in range(rc.count):
        t, _, _, _ = intersect_rect(o, ldir, rc.origin[k], rc.edge_u[k], rc.edge_v[k])
        occ = occ | (t < dist)
    return occ


# ---------------------------------------------------------------------------
# Shading (Lambertian + Phong + shadows, C7/C8)
# ---------------------------------------------------------------------------


def shadow_origin(o: Vec3, d: Vec3, t, n) -> Vec3:
    """Shadow-ray origin: hit point offset along the normal (C8). Factored
    out so hand-planned backwards (fused_vec_soft) can transpose through
    the same primitive sequence shade_from_attrs uses."""
    p = vm.vadd(o, vm.vscale(d, t))
    return vm.vadd(p, vm.vscale(n, SHADOW_EPS))


def light_geometry(lights, li: int, shadow_o: Vec3):
    """(ldir, dist) from the shadow origin to light ``li`` — the exact
    primitive sequence of shade_from_attrs's per-light setup (shared with
    hand-planned backwards)."""
    lpos = vm.splat(lights.position[li])
    lvec = vm.vsub(lpos, shadow_o)
    dist2 = vm.vdot(lvec, lvec)
    dist = vm.safe_sqrt(dist2)
    ldir = vm.vscale(lvec, 1.0 / jnp.where(dist > 1e-9, dist, 1.0))
    return ldir, dist


def shade_from_attrs(scene, o: Vec3, d: Vec3, cfg: RenderConfig, shape,
                     t, hit, at, occluded_fn=None,
                     vis_in=None, return_vis: bool = False,
                     vis_in_grad: bool = False):
    """Object-count-independent shading given nearest-hit results.

    Shared verbatim by the unrolled path (`shade`) and the object-chunked
    Pallas kernels (ops/kernels/fused_vec.py), which compute (t, hit, at)
    with their own object loops. ``scene`` only needs .lights/.ambient/
    .background here; ``occluded_fn(shadow_o, ldir, dist) -> bool`` performs
    the shadow any-hit test (object-dependent, hence injected).

    ``vis_in_grad=True`` lets replayed ``vis_in`` planes carry gradients —
    required by the SOFT backward (fused_vec_soft), where visibility is
    continuous; the default stop_gradient matches hard-shadow semantics.
    """
    if cfg.shader == "depth":
        z = jnp.where(hit, 1.0 / (1.0 + t), 0.0)
        return ((z, z, z), ()) if return_vis else (z, z, z)
    if cfg.shader == "normal":
        col = tuple(
            jnp.where(hit, at[k] * 0.5 + 0.5, 0.0) for k in ("nx", "ny", "nz")
        )
        return (col, ()) if return_vis else col

    n = (at["nx"], at["ny"], at["nz"])
    base = (at["cr"], at["cg"], at["cb"])

    ambient = vm.splat(scene.ambient)
    col = vm.vscale(vm.vmul(base, ambient), at["ka"])
    view = vm.vneg(d)  # unit, since d is unit

    lights = scene.lights
    vis_out = []
    shadow_o = shadow_origin(o, d, t, n)
    for li in range(lights.count):
        lcol = vm.splat(lights.color[li])
        ldir, dist = light_geometry(lights, li, shadow_o)

        if vis_in is not None:
            vis = vis_in[li] if vis_in_grad else jax.lax.stop_gradient(vis_in[li])
        elif cfg.shadows and occluded_fn is not None:
            occ = occluded_fn(shadow_o, ldir, dist)
            if occ.dtype == jnp.bool_:
                vis = jnp.where(occ, 0.0, 1.0)
            else:
                # Soft occlusion in [0, 1] (RenderConfig.soft_tau mode):
                # continuous visibility carries shadow-silhouette gradients
                # to occluder geometry. Values are exactly 0/1 for a bool-
                # equivalent occluder, so the hard path is unaffected.
                vis = 1.0 - occ
        else:
            vis = 1.0
        vis_out.append(vis)

        ndotl = jnp.maximum(vm.vdot(n, ldir), 0.0)
        # Phong reflection of the light direction about the normal.
        refl = vm.vsub(vm.vscale(n, 2.0 * ndotl), ldir)
        rdotv = jnp.maximum(vm.vdot(refl, view), 0.0)
        spec = at["ks"] * vm.safe_pow(rdotv, at["shin"])

        contrib_r = vis * (at["kd"] * ndotl * base[0] + spec) * lcol[0]
        contrib_g = vis * (at["kd"] * ndotl * base[1] + spec) * lcol[1]
        contrib_b = vis * (at["kd"] * ndotl * base[2] + spec) * lcol[2]
        col = vm.vadd(col, (contrib_r, contrib_g, contrib_b))

    col = vm.vwhere(hit, col, miss_color(scene, d, shape))
    if cfg.clip:
        col = tuple(jnp.clip(c, 0.0, 1.0) for c in col)
    if return_vis:
        vis_arrays = tuple(
            jnp.broadcast_to(jnp.asarray(v, jnp.float32), shape) for v in vis_out
        )
        return col, vis_arrays
    return col


def reflect_dir(d: Vec3, n: Vec3) -> Vec3:
    """Specular reflection of (unit) ``d`` about (unit) ``n`` — shared by
    every reflective implementation (jnp, jnp_vec, the Pallas families via
    tracing) so the primitive sequence, and thus f32 rounding, agrees."""
    return vm.vsub(d, vm.vscale(n, 2.0 * vm.vdot(d, n)))


def shade(scene: Scene, o: Vec3, d: Vec3, cfg: RenderConfig, shape,
          vis_in=None, return_vis: bool = False):
    """Full shading pass (trace + shade), plus ``cfg.reflections`` mirror
    bounces when enabled.

    ``vis_in``: optional tuple of per-light visibility arrays. Visibility is
    a step function (zero gradient), so the backward Pallas kernel saves it
    as a forward residual and passes it here to skip the shadow any-hit
    recompute during the vjp replay (SURVEY.md §7 backward memory plan).
    With reflections the tuple holds ``(1 + reflections) * L`` planes,
    bounce-major (bounce 0's L lights first).
    ``return_vis``: also return the computed per-light visibility tuple.
    """
    bounces = cfg.reflections if cfg.shader == "phong" else 0
    occluded_fn = lambda so, ld, dist: occluded(scene, so, ld, dist)
    if bounces == 0:
        t, hit, at = trace_nearest(scene, o, d, shape)
        return shade_from_attrs(
            scene, o, d, cfg, shape, t, hit, at,
            occluded_fn=occluded_fn, vis_in=vis_in, return_vis=return_vis,
        )

    # Reflective path: each level's local color is computed UNCLIPPED, the
    # blend col = local + mirror * (reflected - local) composes levels
    # deepest-first, and the [0, 1] clip applies once at the top (clipping
    # per level would darken bright reflected highlights nonlinearly).
    import dataclasses

    cfg_level = dataclasses.replace(cfg, clip=False)
    L = scene.lights.count
    vis_out: list = []

    def level(o_l: Vec3, d_l: Vec3, depth: int):
        # The deepest level never blends, so its mirror select chain would
        # be dead weight in the kernels — skip it there.
        t, hit, at = trace_nearest(scene, o_l, d_l, shape,
                                   with_mirror=depth < bounces)
        vi = None
        if vis_in is not None and len(vis_in):
            vi = tuple(vis_in[depth * L:(depth + 1) * L])
        out = shade_from_attrs(
            scene, o_l, d_l, cfg_level, shape, t, hit, at,
            occluded_fn=occluded_fn, vis_in=vi, return_vis=return_vis,
        )
        col, vis = out if return_vis else (out, None)
        if return_vis:
            vis_out.extend(vis)
        if depth < bounces:
            n = (at["nx"], at["ny"], at["nz"])
            rdir = reflect_dir(d_l, n)
            # Reflected-ray origin: hit point nudged along the normal —
            # the same offset primitive the shadow rays use.
            ro = shadow_origin(o_l, d_l, t, n)
            rcol = level(ro, rdir, depth + 1)
            # Miss pixels keep the background exactly: mirror is masked to
            # 0 there (at["mir"] is already 0 on miss via trace_nearest's
            # init, but the explicit where keeps that invariant local).
            m = jnp.where(hit, at["mir"], 0.0)
            col = tuple(c + m * (rc - c) for c, rc in zip(col, rcol))
        return col

    col = level(o, d, 0)
    if cfg.clip:
        col = tuple(jnp.clip(c, 0.0, 1.0) for c in col)
    if return_vis:
        return col, tuple(vis_out)
    return col


def n_vis_planes(scene_like: Scene, cfg: RenderConfig) -> int:
    """Number of shadow-visibility residual planes `render_tile` emits with
    ``return_vis``: one per (subsample, bounce, light) — the layout contract
    between the fused kernels' forward (which saves them) and backward
    (which replays with them)."""
    if not (cfg.shadows and cfg.shader == "phong"):
        return 0
    return scene_like.lights.count * cfg.spp * (1 + cfg.reflections)


# ---------------------------------------------------------------------------
# The tile entry point (shared by jnp renderer and Pallas kernels)
# ---------------------------------------------------------------------------


def render_tile(scene: Scene, cfg: RenderConfig, row0, col0, bh: int, bw: int,
                vis_in=None, return_vis: bool = False):
    """Render a (bh, bw) tile whose top-left pixel is (row0, col0).

    Returns SoA (r, g, b), each (bh, bw) float32 (plus the visibility
    tuple when ``return_vis``). ``row0``/``col0`` may be traced scalars
    (shard offsets / Pallas program ids).

    Visibility residuals: with ``spp`` subsamples, ``1 + reflections``
    bounce levels and L lights the visibility tuple holds
    ``spp * (1 + reflections) * L`` planes, subsample-major then
    bounce-major (see `n_vis_planes`). Each subsample/bounce has its own
    shadow decision, so the backward replay (``vis_in`` with the same
    layout) skips the shadow any-hit recompute at ANY spp — round 1 only
    supported spp=1 and silently recomputed otherwise.
    """
    # Integer iota (Mosaic requires int iota results), then cast.
    ii = row0 + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0).astype(jnp.float32)
    jj = col0 + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1).astype(jnp.float32)

    if cfg.spp == 1:
        offsets = [(0.0, 0.0)]
    elif cfg.spp == 4:  # 2x2 subpixel grid (offsets relative to the center)
        offsets = [(-0.25, -0.25), (-0.25, 0.25), (0.25, -0.25), (0.25, 0.25)]
    else:
        raise ValueError(f"spp must be 1 or 4, got {cfg.spp}")

    n_off = len(offsets)
    acc = None
    vis_all = []
    for idx, (oi, oj) in enumerate(offsets):
        o, d = camera_rays(
            scene.camera, ii + oi, jj + oj, cfg.height, cfg.width, cfg.projection
        )
        o = vm.vbroadcast(o, (bh, bw))
        d = vm.vbroadcast(d, (bh, bw))
        vi = None
        if vis_in is not None and len(vis_in):
            per = len(vis_in) // n_off
            vi = tuple(vis_in[idx * per:(idx + 1) * per])
        out = shade(scene, o, d, cfg, (bh, bw), vis_in=vi, return_vis=return_vis)
        col, vis = out if return_vis else (out, None)
        acc = col if acc is None else vm.vadd(acc, col)
        if return_vis:
            vis_all.extend(vis)
    col = vm.vscale(acc, 1.0 / n_off)
    if return_vis:
        return col, tuple(vis_all)
    return col
