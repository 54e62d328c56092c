"""Object-chunked fused Pallas kernels: O(1) compile time in object count.

The primary fused kernels (`fused.py`) unroll the object loop at trace time
— unbeatable for O(10) objects, but compile time grows linearly with N
(~2 min at 65 objects) and the unrolled chain's live set eventually
exhausts VMEM. This module is the large-N production path (SURVEY.md §5.7
"(objects x ray-tiles) 2-D blocking"; VERDICT round-1 item #1): scene
objects live in **SMEM arrays** (`spheres: (N, 16)`, `rects: (M, 21)`) and
the kernel walks them with `lax.fori_loop` + dynamic scalar reads — one
compiled loop body for ANY object count.

Semantics are identical to `ops/pipeline_vec.render_jnp_vec` (which is
itself locked to the unrolled pipeline and the f64 oracles by tests):
first-wins nearest hit, hard shadows, checker materials, Lambertian+Phong.
The shading math is literally shared — the kernel calls
`pipeline.shade_from_attrs`, injecting its loop-based occlusion test.

Round-3 capability extensions (VERDICT r2 items #3/#4), closing the
"fast path exists only for small N" asymmetry:
- environment maps ride the globals SMEM plan (see `globals_tree`);
- object textures ride per-row texel tails (see the P_SPH note below);
- mirror reflections: a static Python loop over bounce levels reruns the
  SAME O(1)-compile object loops per level, blending deepest-first
  exactly like pipeline.shade (unclipped per level, one clip at top);
  the backward composes the levels in REVERSE — the shade+blend stage's
  vjp treats every level's (rays, t, planes) as explicit inputs, each
  level's per-object masked vjps add the implicit (t, planes)->rays
  parts, and the reflect-ray construction's transpose carries the deeper
  level's ray cotangent onto this level's (rays, t, normal) before its
  own object vjps run.
Round 3 closes the last refusal: OBJECT-textured + reflections runs here
too — each bounce level's chunk-skipped resolve samples the texel tails
dense exactly like level 0, and the reverse-level backward's per-object
vjps emit texel cotangents per level through the same dpv write-back (the
unrolled family still refuses this combo: ITS per-bounce dense chain is
traced per OBJECT, O(N*K^2*levels) trace; here it is O(K^2*levels), one
loop body). `auto_tiles` shrinks the backward tiles for the combined
(texel accumulators x levels x subsamples) live set.

Forward kernel (per image tile), two-phase trace:
  1. rays from camera scalars + tile iota (never touch HBM);
  2. phase 1 — t-only fori_loop over spheres then rects tracking
     (t_best, k_best): one intersection + two selects per object, reading
     only the geometry scalars; phase 2 — chunk-skipped attribute resolve
     (one lax.cond per 16 objects) materializes the winner's 10 attribute
     planes under disjoint ``kbest == k`` masks — bit-identical to the
     one-phase where-select chain (same subgradient convention as the
     unrolled T.switch-style chain) at a fraction of the O(N) cost;
  3. fori_loop occlusion any-hit per light; `shade_from_attrs`.

Backward kernel (recompute-in-backward, no per-pixel residuals except the
zero-gradient shadow-visibility planes saved by the forward):
  1. replay the trace loop to recover (t_sel, k_best);
  2. `jax.vjp` of the object-count-independent shading stage w.r.t.
     (globals, rays, t, attribute planes);
  3. fori_loop over objects: vjp of each object's (t_k, attrs_k) w.r.t.
     its 16/21 scalars and the rays, with cotangents masked by
     (k_best == k); per-object grads accumulate into SMEM output rows
     (dynamic row writes; race-free across the sequential TPU grid);
  4. vjp of ray generation closes the camera-gradient path.

Gradient fidelity holds by construction: masked-cotangent accumulation is
exactly the transpose of the where-select chain, so grads match `jax.grad`
of `render_jnp_vec` (tests enforce it in interpret mode).
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.scene import Scene, scene_object_textured
from .. import vecmath as vm
from ..pipeline import (
    BIG,
    RenderConfig,
    camera_rays,
    hat_weights,
    intersect_rect,
    intersect_sphere,
    reflect_dir,
    sample_texture_dense,
    shade_from_attrs,
    shadow_origin,
    soft_checker_q,
    sphere_uv,
    texmix,
)
from ..pipeline_vec import SPP4_OFFSETS
from .fused import _round_up, _scalar_view, flatten_scene, scene_layout

P_SPH = 17  # center(3) radius(1) color(3) color2(3) checker cscale ka kd ks shin mirror
P_RCT = 22  # origin(3) edge_u(3) edge_v(3) + same 13 material scalars
# mirror rides at the END of the material block (index P-1) so every other
# index is unchanged from the round-2 layout; it is read only by the
# reflective levels' attribute resolve (dead scalar otherwise).
# Textured groups append their texel grid to each object's SMEM row:
# row = [the P_SPH/P_RCT scalars] + texture[k].ravel() (K*K*3 scalars).
# The eval fns detect the longer row and sample gather-free (dense
# hat-basis, like the unrolled family) instead of the checker select;
# the backward's per-object vjp then emits texel gradients through the
# SAME dpv write-back loop as every other row scalar — texture recovery
# at vec scale with zero extra plumbing (VERDICT r2 item #3 phase 2).

ATTR_NAMES = ("nx", "ny", "nz", "cr", "cg", "cb", "ka", "kd", "ks", "shin")

# Backward chunk-skip granularity (see obj_backward). SMEM object arrays are
# padded to a CHUNK multiple with these BENIGN far-away rows: every
# computation on them stays finite, so zero cotangents yield exactly-zero
# gradient contributions (an all-zero pad row would divide by radius 0 and
# turn 0-cotangent vjps into NaNs).
CHUNK = 16
_SPH_PAD_ROW = np.array(
    [0.0, 0.0, 1e6, 1.0] + [0.5] * 6 + [0.0, 1.0, 0.5, 0.5, 0.0, 1.0, 0.0],
    np.float32,
)
_RCT_PAD_ROW = np.array(
    [0.0, 0.0, 1e6, 1.0, 0.0, 0.0, 0.0, 1.0, 0.0]
    + [0.5] * 6 + [0.0, 1.0, 0.5, 0.5, 0.0, 1.0, 0.0],
    np.float32,
)


@dataclass(frozen=True)
class VecTileConfig:
    """Static tiling for the object-chunked kernels. VMEM use is O(1) in
    object count (the loop carries ~12 tile planes), so tiles are fixed.

    Defaults are swept on v5e at 513 objects 512^2
    (scripts/vec_tile_sweep.py): fwd 64x128 = 2.91 ms vs 3.34 (128x128),
    4.50 (256x128), 10.4 (8x128); bigger tiles lose to VMEM pressure /
    pipelining depth, smaller ones to per-tile loop overhead."""

    bh: int = 64
    bw: int = 128
    bh_bwd: int = 64
    bw_bwd: int = 128
    # Static unroll factor of the phase-1 nearest-hit / occlusion loops
    # (U objects per fori_loop iteration, remainder peeled outside the
    # loop — iteration order and therefore first-wins ties unchanged;
    # bitwise-equal to unroll=1 by test). v5e sweep at 513 objects:
    # 2.91 ms (u=1) / 2.78 (2) / 2.56 (4) / 2.71 (8).
    unroll: int = 4
    # Chunk-skip granularity for TEXEL-BEARING object groups in the
    # attribute resolve and the backward's per-object vjps (round 4,
    # VERDICT r3 #3: the textured corner). A live chunk runs the K^2-MAC
    # dense texel sample for EVERY member even when one object wins the
    # tile's pixels, so texel rows want finer chunks than the default
    # CHUNK=16 (the cond-per-chunk sync is cheap against ~800 dense MACs
    # per pixel per member). Must divide CHUNK so SMEM padding and kbest
    # numbering are untouched; results are bitwise-identical for ANY
    # value (disjoint masks; skipped vjps are exactly zero). Untextured
    # groups always use CHUNK. auto_tiles picks the swept default: v5e
    # 64 textured spheres (K=16) 512^2 fused step
    # (scripts/tex_chunk_sweep.py): 10.61 ms (16) / 8.21 (8) / 5.07 (4)
    # / 4.16 (2) / 4.25 (1) — chunk 2 wins, 2.55x over the round-3 16.
    tex_chunk: int = CHUNK


# ---------------------------------------------------------------------------
# Host-side packing (differentiable jnp: grads flow back through it)
# ---------------------------------------------------------------------------


def _mat_cols(mat):
    return [
        mat.color,  # (K, 3)
        mat.color2,  # (K, 3)
        mat.checker[:, None],
        mat.checker_scale[:, None],
        mat.ka[:, None],
        mat.kd[:, None],
        mat.ks[:, None],
        mat.shininess[:, None],
        mat.mirror[:, None],
    ]


def pack_spheres(scene: Scene) -> jnp.ndarray:
    sp = scene.spheres
    if sp.count == 0:
        return jnp.zeros((0, P_SPH), jnp.float32)
    cols = [sp.center, sp.radius[:, None]] + _mat_cols(sp.material)
    if sp.textured:
        cols.append(jnp.reshape(sp.texture, (sp.count, -1)))
    return jnp.concatenate([jnp.asarray(c, jnp.float32) for c in cols], axis=1)


def pack_rects(scene: Scene) -> jnp.ndarray:
    rc = scene.rects
    if rc.count == 0:
        return jnp.zeros((0, P_RCT), jnp.float32)
    cols = [rc.origin, rc.edge_u, rc.edge_v] + _mat_cols(rc.material)
    if rc.textured:
        cols.append(jnp.reshape(rc.texture, (rc.count, -1)))
    return jnp.concatenate([jnp.asarray(c, jnp.float32) for c in cols], axis=1)


def _tex_nest(pv, base: int):
    """Rebuild the (K)(K)(3) nested-tuple texel view from a packed row's
    tail scalars (row layout: [base scalars] + texture[k].ravel())."""
    n = len(pv) - base
    k = int(round(math.sqrt(n / 3)))
    assert 3 * k * k == n, (len(pv), base)
    return tuple(
        tuple(tuple(pv[base + (i * k + j) * 3 + c] for c in range(3))
              for j in range(k))
        for i in range(k)
    )


# Texel-cotangent backend for the object texel tails (VERDICT r4 #3 —
# the round-5 MXU attempt, measured and KILLED):
# - "vjp" (default): the auto-vjp per-texel reductions (round 4).
# - "mxu": custom-vjp contraction whose backward computes all 3K^2 texel
#   cotangents as sublane-batched lane-contracting matmuls. Compiles and
#   is grad-exact (4.7e-8 vs vjp with Precision.HIGHEST,
#   scripts/texbwd_diff.py) but a perf WASH: 4.24 vs 4.20 ms at
#   tex_chunk=2 and 10.89 vs 10.60 at chunk=16 (v5e, 64 textured
#   spheres K=16 512^2 step).
# - "zero": DIAGNOSTIC (wrong grads) — drops dT entirely; 3.47 ms at
#   chunk=2 / 7.87 at chunk=16. So the dT term is only ~0.7 ms of the
#   4.2 ms step (17% ceiling for ANY dT formulation) and the dominant
#   gap vs the 1.13 ms plain step is the SHARED replay + weight-chain
#   MACs — overturning the round-4 attribution of the textured
#   backward's cost to per-texel reduction bandwidth
#   (docs/OPTIMIZATION_NOTES.md "The textured vec corner, closed out").
_TEXEL_BWD = __import__("os").environ.get("RRT_TEXBWD", "vjp")

# Env-map cotangent backend (round 5). Independent of the object-texel
# flag because the measured outcomes DIVERGE: on object texel tails the
# custom vjp is a perf wash (above), but on the env path its
# (tex, a, b)-only residuals — the 2K hat-weight planes are rebuilt in
# the backward instead of living across the fwd->bwd interval — dissolve
# the round-4 scoped-vmem walls: soft env K=24 fits 16-row tiles
# (16.72 -> 9.51 ms, 1.76x), soft K=32 COMPILES AND RUNS at 8-row tiles
# (21.85 ms; impossible at any tile size under the auto-vjp — the
# ~16.7M row-independent term was those residual planes), and the hard
# family's K=32 fits 16-row tiles (scripts/envbwd_probe.py). Default
# "mxu"; auto_tiles / auto_tiles_soft / soft_kernel_ok key their env
# rules on this flag.
_ENV_BWD = __import__("os").environ.get("RRT_ENVBWD", "mxu")


def _make_sample_mxu(wrap_a: bool):
    """custom-vjp dense sampler over (tex, a, b) — the "mxu" backend.

    Forward is `hat_weights` + `texmix` verbatim (identical primitive
    sequence to `pipeline.sample_texture_dense`). The backward:

    - residuals are ONLY (tex, a, b): the 2K hat-weight planes are
      REBUILT in the backward instead of carried across the fwd->bwd
      interval (under the auto-vjp they are live residuals — exactly the
      per-sample 2K-plane live-set multiplier behind the env-map
      scoped-vmem walls; see auto_tiles / fused_vec_soft.soft_kernel_ok);
    - dT[i,j,c] = sum_px wis_i * wjs_j * q_c runs as sublane-batched
      lane-contracting matmuls on the MXU (Mosaic's tpu.matmul takes
      exactly ONE contracting dim — the direct 2-contracting-dim form
      fails verification with "lhs contracting dims must be of size 1").
      The stacks put K on a non-minor axis, so no (bh,bw)->(N,K) relayout
      is needed — the cost that parked this formulation in round 4;
    - (a, b) cotangents compose dwis/dwjs (elementwise plane
      recombinations of the texels, no reductions) through jax.vjp of
      the weight construction, keeping the tent/wrap subgradients
      byte-identical to the reference autodiff.
    """

    @jax.custom_vjp
    def f(tex, a, b):
        wis, wjs = hat_weights(tex, a, b, wrap_a)
        return texmix(tex, wis, wjs)

    def fwd(tex, a, b):
        wis, wjs = hat_weights(tex, a, b, wrap_a)
        return texmix(tex, wis, wjs), (tex, a, b)

    def bwd(res, q):
        tex, a, b = res
        ka, kb = len(tex), len(tex[0])
        f32 = jnp.float32
        (wis, wjs), w_vjp = jax.vjp(
            lambda a_, b_: hat_weights(tex, a_, b_, wrap_a), a, b
        )
        if _TEXEL_BWD == "zero":
            # DIAGNOSTIC ONLY (wrong grads): skip the texel cotangents to
            # bound what ANY dT formulation could recover — the A/B that
            # proved the reductions are not the textured backward's cost.
            zero = jnp.zeros((), f32)
            dtex = tuple(
                tuple((zero, zero, zero) for _ in range(kb))
                for _ in range(ka)
            )
        else:
            U = jnp.stack(wis, axis=1)  # (bh, Ka, bw)
            V = jnp.stack(wjs, axis=1)  # (bh, Kb, bw)
            dT = []
            for c in range(3):
                per_row = jax.lax.dot_general(
                    U * q[c][:, None, :], V,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    # HIGHEST: default MXU precision is a single bf16
                    # pass, which costs ~3.7e-3 relative on the texel
                    # cotangents (measured, scripts/texbwd_diff.py); the
                    # multi-pass f32 mode restores ~1e-6-class agreement
                    # with the auto-vjp reductions.
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=f32,
                )  # (bh, Ka, Kb)
                dT.append(jnp.sum(per_row, axis=0))  # (Ka, Kb)
            dtex = tuple(
                tuple(tuple(dT[c][i, j] for c in range(3))
                      for j in range(kb))
                for i in range(ka)
            )
        dwis = []
        for i in range(ka):
            acc = 0.0
            for c in range(3):
                row = 0.0
                for j in range(kb):
                    row = row + tex[i][j][c] * wjs[j]
                acc = acc + q[c] * row
            dwis.append(acc)
        dwjs = []
        for j in range(kb):
            acc = 0.0
            for c in range(3):
                col = 0.0
                for i in range(ka):
                    col = col + tex[i][j][c] * wis[i]
                acc = acc + q[c] * col
            dwjs.append(acc)
        da, db = w_vjp((tuple(dwis), tuple(dwjs)))
        return dtex, da, db

    f.defvjp(fwd, bwd)
    return f


_SAMPLE_MXU = {True: _make_sample_mxu(True), False: _make_sample_mxu(False)}


def _sample_dense(tex, a, b, wrap_a: bool = False):
    """Kernel-local dense texel sample: same forward as
    `pipeline.sample_texture_dense` (hat_weights + texmix, identical
    primitive sequence), with the texel-cotangent backend selected by
    RRT_TEXBWD."""
    if _TEXEL_BWD == "vjp":
        return sample_texture_dense(tex, a, b, wrap_a)
    return _SAMPLE_MXU[wrap_a](tex, a, b)


def _sample_dense_env(tex, a, b, wrap_a: bool = True):
    """Env-map dense sample (miss_color's env_dense_fn hook), backend
    selected by RRT_ENVBWD — see the _ENV_BWD note for the measured
    reasons this defaults to the custom vjp while object texels do not."""
    if _ENV_BWD == "vjp":
        return sample_texture_dense(tex, a, b, wrap_a)
    return _SAMPLE_MXU[wrap_a](tex, a, b)


def _row_plan(scene_like: Scene):
    """Static SMEM row plan: (p_sph, p_rct, ns_pad, nr_pad, sph_tex_len,
    rct_tex_len, smem_bytes). Shared by the kernel factory's capacity
    guard and the dispatch predicate `vec_smem_ok` (one source of truth)."""
    sph_tex_len = (
        int(np.prod(np.shape(scene_like.spheres.texture)[1:]))
        if scene_like.spheres.textured else 0
    )
    rct_tex_len = (
        int(np.prod(np.shape(scene_like.rects.texture)[1:]))
        if scene_like.rects.textured else 0
    )
    p_sph = P_SPH + sph_tex_len
    p_rct = P_RCT + rct_tex_len
    ns_pad = _round_up(max(scene_like.spheres.count, 1), CHUNK)
    nr_pad = _round_up(max(scene_like.rects.count, 1), CHUNK)
    smem_bytes = 4 * (ns_pad * p_sph + nr_pad * p_rct)
    return p_sph, p_rct, ns_pad, nr_pad, sph_tex_len, rct_tex_len, smem_bytes


# TPU scalar memory holds ~400 KiB of kernel operands (probed on v5e via
# the axon tunnel: a (128, 784) f32 SMEM input compiles, (512, 784) does
# not). Textured row plans beyond this budget refuse; impl='auto' routes
# them object-vectorized.
SMEM_BUDGET_BYTES = 384 * 1024


def vec_smem_ok(scene_like: Scene) -> bool:
    """Whether the scene's object rows (incl. texel tails) fit the probed
    SMEM budget — the dispatch predicate for routing textured scenes to
    this kernel family (ops.render.resolve_impl)."""
    *_, sph_tex_len, rct_tex_len, smem_bytes = _row_plan(scene_like)
    return not (sph_tex_len or rct_tex_len) or smem_bytes <= SMEM_BUDGET_BYTES


def globals_tree(scene: Scene):
    """The object-count-independent scene parameters, as a dict pytree
    (enters the kernel as one flat SMEM vector via fused.scene_layout).

    ``env`` — the (K, K, 3) lat-long environment map — is a GLOBAL, so it
    rides this plan exactly like the unrolled family's flat-scalar scene:
    `_scalar_view` rebuilds it as a nested tuple, `pipeline.miss_color`
    dispatches the tuple leaf to the gather-free dense sampler, and its
    texel GRADIENTS come out of the shade-stage vjp with the other globals
    (sky recovery at vec scale, VERDICT r2 item #3). Untextured scenes
    carry the size-0 sentinel: zero scalars, zero cost."""
    return {
        "ambient": scene.ambient,
        "background": scene.background,
        "camera": scene.camera,
        "env": scene.env,
        "lights": scene.lights,
    }


def _globals_ns(gview):
    """Scene-like namespace for shade_from_attrs (lights/ambient/background
    + env for miss_color's tuple-leaf dense-sampler dispatch). Under
    RRT_ENVBWD=mxu (the default) the env sample routes through the
    custom-vjp backend via miss_color's env_dense_fn hook — identical
    forward, swapped cotangents, and crucially no 2K-weight-plane
    residuals across the fwd->bwd interval (see _ENV_BWD)."""
    env = gview.get("env", ())
    return SimpleNamespace(
        lights=gview["lights"], ambient=gview["ambient"],
        background=gview["background"], env=env,
        env_mapped=isinstance(env, (tuple, list)) and len(env) > 0,
        env_dense_fn=None if _ENV_BWD == "vjp" else _sample_dense_env,
    )


# ---------------------------------------------------------------------------
# In-kernel object math (scalar params -> tile planes)
# ---------------------------------------------------------------------------


def _sphere_eval(pv, o, d, t_known=None, checker_tau=None):
    """(t, attr planes) of sphere with packed scalars ``pv`` (len 16).

    Mirrors pipeline.trace_nearest's sphere branch exactly (same primitive
    sequence -> same subgradients and bits). ``t_known`` lets the forward
    loop reuse an already-computed t (identical value; the backward never
    passes it so gradients flow through the intersection).

    ``checker_tau``: None keeps the hard checker select (this module's
    kernels — bit-exactness contract). The soft kernels (fused_vec_soft)
    pass their runtime SMEM scalar: a traced value, selected per pixel via
    `where(tau > 0, soft, hard)` so one compile serves every anneal stage
    INCLUDING the exact-hard tau == 0 limit."""
    center = (pv[0], pv[1], pv[2])
    radius = pv[3]
    t = intersect_sphere(o, d, center, radius) if t_known is None else t_known
    p = vm.vadd(o, vm.vscale(d, t))
    p_local = vm.vsub(p, vm.splat(center))
    inv_r = 1.0 / radius
    n_unit = vm.vscale(p_local, inv_r)
    if len(pv) > P_SPH:
        # Textured row: lat-long sample of the row's texel tail — the
        # exact primitive sequence of pipeline.sphere_color's dense path
        # (sphere_uv + wrap_a), so kernel == unrolled kernel bitwise.
        u, v = sphere_uv(n_unit)
        col = _sample_dense(_tex_nest(pv, P_SPH), u, v, wrap_a=True)
        return t, n_unit, col, (pv[12], pv[13], pv[14], pv[15])
    cscale = pv[11]
    parity = jnp.mod(
        jnp.floor(p_local[0] * cscale)
        + jnp.floor(p_local[1] * cscale)
        + jnp.floor(p_local[2] * cscale),
        2.0,
    )
    col = _checker(pv, parity)
    if checker_tau is not None:
        q = soft_checker_q(
            (p_local[0] * cscale, p_local[1] * cscale, p_local[2] * cscale),
            checker_tau,
        )
        col = _checker_soft_or_hard(pv, q, col, checker_tau)
    return t, n_unit, col, (pv[12], pv[13], pv[14], pv[15])


def _rect_eval(pv, o, d, checker_tau=None):
    """(t, attr planes) of rect with packed scalars ``pv`` (len 21).
    ``checker_tau``: see _sphere_eval."""
    origin = (pv[0], pv[1], pv[2])
    eu = (pv[3], pv[4], pv[5])
    ev = (pv[6], pv[7], pv[8])
    t, a, b, n = intersect_rect(o, d, origin, eu, ev)
    n_unit = vm.vnormalize(n)
    facing = jnp.where(vm.vdot(n_unit, d) < 0.0, 1.0, -1.0)
    n_unit = vm.vscale(n_unit, facing)
    if len(pv) > P_RCT:
        # Textured row: dense bilinear sample at the rect's own (a, b)
        # hit coordinates (pipeline.rect_color's dense path).
        col = _sample_dense(_tex_nest(pv, P_RCT), a, b)
        return t, n_unit, col, (pv[17], pv[18], pv[19], pv[20])
    cscale = pv[16]
    parity = jnp.mod(jnp.floor(a * cscale) + jnp.floor(b * cscale), 2.0)
    col = _checker(pv[5:], parity)  # material scalars start at index 9 = 5+4
    if checker_tau is not None:
        q = soft_checker_q((a * cscale, b * cscale), checker_tau)
        col = _checker_soft_or_hard(pv[5:], q, col, checker_tau)
    return t, n_unit, col, (pv[17], pv[18], pv[19], pv[20])


def _checker(pv_from_color, parity):
    """Checker select from packed scalars where color starts at offset 4
    (sphere layout) — for rects pass a shifted view so color lands at 4."""
    c1 = vm.splat((pv_from_color[4], pv_from_color[5], pv_from_color[6]))
    c2 = vm.splat((pv_from_color[7], pv_from_color[8], pv_from_color[9]))
    use2 = pv_from_color[10] * parity
    return vm.vwhere(use2 > 0.5, c2, c1)


def _checker_soft_or_hard(pv_from_color, q, col_hard, checker_tau):
    """Soft-checker blend (RenderConfig.checker_tau) with a runtime select
    back to the hard color when the traced ``checker_tau`` is 0 — keeping
    the tau == 0 stage bit-exact while sharing one kernel compile. Both
    branches are finite everywhere (soft_checker_q's f32-safe 1e-6 guard —
    NOT 1e-30, which underflows in the div vjp), so the where is AD-safe
    (no NaN * 0)."""
    c1 = vm.splat((pv_from_color[4], pv_from_color[5], pv_from_color[6]))
    c2 = vm.splat((pv_from_color[7], pv_from_color[8], pv_from_color[9]))
    use2 = pv_from_color[10] * (0.5 - 0.5 * q)
    soft = tuple(a + use2 * (b - a) for a, b in zip(c1, c2))
    is_soft = checker_tau > 0.0
    return tuple(jnp.where(is_soft, s, h) for s, h in zip(soft, col_hard))


def _unrolled_fori(n, step, carry, unroll):
    """fori_loop over [0, n) applying ``step(k, carry)`` with a static
    unroll factor; remainder iterations are peeled after the loop so the
    visit order (and any first-wins tie semantics in ``step``) is
    identical to the unroll=1 loop."""
    u = max(1, min(unroll, n))
    if u > 1:
        def body(i, c):
            k0 = i * u
            for off in range(u):
                c = step(k0 + off, c)
            return c

        carry = jax.lax.fori_loop(0, n // u, body, carry)
        for k in range(n - n % u, n):
            carry = step(k, carry)
        return carry
    return jax.lax.fori_loop(0, n, step, carry)


def _nearest_loop(sph_read, n_sph, rct_read, n_rct, o, d, shape, rct_offset,
                  unroll=1):
    """Phase 1 of the two-phase trace: t-only fori_loop nearest-hit over
    all objects, tracking (t_best, k_best). Reads just the GEOMETRY scalars
    (4/sphere, 9/rect) and carries two tile planes — the O(n_objects) cost
    per tile is one intersection + two selects, vs. the full 10-attribute
    where-chain of the one-phase design (measured at 513 objects 512^2:
    fwd 5.8 -> see README). Object order (spheres then rects) and
    first-wins ties (strict ``t < t_best``) match pipeline_vec's
    concatenated argmin bit-exactly, so phase 2 resolves the SAME winners.

    NOTE on guards: a per-object lax.cond "skip when the object beats no
    pixel" was tried and REVERTED — the scalar-vector sync per iteration
    broke Mosaic's loop pipelining and grew compile 100 s -> 760 s.
    Chunked conds (1 per 16 objects) live in phase 2 / the backward, where
    the skipped work is heavy enough to win."""
    f32 = jnp.float32
    t_best = jnp.full(shape, BIG, f32)
    kbest = jnp.full(shape, -1, jnp.int32)

    def sph_body(k, carry):
        t_best, kbest = carry
        c = (sph_read(k, 0), sph_read(k, 1), sph_read(k, 2))
        t = intersect_sphere(o, d, c, sph_read(k, 3))
        closer = t < t_best
        return jnp.where(closer, t, t_best), jnp.where(closer, k, kbest)

    def rct_body(k, carry):
        t_best, kbest = carry
        pv = tuple(rct_read(k, j) for j in range(9))
        t, _, _, _ = intersect_rect(
            o, d, (pv[0], pv[1], pv[2]), (pv[3], pv[4], pv[5]), (pv[6], pv[7], pv[8])
        )
        closer = t < t_best
        return jnp.where(closer, t, t_best), jnp.where(closer, rct_offset + k, kbest)

    carry = (t_best, kbest)
    if n_sph:
        carry = _unrolled_fori(n_sph, sph_body, carry, unroll)
    if n_rct:
        carry = _unrolled_fori(n_rct, rct_body, carry, unroll)
    return carry


def _resolve_attrs(sph_read, n_sph, rct_read, n_rct, o, d, shape, t_sel, kbest,
                   rct_offset, p_sph: int = P_SPH, p_rct: int = P_RCT,
                   with_mirror: bool = False,
                   sph_chunk: int = CHUNK, rct_chunk: int = CHUNK):
    """Phase 2: materialize the winner's 10 attribute planes from k_best.

    Chunk-skipped (same pattern as obj_backward): a CHUNK of objects none of
    whose members wins a pixel of this tile is skipped with ONE lax.cond.
    Within a live chunk, each object's attributes are where-merged under the
    disjoint masks ``kbest == k`` — exactly the values the one-phase
    where-select chain produced (the sphere eval reuses ``t_sel``, which on
    the winning pixels is bit-identical to the object's own t from phase 1:
    same primitive sequence, same SMEM operands). Pixels with no winner
    (kbest == -1, and pad rows which can never win) keep the init values
    (zeros, shininess 1.0) exactly as trace_nearest's init."""
    f32 = jnp.float32
    zero = jnp.zeros(shape, f32)
    planes = tuple([zero] * 9 + [jnp.ones(shape, f32)])  # shin init 1.0
    if with_mirror:
        planes = planes + (zero,)  # "mir" init 0 (trace_nearest's init)

    def group(eval_fn, read, P, k_offset, n_obj, planes, with_t_known,
              mir_idx, chunk):
        def per_object(k, planes):
            mask = kbest == (k + k_offset)
            pv = tuple(read(k, c) for c in range(P))
            if with_t_known:
                _, n_unit, col, coeffs = eval_fn(pv, o, d, t_known=t_sel)
            else:
                _, n_unit, col, coeffs = eval_fn(pv, o, d)
            new = list(n_unit) + list(col) + list(coeffs)
            if with_mirror:
                new.append(jnp.broadcast_to(pv[mir_idx], shape))
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
        planes = group(_sphere_eval, sph_read, p_sph, 0, n_sph, planes, True,
                       P_SPH - 1, sph_chunk)
    if n_rct:
        planes = group(_rect_eval, rct_read, p_rct, rct_offset, n_rct, planes,
                       False, P_RCT - 1, rct_chunk)
    names = ATTR_NAMES + ("mir",) if with_mirror else ATTR_NAMES
    return dict(zip(names, planes))


def _occluded_loop(sph_read, n_sph, rct_read, n_rct, unroll=1):
    """Loop-based shadow any-hit (the occluded_fn injected into shading)."""

    def occluded_fn(so, ld, dist):
        # f32 0/1 accumulator, not bool: Mosaic's packed i1 mask layout
        # (vector<...xi1> vpad) does not reconcile across fori_loop carries
        # (observed compile failure: arith.ori of 8x128x32xi1 vs 8x128xi1).
        occ = jnp.zeros_like(dist)

        def sph_body(k, occ):
            c = (sph_read(k, 0), sph_read(k, 1), sph_read(k, 2))
            t = intersect_sphere(so, ld, c, sph_read(k, 3))
            return jnp.maximum(occ, (t < dist).astype(occ.dtype))

        def rct_body(k, occ):
            pv = tuple(rct_read(k, j) for j in range(9))
            t, _, _, _ = intersect_rect(
                so, ld, (pv[0], pv[1], pv[2]), (pv[3], pv[4], pv[5]), (pv[6], pv[7], pv[8])
            )
            return jnp.maximum(occ, (t < dist).astype(occ.dtype))

        if n_sph:
            occ = _unrolled_fori(n_sph, sph_body, occ, unroll)
        if n_rct:
            occ = _unrolled_fori(n_rct, rct_body, occ, unroll)
        return occ > 0.5

    return occluded_fn


# ---------------------------------------------------------------------------
# Kernel factory
# ---------------------------------------------------------------------------

def pad_rows(arr, n_pad, pad_row):
    """Pad object rows to ``n_pad`` with a benign pad row (see _SPH_PAD_ROW)."""
    if arr.shape[0] == n_pad:
        return arr
    fill = jnp.tile(jnp.asarray(pad_row)[None], (n_pad - arr.shape[0], 1))
    return jnp.concatenate([arr, fill], axis=0) if arr.shape[0] else fill


def auto_tiles(scene_like: Scene, cfg: RenderConfig,
               tiles: "VecTileConfig | None") -> VecTileConfig:
    """Default tiling with a backward-tile shrink for the env+reflections
    live-set multiplier: the per-level env dense sampler keeps its 2K
    weight planes + texel accumulators live PER LEVEL in the backward —
    observed v5e scoped-vmem OOM at the default 64-row bwd tiles:
    env(K=16)+reflections=1 hit 22.4M (limit 16M); 32 rows fit and run
    3.71 ms/step. The in-kernel spp=4 subsample loop FITS at 64 rows and
    is fastest there (swept: 4.39/4.84/7.51 ms at 64/32/16), so spp does
    not shrink. Explicitly-passed tiles are honored verbatim (sweep
    scripts need that)."""
    if tiles is not None:
        return tiles
    t = VecTileConfig()
    refl = cfg.reflections if cfg.shader == "phong" else 0
    obj_tex = scene_object_textured(scene_like)
    bwd = t.bh_bwd
    if scene_like.env_mapped and refl:
        bwd = max(8, bwd // (1 + refl))
    env_k = int(np.shape(scene_like.env)[0])
    if (_ENV_BWD != "vjp" and env_k > 16 and not refl
            and cfg.spp == 1):
        # Round-5 custom env backend (RRT_ENVBWD=mxu, the default): the
        # backward no longer carries the 2K hat-weight planes as
        # residuals, so large-K env fits far bigger tiles. Probed on v5e
        # (64-obj 512^2 step, scripts/envbwd_probe.py): K=24 @ 32 rows
        # 2.60 ms (vs 3.83 at the vjp-era 16), K=32 @ 32 rows 3.42 ms
        # (vs 9.50 at the vjp-era 8 — 2.8x); 64-row tiles OOM scoped
        # vmem for both. The lift is refl=0/spp=1 only: env+reflections
        # at these K OOMs even under mxu (K=24 @ 32 rows and K=32 @ 16
        # rows both fail compile — probed), and spp=4's in-kernel 2x2
        # subsample loop multiplies the live set (unprobed) — both keep
        # the vjp-era ladder below. K=48 is a hard compile refusal at
        # any tile (tpu_compile_helper crash), which keeps the K <= 32
        # dispatch threshold honest under BOTH backends.
        bwd = min(bwd, 32)
    elif env_k > 24:
        # Auto-vjp backend (RRT_ENVBWD=vjp), or refl/spp=4: the dense
        # env hat-weight planes scale with K — at K=32 the step OOMs
        # scoped vmem at 32-row tiles (36.97M) AND 16-row tiles (17.84M,
        # limit 16M); 8 rows compile and run (probed on v5e). The SOFT
        # family's fixed term is bigger and caps at K <= 24 under vjp
        # (fused_vec_soft).
        bwd = 8
    elif env_k > 16:
        # K=24 fits 16-row tiles and is ~1.8x faster there than at 8 —
        # both probed on v5e at 64-obj 512^2: local-shading 3.83 vs
        # 6.87 ms/step, reflections=1 (per-level env planes and all)
        # 6.89 vs 12.10 ms/step.
        bwd = min(bwd, 16)
    if obj_tex:
        # Texel-tail rows: the backward's per-texel masked reductions
        # prefer smaller tiles (swept at 64 textured spheres K=16 512^2:
        # 10.61 ms at 32 rows vs 11.56 at 64; 128 fails to compile), and
        # the dense K^2-MAC texel sampling wants the FINE chunk-skip
        # (round 4: tex_chunk=2 takes the same scene 10.61 -> 4.16 ms —
        # see VecTileConfig.tex_chunk).
        bwd = min(bwd, 32)
        t = dataclasses.replace(t, tex_chunk=2)
        if refl >= 2:
            # Textured bounces multiply the texel-accumulator live set by
            # the level count (each level's replay keeps its own hat-weight
            # planes live through the reverse pass) — but ONE bounce still
            # fits the 32-row tiles and is 1.38x faster there than the old
            # halving to 16 (swept on v5e, 64 textured+mirrored spheres
            # 512^2: 17.06 vs 23.60 ms/step; deeper chains keep the old
            # conservative shrink).
            bwd = max(8, bwd // (1 + refl))
    if cfg.spp == 4 and refl:
        # spp=4 multiplies the per-LEVEL live set: reflective spp=4
        # halves once (swept on v5e at 64-obj 512^2: 32 rows = 10.32
        # ms/step, 64 rows OOM scoped vmem by 16 KiB), and env/texel
        # bounce chains halve once more. Textured WITHOUT bounces keeps
        # the obj_tex 32-row tiles untouched — round 4's sweep showed
        # the old conservative double-halving to 8 rows cost 2.4x
        # (39.79 -> 16.63 ms/step at 32 rows; 64 OOMs at 19.8M).
        bwd = max(8, bwd // 2)
        if obj_tex or scene_like.env_mapped:
            bwd = max(8, bwd // 2)
    return dataclasses.replace(t, bh_bwd=bwd)


_CACHE: dict = {}


def _make_fused_vec(
    scene_like: Scene,
    cfg: RenderConfig,
    tiles: VecTileConfig,
    interpret: bool,
    out_h: int | None = None,
):
    if cfg.spp not in (1, 4):
        raise NotImplementedError(f"spp must be 1 or 4, got {cfg.spp}")
    # spp=4 RENDERING stays on the 4-launch wrapper (one spp=1 compile
    # serves both settings — subsample offsets are runtime off_ref
    # scalars; see render_pallas_vec). Measured on v5e (round 4, 64-obj
    # 512^2): wrapper 1.992 ms = 3.88x the 0.513 ms spp=1 render — 3%
    # UNDER the ideal 4x, so an in-kernel render-side subsample loop has
    # nothing left to win (launches are free relative to the tile work).
    # spp=4 TRAINING fuses the 2x2
    # subsample loop INTO the step kernel (round 3, VERDICT r2 item #8):
    # the mse residual is taken of the post-clip subsample AVERAGE, which
    # cannot decompose into 4 independent step launches — the step-mode
    # body loops the replay/shade/reverse passes over the four offsets
    # and the fwd/bwd render kernels are simply not built at spp=4.
    if cfg.soft_tau > 0.0 or cfg.checker_tau > 0.0:
        raise NotImplementedError(
            "fused_vec implements the hard reference semantics; soft_tau/"
            "checker_tau rendering lives in pipeline_vec.render_jnp_vec and "
            "kernels.fused_vec_soft (render impl='auto' routes there)"
        )
    out_h = cfg.height if out_h is None else out_h
    n_sph = scene_like.spheres.count
    n_rct = scene_like.rects.count
    n_lights = scene_like.lights.count
    env_shape = tuple(np.shape(scene_like.env))
    sph_tex_shape = tuple(np.shape(scene_like.spheres.texture))
    rct_tex_shape = tuple(np.shape(scene_like.rects.texture))
    # Per-scene SMEM row lengths: textured groups append K*K*3 texel
    # scalars per row (see the P_SPH note at the top of the module).
    (p_sph, p_rct, ns_pad_est, nr_pad_est,
     sph_tex_len, rct_tex_len, smem_bytes) = _row_plan(scene_like)
    if not vec_smem_ok(scene_like):
        raise NotImplementedError(
            f"textured object rows need {smem_bytes//1024} KiB of SMEM "
            f"(> the ~{SMEM_BUDGET_BYTES//1024} KiB budget) — this scene "
            "renders via jnp_vec (impl='auto' routes)"
        )
    # The backends are in the key: they change the traced backward, so a
    # cached kernel from one backend must not serve the other (tests
    # monkeypatch the flags).
    key = ((n_sph, n_rct, n_lights, env_shape, sph_tex_shape, rct_tex_shape),
           cfg, tiles, interpret, out_h, _TEXEL_BWD, _ENV_BWD)
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
    # SMEM rows padded to a CHUNK multiple (benign rows; see _SPH_PAD_ROW) —
    # the backward's chunked skip loops read whole chunks. Zero-count groups
    # still pass one dummy chunk. Textured rows pad their texel tail with
    # 0.5 (any finite value: pad rows never win a pixel, and the dense
    # sampler is finite everywhere, so zero cotangents stay exactly zero).
    ns_pad = ns_pad_est
    nr_pad = nr_pad_est
    sph_pad_row = np.concatenate(
        [_SPH_PAD_ROW, np.full(sph_tex_len, 0.5, np.float32)]
    ) if sph_tex_len else _SPH_PAD_ROW
    rct_pad_row = np.concatenate(
        [_RCT_PAD_ROW, np.full(rct_tex_len, 0.5, np.float32)]
    ) if rct_tex_len else _RCT_PAD_ROW

    # Mirror bounces (round 3): a static Python loop over levels — each
    # level reruns the SAME O(1)-compile object loops at that level's rays
    # (nearest + chunk-skipped resolve + occlusion), the levels blend
    # deepest-first exactly like pipeline.shade / pipeline_vec's reflective
    # path (unclipped per level, one clip at top), and "mir" is the 11th
    # resolved attribute plane. The backward composes the levels' stage
    # vjps in reverse through the reflect-ray construction (see
    # make_bwd_kernel).
    R = cfg.reflections if cfg.shader == "phong" else 0
    n_vis = n_lights * (1 + R) if (cfg.shadows and cfg.shader == "phong") else 0

    # Finer chunk-skip for texel-bearing groups (see VecTileConfig.tex_chunk):
    # must divide CHUNK so the SMEM pad rows / kbest numbering are unchanged.
    tc = max(1, min(tiles.tex_chunk, CHUNK))
    assert CHUNK % tc == 0, f"tex_chunk {tc} must divide CHUNK {CHUNK}"
    sph_chunk = tc if sph_tex_len else CHUNK
    rct_chunk = tc if rct_tex_len else CHUNK

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

    cfg_level = dataclasses.replace(cfg, clip=False) if R else cfg

    # ------------------------------------------------------------- forward
    def fwd_kernel(off_ref, glob_ref, sph_ref, rct_ref, r_ref, g_ref, b_ref, *vis_refs):
        i, j = pl.program_id(0), pl.program_id(1)
        ii, jj = tile_coords(off_ref, i, j, bh, bw)
        gvals = tuple(glob_ref[0, idx] for idx in range(Sg))
        o, d, gview = rays_for(gvals, ii, jj, (bh, bw))
        sph_read = lambda k, c: sph_ref[k, c]
        rct_read = lambda k, c: rct_ref[k, c]
        occluded_fn = _occluded_loop(sph_read, n_sph, rct_read, n_rct,
                                     unroll=tiles.unroll)

        def trace_level(o_l, d_l, depth):
            # Rects numbered at ns_pad in kbest space (not n_sph) so sphere
            # PAD-row indices [n_sph, ns_pad) can never collide with a real
            # rect index (see bwd_kernel note).
            t, kbest = _nearest_loop(
                sph_read, n_sph, rct_read, n_rct, o_l, d_l, (bh, bw),
                rct_offset=ns_pad, unroll=tiles.unroll,
            )
            hit = t < BIG * 0.5
            at = _resolve_attrs(
                sph_read, n_sph, rct_read, n_rct, o_l, d_l, (bh, bw), t,
                kbest, ns_pad, p_sph=p_sph, p_rct=p_rct,
                with_mirror=depth < R,
                sph_chunk=sph_chunk, rct_chunk=rct_chunk,
            )
            return t, hit, at

        vis_all = []

        def level(o_l, d_l, depth):
            t, hit, at = trace_level(o_l, d_l, depth)
            out = shade_from_attrs(
                _globals_ns(gview), o_l, d_l, cfg_level, (bh, bw), t, hit,
                at, occluded_fn=occluded_fn, return_vis=True,
            )
            col, vis = out
            vis_all.extend(vis)
            if depth < R:
                n = (at["nx"], at["ny"], at["nz"])
                rdir = reflect_dir(d_l, n)
                ro = shadow_origin(o_l, d_l, t, n)
                rcol = level(ro, rdir, depth + 1)
                m = jnp.where(hit, at["mir"], 0.0)
                col = tuple(c + m * (rc - c) for c, rc in zip(col, rcol))
            return col

        col = level(o, d, 0)
        if R and cfg.clip:
            col = tuple(jnp.clip(c, 0.0, 1.0) for c in col)
        r, g, b = col
        r_ref[:, :] = r
        g_ref[:, :] = g
        b_ref[:, :] = b
        for li in range(n_vis):
            vis_refs[li][:, :] = vis_all[li]

    fwd_call = pl.pallas_call(
        fwd_kernel,
        grid=(Hp // bh, Wp // bw),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Sg), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ns_pad, p_sph), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((nr_pad, p_rct), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((bh, bw), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        ] * (3 + n_vis),
        out_shape=[jax.ShapeDtypeStruct((Hp, Wp), f32)] * (3 + n_vis),
        interpret=interpret,
    )

    # ------------------------------------------------------------ backward
    #
    # ONE body, TWO kernels (same shape as fused_vec_soft.make_bwd_kernel):
    # step_mode=False is the render backward — gr/gg/gb refs are COTANGENT
    # tiles and the forward's saved visibility planes replay the shadow
    # decision. step_mode=True is the fused TRAINING STEP — gr/gg/gb refs
    # are TARGET tiles, the shade stage's primal colors are kept, the
    # cotangent is formed in-kernel from the residual (masked for canvas
    # padding), shadow visibility is computed inline (there is no forward
    # to save it), and a squared-error accumulator is emitted.
    def make_bwd_kernel(step_mode: bool):
      def bwd_kernel(off_ref, glob_ref, sph_ref, rct_ref, gr_ref, gg_ref, gb_ref,
                     *rest):
        if step_mode:
            vis_refs = ()
            loss_ref, dglob_ref, dsph_ref, drct_ref = rest
        else:
            vis_refs = rest[:n_vis]
            dglob_ref, dsph_ref, drct_ref = (
                rest[n_vis], rest[n_vis + 1], rest[n_vis + 2]
            )
        i, j = pl.program_id(0), pl.program_id(1)
        ii, jj = tile_coords(off_ref, i, j, bhb, bwb)
        shape = (bhb, bwb)
        gvals = tuple(glob_ref[0, idx] for idx in range(Sg))
        sph_read = lambda k, c: sph_ref[k, c]
        rct_read = lambda k, c: rct_ref[k, c]

        # Subsample loop: the step kernel fuses spp=4 in-kernel (the mse
        # residual is of the post-clip subsample AVERAGE — see the factory
        # note); cotangent mode is spp=1 only (the render wrapper owns it).
        subs = (
            SPP4_OFFSETS if (step_mode and cfg.spp == 4) else ((0.0, 0.0),)
        )

        # Stage R: rays (differentiable in globals via the camera scalars),
        # one vjp per subsample (offset order: (row0+iota)+oi, matching
        # pipeline.render_tile's in-kernel spp operand order bit-for-bit).
        rays_vjps = []
        # Replay the trace of EVERY (subsample, level) pair (no grad):
        # select decisions and winning attribute planes. The planes enter
        # the shade stage as stop-gradded VALUES; their gradients route to
        # object scalars via the masked per-object vjps below (the
        # transpose of the where-select chain), per level. Rects are
        # numbered at ns_pad (not n_sph) in kbest space so that sphere
        # PAD-row indices [n_sph, ns_pad) can never collide with a real
        # rect index (a collision hands the rect's cotangent mask to a
        # benign pad sphere at z=1e6 -> garbage camera gradients). Level
        # i's rays are recomputed values (o_{i+1}, d_{i+1}) =
        # g(o_i, d_i, t_i, n_i); g's transpose chains the levels in the
        # reverse pass below.
        levels_all = []  # [s][depth] = (o_l, d_l, t_sel, kbest, hit, planes, names)
        for (oi, oj) in subs:
            def rays_fn(gvals, oi=oi, oj=oj):
                o, d, _ = rays_for(gvals, ii + oi, jj + oj, shape)
                return o, d

            (o_l, d_l), rv = jax.vjp(rays_fn, gvals)
            rays_vjps.append(rv)
            levels = []
            for depth in range(R + 1):
                t_sel, kbest = _nearest_loop(
                    sph_read, n_sph, rct_read, n_rct, o_l, d_l, shape,
                    rct_offset=ns_pad, unroll=tiles.unroll,
                )
                t_sel = jax.lax.stop_gradient(t_sel)
                kbest = jax.lax.stop_gradient(kbest)
                hit = t_sel < BIG * 0.5
                wm = depth < R
                names = ATTR_NAMES + ("mir",) if wm else ATTR_NAMES
                at_replay = _resolve_attrs(
                    sph_read, n_sph, rct_read, n_rct, o_l, d_l, shape,
                    t_sel, kbest, ns_pad, p_sph=p_sph, p_rct=p_rct,
                    with_mirror=wm,
                    sph_chunk=sph_chunk, rct_chunk=rct_chunk,
                )
                planes = tuple(
                    jax.lax.stop_gradient(at_replay[name]) for name in names
                )
                levels.append((o_l, d_l, t_sel, kbest, hit, planes, names))
                if wm:
                    n3 = planes[0:3]
                    o_l, d_l = (
                        shadow_origin(o_l, d_l, t_sel, n3),
                        reflect_dir(d_l, n3),
                    )
            levels_all.append(levels)

        vis_tiles = (
            tuple(vr[:, :] for vr in vis_refs) if (n_vis and not step_mode)
            else None
        )
        occluded_fn = (
            _occluded_loop(sph_read, n_sph, rct_read, n_rct,
                           unroll=tiles.unroll)
            if step_mode else None
        )

        # Stage S: object-count-independent shading + the mirror blend +
        # the subsample average. Every (subsample, level)'s rays/t/planes
        # enter as EXPLICIT inputs (replayed constants); the implicit
        # dependence of level i+1's inputs on level i flows through g's
        # transpose in the reverse pass, and of t/planes on the rays
        # through the per-object vjps. In cotangent mode occluded_fn stays
        # None: the forward saved the (zero-gradient) visibility planes,
        # replayed per level. In step mode the any-hit runs inline per
        # (subsample, level) (bool -> zero gradient).
        L = n_lights

        def shade_fn(gvals, rays_in, ts_in, planes_in):
            gview = _scalar_view(gtreedef, gmeta, lambda idx: gvals[idx])
            ns_g = _globals_ns(gview)
            acc = None
            for s in range(len(subs)):
                cols = []
                for depth in range(R + 1):
                    o_i, d_i = rays_in[s][depth]
                    at = dict(zip(levels_all[s][depth][6],
                                  planes_in[s][depth]))
                    vi = (
                        tuple(vis_tiles[depth * L:(depth + 1) * L])
                        if vis_tiles is not None else None
                    )
                    cols.append(shade_from_attrs(
                        ns_g, o_i, d_i, cfg_level, shape, ts_in[s][depth],
                        levels_all[s][depth][4], at, vis_in=vi,
                        occluded_fn=occluded_fn,
                    ))
                col = cols[R]
                for depth in reversed(range(R)):
                    m = jnp.where(
                        levels_all[s][depth][4], planes_in[s][depth][10],
                        0.0,
                    )  # planes[10] = "mir"
                    col = tuple(
                        c + m * (rc - c) for c, rc in zip(cols[depth], col)
                    )
                if R and cfg.clip:
                    col = tuple(jnp.clip(c, 0.0, 1.0) for c in col)
                acc = col if acc is None else vm.vadd(acc, col)
            if len(subs) > 1:
                acc = vm.vscale(acc, 1.0 / len(subs))
            return acc

        rays_in = tuple(
            tuple((lv[0], lv[1]) for lv in levels) for levels in levels_all
        )
        ts_in = tuple(
            tuple(lv[2] for lv in levels) for levels in levels_all
        )
        planes_in = tuple(
            tuple(lv[5] for lv in levels) for levels in levels_all
        )
        (r, g, b), shade_vjp = jax.vjp(
            shade_fn, gvals, rays_in, ts_in, planes_in
        )
        if step_mode:
            w = off_ref[0, 2]
            ri_ = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + i * bhb
            ci_ = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + j * bwb
            pmask = ((ri_ < H) & (ci_ < W)).astype(f32)
            res_r = (r - gr_ref[:, :]) * pmask
            res_g = (g - gg_ref[:, :]) * pmask
            res_b = (b - gb_ref[:, :]) * pmask
            sq = (jnp.sum(res_r * res_r) + jnp.sum(res_g * res_g)
                  + jnp.sum(res_b * res_b))
            two_w = 2.0 * w
            dcol = (two_w * res_r, two_w * res_g, two_w * res_b)
        else:
            dcol = (gr_ref[:, :], gg_ref[:, :], gb_ref[:, :])
        dg_shade, d_rays_all, d_ts_all, d_planes_all = shade_vjp(dcol)

        # Stage O: per-object masked vjps, accumulating SMEM grad rows.
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

        def obj_backward(eval_fn, read, P, k_offset, dref, n_obj,
                         kbest, o_l, d_l, d_t, d_planes, with_m, mir_idx,
                         chunk):
            """Chunked masked vjps: a CHUNK of objects whose members win no
            pixel of this tile has identically-zero cotangents, so the whole
            chunk's vjps are skipped with ONE lax.cond (per-object conds
            were tried and reverted — the scalar sync per iteration defeated
            loop pipelining). SMEM rows are padded to a CHUNK multiple with
            benign far-away objects so tail chunks read valid data. With
            ``with_m`` the object's mirror scalar is an extra output, so
            its cotangent (the blend weight's gradient) lands on pv[mir_idx]
            through the same dpv write-back."""

            def per_object(k, acc2):
                d_o_acc, d_d_acc = acc2
                mask = (kbest == (k + k_offset)).astype(f32)
                pv = tuple(read(k, c) for c in range(P))

                def f(pv, o, d):
                    t, n_unit, col, coeffs = eval_fn(pv, o, d)
                    # Broadcast scalar outputs (material coefficients) to
                    # the tile so cotangent shapes match; the vjp transpose
                    # (reduce-sum) is exactly the where-select chain's.
                    outs = (t,) + tuple(n_unit) + tuple(col) + tuple(coeffs)
                    if with_m:
                        outs = outs + (pv[mir_idx],)
                    return tuple(jnp.broadcast_to(x, shape) for x in outs)

                _, obj_vjp = jax.vjp(f, pv, o_l, d_l)
                cots = (d_t * mask,) + tuple(p * mask for p in d_planes)
                dpv, d_o_k, d_d_k = obj_vjp(cots)
                for c in range(P):
                    dref[k, c] = dref[k, c] + dpv[c]
                return (vm.vadd(d_o_acc, d_o_k), vm.vadd(d_d_acc, d_d_k))

            def chunk_body(ci, acc):
                k0 = ci * chunk
                lo = k0 + k_offset
                in_chunk = (
                    (kbest >= lo) & (kbest < lo + chunk)
                ).astype(f32)
                any_live = jnp.max(in_chunk) > 0.0
                return jax.lax.cond(
                    any_live,
                    lambda a: jax.lax.fori_loop(
                        k0, k0 + chunk, per_object, a
                    ),
                    lambda a: a,
                    acc,
                )

            n_chunks = (n_obj + chunk - 1) // chunk
            return chunk_body, n_chunks

        # Reverse pass, per subsample, over the levels deepest first. Each
        # level's total ray cotangent = the shade stage's explicit part +
        # the per-object vjps' implicit part (+ for non-deepest levels,
        # the transpose of the NEXT level's ray construction g, which also
        # deposits onto this level's t and normal planes — run BEFORE this
        # level's object vjps so those see the full cotangents). Each
        # subsample's level-0 total closes through ITS rays_vjp; the
        # camera cotangents sum across subsamples.
        zero3 = (jnp.zeros(shape, f32),) * 3
        dg_rays_total = None
        for s in range(len(subs)):
            d_o_next, d_d_next = None, None
            for depth in reversed(range(R + 1)):
                o_l, d_l, t_sel, kbest, hit_l, planes, names = levels_all[s][depth]
                d_o_l, d_d_l = d_rays_all[s][depth]
                d_t_l = d_ts_all[s][depth]
                d_pl_l = list(d_planes_all[s][depth])
                if depth < R:
                    def g_fn(o_a, d_a, t_a, n3):
                        return (shadow_origin(o_a, d_a, t_a, n3),
                                reflect_dir(d_a, n3))

                    _, g_vjp = jax.vjp(g_fn, o_l, d_l, t_sel, planes[0:3])
                    dgo, dgd, dgt, dgn = g_vjp((d_o_next, d_d_next))
                    d_o_l = vm.vadd(d_o_l, dgo)
                    d_d_l = vm.vadd(d_d_l, dgd)
                    d_t_l = d_t_l + dgt
                    for c in range(3):
                        d_pl_l[c] = d_pl_l[c] + dgn[c]
                d_pl_l = tuple(d_pl_l)
                with_m = depth < R
                acc = (zero3, zero3)
                if n_sph:
                    chunk_body, n_chunks = obj_backward(
                        _sphere_eval, sph_read, p_sph, 0, dsph_ref, n_sph,
                        kbest, o_l, d_l, d_t_l, d_pl_l, with_m, P_SPH - 1,
                        sph_chunk,
                    )
                    acc = jax.lax.fori_loop(0, n_chunks, chunk_body, acc)
                if n_rct:
                    chunk_body, n_chunks = obj_backward(
                        _rect_eval, rct_read, p_rct, ns_pad, drct_ref, n_rct,
                        kbest, o_l, d_l, d_t_l, d_pl_l, with_m, P_RCT - 1,
                        rct_chunk,
                    )
                    acc = jax.lax.fori_loop(0, n_chunks, chunk_body, acc)
                d_o_obj, d_d_obj = acc
                d_o_next = vm.vadd(d_o_l, d_o_obj)
                d_d_next = vm.vadd(d_d_l, d_d_obj)

            # Stage R transpose: close this subsample's camera path.
            (dg_rays,) = rays_vjps[s]((d_o_next, d_d_next))
            dg_rays_total = dg_rays if dg_rays_total is None else tuple(
                a + b for a, b in zip(dg_rays_total, dg_rays)
            )

        for idx in range(Sg):
            dglob_ref[0, idx] = (
                dglob_ref[0, idx] + dg_shade[idx] + dg_rays_total[idx]
            )
        if step_mode:
            loss_ref[0, 0] = loss_ref[0, 0] + sq

      return bwd_kernel

    bwd_call = pl.pallas_call(
        make_bwd_kernel(False),
        grid=(Hp // bhb, Wp // bwb),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Sg), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ns_pad, p_sph), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((nr_pad, p_rct), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ]
        + [
            pl.BlockSpec((bhb, bwb), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        ] * (3 + n_vis),
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
        interpret=interpret,
    )

    # Fused training step: target tiles in, (sq_sum, grads) out — the
    # optimizer step drops the forward kernel entirely.
    step_call = pl.pallas_call(
        make_bwd_kernel(True),
        grid=(Hp // bhb, Wp // bwb),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
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
        interpret=interpret,
    )

    # --------------------------------------------------------- custom_vjp
    _pad = pad_rows

    @jax.custom_vjp
    def fused(gflat, sph, rct, offsets):
        return tuple(fwd_call(offsets, gflat.reshape(1, Sg),
                              _pad(sph, ns_pad, sph_pad_row),
                              _pad(rct, nr_pad, rct_pad_row)))

    def fused_fwd(gflat, sph, rct, offsets):
        outs = fused(gflat, sph, rct, offsets)
        return outs, (gflat, sph, rct, offsets, outs[3:])

    def fused_bwd(res, cotangents):
        gflat, sph, rct, offsets, vis = res
        gr, gg, gb = cotangents[0], cotangents[1], cotangents[2]
        dglob, dsph, drct = bwd_call(
            offsets, gflat.reshape(1, Sg), _pad(sph, ns_pad, sph_pad_row),
            _pad(rct, nr_pad, rct_pad_row), gr, gg, gb, *vis
        )
        return (
            dglob.reshape(Sg),
            dsph[: sph.shape[0]],
            drct[: rct.shape[0]],
            jnp.zeros_like(offsets),
        )

    fused.defvjp(fused_fwd, fused_bwd)

    def apply(gflat, sph, rct, offsets):
        # RENDERING at spp=4 never lands here (render_pallas_vec strips
        # spp and wrapper-averages); the spp=4 factory build exists only
        # for its step kernel, whose body loops the subsamples itself.
        assert cfg.spp == 1, "spp>1 rendering uses the wrapper, not apply()"
        outs = fused(gflat, sph, rct, offsets)
        r, g, b = outs[0], outs[1], outs[2]
        return jnp.stack([r[:H, :W], g[:H, :W], b[:H, :W]], axis=-1)

    def apply_step(gflat, sph, rct, meta_row, tr, tg, tb):
        sq, dglob, dsph, drct = step_call(
            meta_row, gflat.reshape(1, Sg),
            _pad(sph, ns_pad, sph_pad_row),
            _pad(rct, nr_pad, rct_pad_row),
            tr, tg, tb,
        )
        return sq[0, 0], dglob.reshape(Sg), dsph, drct

    entry = (apply, apply_step, (Hp, Wp))
    _CACHE[key] = entry
    return entry


def loss_grad_pallas_vec(
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
    """Fused training step for the object-chunked kernel family: (loss,
    grads) of ``loss(render_pallas_vec(scene), target)`` in ONE kernel
    launch. Same contract as fused.loss_grad_pallas (``norm`` overrides the
    loss normalization for shard bands); grads return as a Scene-structured
    pytree via the transpose of the host-side packing. The kernel is the
    render backward's own body in step mode (`_make_fused_vec`'s
    make_bwd_kernel(True)) — one implementation to maintain."""
    tiles = auto_tiles(scene, cfg, tiles)
    H = out_height or cfg.height
    _, apply_step, (Hp, Wp) = _make_fused_vec(
        scene, cfg, tiles, interpret, out_h=out_height
    )
    n_sph, n_rct = scene.spheres.count, scene.rects.count

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

    def pack_all(scene):
        return (
            flatten_scene(globals_tree(scene)),
            pack_spheres(scene),
            pack_rects(scene),
        )

    (gflat, sph, rct), pack_vjp = jax.vjp(pack_all, scene)
    sq, dglob, dsph, drct = apply_step(gflat, sph, rct, meta_row, tr, tg, tb)
    (grads,) = pack_vjp((dglob, dsph[:n_sph], drct[:n_rct]))
    return norm * sq, grads


def render_pallas_vec(
    scene: Scene,
    cfg: RenderConfig,
    row0=0.0,
    col0=0.0,
    tiles: VecTileConfig | None = None,
    interpret: bool = False,
    out_height: int | None = None,
):
    """Render via the object-chunked Pallas kernels. Differentiable w.r.t.
    ``scene`` (grads flow back through the pack_* concatenations into the
    pytree). Same band-offset contract as fused.render_pallas for
    shard_map row-band sharding.

    spp = 4: four launches of the SAME spp=1 compile at quarter-pixel
    runtime offsets, averaged (pipeline_vec.spp_average semantics). The
    offsets ride the off_ref SMEM scalars; quarter-pixel sums of dyadic
    row/col values are exact in f32, so each subsample is bit-identical
    to an in-kernel offset and AD composes through the average."""
    import dataclasses

    from ..pipeline_vec import spp_average

    cfg1 = dataclasses.replace(cfg, spp=1) if cfg.spp != 1 else cfg
    # auto_tiles sees the spp-STRIPPED cfg: the wrapper launches spp=1
    # kernels, so only the env+reflections live-set multiplier applies.
    tiles = auto_tiles(scene, cfg1, tiles)
    apply, _, _ = _make_fused_vec(scene, cfg1, tiles, interpret, out_h=out_height)
    gflat = flatten_scene(globals_tree(scene))
    sph, rct = pack_spheres(scene), pack_rects(scene)

    def once(oi, oj):
        offsets = jnp.stack(
            [jnp.asarray(row0, jnp.float32) + oi,
             jnp.asarray(col0, jnp.float32) + oj]
        ).reshape(1, 2)
        return apply(gflat, sph, rct, offsets)

    return spp_average(once, cfg)
