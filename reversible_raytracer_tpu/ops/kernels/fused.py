"""Fused Pallas TPU kernels: the production render path.

This is the TPU-native replacement for the reference's Theano-codegen'd
native layer (SURVEY.md L0, C4-C8, C11; BASELINE.json:5 "fused Pallas
forward+backward kernels over tiled ray batches"). One forward kernel and
one backward kernel each cover the ENTIRE pipeline — ray generation,
sphere/rect intersection, nearest-hit select, shadow rays, Lambertian+Phong
shading, checker materials — per image tile.

Data layout (the load-bearing design decision):

- The scene is O(10^2..10^3) *scalars*. It enters the kernel as one flat f32
  vector in **SMEM**, and the kernel reads each parameter as an SMEM scalar
  (`scene_ref[0, idx]`). Every compute op is then scalar x (bh, bw)-tile —
  exactly the VPU's happy path. No small-vector slicing/reshaping happens
  on the vector units at all (Mosaic has no lowering for tiny-vector
  relayouts like (4,3)->(12), which sank the earlier ravel_pytree design).
- The scalars are reassembled into the *same Scene dataclasses* with nested
  tuples as leaves, so `ops.pipeline.render_tile` — the single source of
  truth shared with the jnp path — traces unchanged inside the kernel.
- Rays are generated inside the kernel from camera scalars + tile iota: ray
  tensors never exist in HBM. Forward HBM traffic is exactly the 3*H*W*4
  output bytes — the kernel is output-bandwidth-optimal.

Backward (`custom_vjp`, SURVEY.md §7 "recompute-in-backward"):

- The forward saves NO residuals (a per-pixel hit record would cost more
  HBM than recomputing). The backward kernel replays the forward for its
  tile by calling `jax.vjp` on `render_tile` *inside the kernel body*, with
  the S scene scalars as differentiation arguments, and accumulates the S
  gradient scalars into an SMEM output block across the sequential TPU grid
  (first tile initializes, later tiles add — grid steps on one TPU core
  execute in order, making cross-tile accumulation race-free).
- Because fwd and bwd both trace `render_tile`, the hand-planned backward
  agrees with `jax.grad` of the jnp renderer by construction (the SURVEY
  §4.2 fidelity triangulation).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.scene import Scene, scene_object_textured, scene_textured
from ..pipeline import RenderConfig, n_vis_planes, render_tile


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class TileConfig:
    """Static kernel tiling. Lane dim (bw) should be a multiple of 128."""

    bh: int = 128
    bw: int = 128
    bh_bwd: int = 16
    bw_bwd: int = 128

    @staticmethod
    def for_shape(H: int, W: int, n_objects: int) -> "TileConfig":
        """Pick tiles so the live set fits VMEM (~16 MB/core).

        The unrolled object chain keeps O(n_objects) per-pixel f32 arrays
        live under Mosaic's scheduler: ~10 per object in the forward, ~24 in
        the backward (vjp residuals). Tile pixels ~= budget / per-pixel."""
        n = max(n_objects, 1)

        def pick_rows(budget_bytes, arrays_per_obj, bw):
            per_px = n * arrays_per_obj * 4
            rows = max(8, min(128, budget_bytes // (per_px * bw)))
            return 1 << (rows.bit_length() - 1)  # round down to pow2

        bw = 128
        bh = min(pick_rows(10 * 1024 * 1024, 10, bw), _round_up(H, 8))
        # Sweep-validated at 512^2: bwd tile rows beyond 64 lose throughput
        # (VMEM pressure from vjp residuals), below 32 pay grid overhead.
        bh_bwd = min(pick_rows(8 * 1024 * 1024, 24, bw), 64, _round_up(H, 8))
        return TileConfig(bh=bh, bw=bw, bh_bwd=bh_bwd, bw_bwd=bw)


# ---------------------------------------------------------------------------
# Flat scalar layout of a Scene
# ---------------------------------------------------------------------------


def tile_object_count(scene: Scene, cfg: RenderConfig) -> int:
    """Effective object count for TileConfig's VMEM budget. Each mirror
    bounce replays the whole object chain in VMEM; a textured group keeps
    ~2K hat-weight tiles live through the dense sampler
    (`pipeline.sample_texture_dense`), worth roughly K/4
    object-equivalents (10 live arrays/object forward, 24 backward).
    For TEXTURED/env scenes each spp subsample keeps its own dense-
    sampler live set (observed: textured spp=4 at tiles sized for the
    spp=1 count OOMs scoped vmem 38.7M > 16M — round 3), so spp
    multiplies there like reflections do; untextured chains fit at the
    spp=1 tiles (measured: shrinking them cost 0.441 -> 0.509 ms on the
    config-2 spp=4 step, so spp deliberately does NOT scale them)."""
    n_obj = scene.spheres.count + scene.rects.count
    dense_sampler = scene.env_mapped
    for grp in (scene.spheres, scene.rects):
        if grp.textured:
            n_obj += max(2, int(np.shape(grp.texture)[1]) // 4)
            dense_sampler = True
    if scene.env_mapped:
        n_obj += max(2, int(np.shape(scene.env)[0]) // 4)
    spp_mult = cfg.spp if dense_sampler else 1
    return n_obj * (1 + cfg.reflections) * spp_mult


def scene_layout(scene_like: Scene):
    """(treedef, [(start, shape)], total_size) for row-major flat packing."""
    leaves, treedef = jax.tree_util.tree_flatten(scene_like)
    meta = []
    off = 0
    for leaf in leaves:
        shape = tuple(np.shape(leaf))
        size = int(np.prod(shape)) if shape else 1
        meta.append((off, shape))
        off += size
    return treedef, meta, off


def flatten_scene(scene: Scene):
    """Scene pytree -> flat (S,) f32 vector (differentiable jnp op)."""
    leaves = jax.tree_util.tree_leaves(scene)
    parts = [jnp.ravel(jnp.asarray(l, jnp.float32)) for l in leaves]
    return jnp.concatenate(parts) if parts else jnp.zeros((0,), jnp.float32)


def _scalar_view(treedef, meta, read):
    """Rebuild the Scene dataclass structure with nested-tuple leaves whose
    elements are ``read(flat_index)`` scalars, for any leaf rank (rank 4 is
    the (N, K, K, 3) texture grids; `pipeline.sample_texture` dispatches
    tuple-leaf textures to its gather-free dense path)."""

    def nest(start, shape):
        if not shape:
            return read(start)
        stride = int(np.prod(shape[1:])) if len(shape) > 1 else 1
        return tuple(nest(start + i * stride, shape[1:]) for i in range(shape[0]))

    leaves = []
    for start, shape in meta:
        size = int(np.prod(shape)) if shape else 1
        if size == 0:
            # Size-0 leaf (an untextured group's texture grid): an empty
            # tuple sentinel — .textured and _leading_dim tolerate it.
            leaves.append(())
        else:
            leaves.append(nest(start, shape))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _scene_signature(scene: Scene):
    leaves, treedef = jax.tree_util.tree_flatten(scene)
    return (treedef, tuple((tuple(np.shape(l)), jnp.asarray(l).dtype.name) for l in leaves))


_CACHE: dict = {}


def _make_fused(
    scene_like: Scene,
    cfg: RenderConfig,
    tiles: TileConfig,
    interpret: bool,
    out_h: int | None = None,
):
    """Build (and cache) the custom_vjp'd fused renderer for this scene
    structure + render config + tiling.

    ``out_h`` renders only that many rows (starting at the runtime row
    offset) while keeping camera math relative to the full cfg.height x
    cfg.width image — the row-band primitive for shard_map (SURVEY.md P1).
    """
    if cfg.soft_tau > 0.0 or cfg.checker_tau > 0.0:
        raise NotImplementedError(
            "the fused kernels implement the hard reference semantics; "
            "soft_tau/checker_tau rendering lives in pipeline_vec."
            "render_jnp_vec and kernels.fused_vec_soft (render impl='auto' "
            "routes there)"
        )
    if scene_object_textured(scene_like) and cfg.reflections:
        raise NotImplementedError(
            "object-textured scenes with mirror reflections render via "
            "the jnp paths (each bounce would replay the O(K^2) dense "
            "texture chain in-kernel — trace/compile explosion); "
            "impl='auto' routes there. Env-only scenes are fine: a bounce "
            "adds ONE dense env sample."
        )
    out_h = cfg.height if out_h is None else out_h
    key = (_scene_signature(scene_like), cfg, tiles, interpret, out_h)
    hit = _CACHE.get(key)
    if hit is not None:
        return hit

    treedef, meta, S = scene_layout(scene_like)
    H, W = out_h, cfg.width
    bh, bw = min(tiles.bh, _round_up(H, 8)), min(tiles.bw, _round_up(W, 128))
    bhb = min(tiles.bh_bwd, _round_up(H, 8))
    bwb = min(tiles.bw_bwd, _round_up(W, 128))
    # One padded canvas serving BOTH grids (fwd writes shadow-visibility
    # residuals that the bwd reads with its own tiling).
    Hp = _round_up(H, math.lcm(bh, bhb))
    Wp = _round_up(W, math.lcm(bw, bwb))
    f32 = jnp.float32

    # Shadow visibility is a step function (zero gradient): the forward
    # saves it per (subsample, bounce, light) plane, and the backward replay
    # skips the shadow any-hit loop entirely (~25% of the step for 1-light
    # scenes at 512^2). Each subsample and reflection bounce carries its own
    # shadow decision (render_tile's subsample-major, bounce-major layout).
    n_vis = n_vis_planes(scene_like, cfg)

    # ------------------------------------------------------------- forward
    def fwd_kernel(off_ref, scene_ref, r_ref, g_ref, b_ref, *vis_refs):
        i = pl.program_id(0)
        j = pl.program_id(1)
        row0 = off_ref[0, 0] + (i * bh).astype(f32)
        col0 = off_ref[0, 1] + (j * bw).astype(f32)
        view = _scalar_view(treedef, meta, lambda idx: scene_ref[0, idx])
        (r, g, b), vis = render_tile(view, cfg, row0, col0, bh, bw, return_vis=True)
        r_ref[:, :] = r
        g_ref[:, :] = g
        b_ref[:, :] = b
        for li in range(n_vis):
            vis_refs[li][:, :] = vis[li]

    fwd_call = pl.pallas_call(
        fwd_kernel,
        grid=(Hp // bh, Wp // bw),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((bh, bw), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        ] * (3 + n_vis),
        out_shape=[jax.ShapeDtypeStruct((Hp, Wp), f32)] * (3 + n_vis),
        interpret=interpret,
    )

    # ------------------------------------------------------------ backward
    def bwd_kernel(off_ref, scene_ref, gr_ref, gg_ref, gb_ref, *rest):
        vis_refs, dflat_ref = rest[:n_vis], rest[n_vis]
        i = pl.program_id(0)
        j = pl.program_id(1)
        row0 = off_ref[0, 0] + (i * bhb).astype(f32)
        col0 = off_ref[0, 1] + (j * bwb).astype(f32)

        vals = tuple(scene_ref[0, idx] for idx in range(S))
        vis_tiles = tuple(vr[:, :] for vr in vis_refs) if n_vis else None

        def f(*scalars):
            view = _scalar_view(treedef, meta, lambda idx: scalars[idx])
            return render_tile(view, cfg, row0, col0, bhb, bwb, vis_in=vis_tiles)

        _, vjp = jax.vjp(f, *vals)
        dvals = vjp((gr_ref[:, :], gg_ref[:, :], gb_ref[:, :]))

        first = (i == 0) & (j == 0)

        @pl.when(first)
        def _():
            for idx in range(S):
                dflat_ref[0, idx] = dvals[idx]

        @pl.when(jnp.logical_not(first))
        def _():
            for idx in range(S):
                dflat_ref[0, idx] = dflat_ref[0, idx] + dvals[idx]

    bwd_call = pl.pallas_call(
        bwd_kernel,
        grid=(Hp // bhb, Wp // bwb),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ]
        + [
            pl.BlockSpec((bhb, bwb), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        ] * (3 + n_vis),
        out_specs=pl.BlockSpec((1, S), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, S), f32),
        interpret=interpret,
    )

    # --------------------------------------------------------- custom_vjp
    @jax.custom_vjp
    def fused(flat, offsets):
        return tuple(fwd_call(offsets, flat.reshape(1, S)))

    def fused_fwd(flat, offsets):
        outs = fused(flat, offsets)
        return outs, (flat, offsets, outs[3:])

    def fused_bwd(res, cotangents):
        flat, offsets, vis = res
        gr, gg, gb = cotangents[0], cotangents[1], cotangents[2]
        df = bwd_call(offsets, flat.reshape(1, S), gr, gg, gb, *vis)
        return df.reshape(S), jnp.zeros_like(offsets)

    fused.defvjp(fused_fwd, fused_bwd)

    def apply(flat, offsets):
        outs = fused(flat, offsets)
        r, g, b = outs[0], outs[1], outs[2]
        return jnp.stack([r[:H, :W], g[:H, :W], b[:H, :W]], axis=-1)

    _CACHE[key] = apply
    return apply


def unflatten_scene(scene_like: Scene, flat):
    """Inverse of `flatten_scene`: flat (S,) vector -> pytree with the
    structure and leaf shapes of ``scene_like`` (used to deliver the fused
    step kernel's gradient scalars as a Scene-shaped cotangent)."""
    treedef, meta, S = scene_layout(scene_like)
    leaves = []
    for start, shape in meta:
        size = int(np.prod(shape)) if shape else 1
        leaf = jax.lax.dynamic_slice(flat, (start,), (size,))
        leaves.append(leaf.reshape(shape) if shape else leaf[0])
    return jax.tree_util.tree_unflatten(treedef, leaves)


_LG_CACHE: dict = {}


def _make_loss_grad(
    scene_like: Scene,
    cfg: RenderConfig,
    tiles: TileConfig,
    interpret: bool,
    out_h: int | None = None,
):
    """Build (and cache) the fused TRAINING-STEP kernel: one Pallas kernel
    computes the squared-error loss AND the scene-parameter gradients.

    Rationale (the round-2 step-time optimization): the optimizer loop's
    per-step work is `value_and_grad(loss(render(scene), target))`. With the
    separate kernel pair that costs a forward kernel (~60 us at 512^2) plus
    a backward kernel that REPLAYS the forward anyway (recompute-in-backward,
    ~106 us) — the image is materialized to HBM only to be subtracted from
    the target and fed back as a cotangent. This kernel fuses the chain: per
    tile it replays `render_tile` under `jax.vjp`, forms the residual
    against the target tile in VMEM, reduces the tile's squared-error sum,
    and pulls the cotangent straight back through the vjp — no image ever
    touches HBM, and the forward kernel disappears from the step.

    Contract: returns (sq_sum, dflat) where sq_sum = sum of squared
    residuals over the H x W x 3 image and dflat are d(w * sq_sum)/d(scene
    scalars) for the runtime weight w (SMEM scalar; mse passes 1/(H*W*3),
    sum-loss passes 1, shard bands pass the full-image normalization). One
    compile serves every loss scaling.

    Same subgradient semantics as `jax.grad` of the jnp path by
    construction: the vjp traces the shared `render_tile`
    (ops/pipeline.py), exactly like the separate backward kernel.
    """
    out_h = cfg.height if out_h is None else out_h
    if cfg.soft_tau > 0.0 or cfg.checker_tau > 0.0:
        raise NotImplementedError(
            "fused step kernel implements the hard reference semantics; "
            "soft_tau/checker_tau training steps run through fused_vec_soft"
        )
    if scene_object_textured(scene_like) and cfg.reflections:
        raise NotImplementedError(
            "object-textured training steps with mirror reflections run "
            "through jax.value_and_grad over the jnp renderers "
            "(loss_and_grad_fn routes) — see the render-kernel refusal"
        )
    key = (_scene_signature(scene_like), cfg, tiles, interpret, out_h)
    hit = _LG_CACHE.get(key)
    if hit is not None:
        return hit

    treedef, meta, S = scene_layout(scene_like)
    H, W = out_h, cfg.width
    bhb = min(tiles.bh_bwd, _round_up(H, 8))
    bwb = min(tiles.bw_bwd, _round_up(W, 128))
    Hp = _round_up(H, bhb)
    Wp = _round_up(W, bwb)
    f32 = jnp.float32

    def kernel(meta_ref, scene_ref, tr_ref, tg_ref, tb_ref, out_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        row0 = meta_ref[0, 0] + (i * bhb).astype(f32)
        col0 = meta_ref[0, 1] + (j * bwb).astype(f32)
        w = meta_ref[0, 2]
        vals = tuple(scene_ref[0, idx] for idx in range(S))

        def f(*scalars):
            view = _scalar_view(treedef, meta, lambda idx: scalars[idx])
            return render_tile(view, cfg, row0, col0, bhb, bwb)

        (r, g, b), vjp = jax.vjp(f, *vals)

        # Zero out canvas padding (tiles beyond the H x W image) exactly:
        # the 0/1 mask multiplies the residual, so padded pixels contribute
        # nothing to the loss or the pulled-back gradients.
        ri = jax.lax.broadcasted_iota(jnp.int32, (bhb, bwb), 0) + i * bhb
        ci = jax.lax.broadcasted_iota(jnp.int32, (bhb, bwb), 1) + j * bwb
        mask = ((ri < H) & (ci < W)).astype(f32)
        dr = (r - tr_ref[:, :]) * mask
        dg = (g - tg_ref[:, :]) * mask
        db = (b - tb_ref[:, :]) * mask

        sq = jnp.sum(dr * dr) + jnp.sum(dg * dg) + jnp.sum(db * db)
        two_w = 2.0 * w
        dvals = vjp((two_w * dr, two_w * dg, two_w * db))

        first = (i == 0) & (j == 0)

        @pl.when(first)
        def _():
            out_ref[0, 0] = sq
            for idx in range(S):
                out_ref[0, 1 + idx] = dvals[idx]

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[0, 0] = out_ref[0, 0] + sq
            for idx in range(S):
                out_ref[0, 1 + idx] = out_ref[0, 1 + idx] + dvals[idx]

    call = pl.pallas_call(
        kernel,
        grid=(Hp // bhb, Wp // bwb),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ]
        + [
            pl.BlockSpec((bhb, bwb), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        ] * 3,
        out_specs=pl.BlockSpec((1, 1 + S), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1 + S), f32),
        interpret=interpret,
    )

    def apply(flat, meta_row, tr, tg, tb):
        out = call(meta_row, flat.reshape(1, S), tr, tg, tb)
        return out[0, 0], out[0, 1:]

    _LG_CACHE[key] = apply
    return apply


def loss_grad_pallas(
    scene: Scene,
    cfg: RenderConfig,
    target,
    loss: str = "mse",
    row0=0.0,
    col0=0.0,
    tiles: TileConfig | None = None,
    interpret: bool = False,
    out_height: int | None = None,
    norm: float | None = None,
):
    """Fused training step: (loss, grads) of ``loss(render(scene), target)``
    in ONE kernel launch (no forward kernel, no image in HBM — see
    `_make_loss_grad`). Drop-in for `jax.value_and_grad` of the render loss.

    ``target``: (H, W, 3) image (H = out_height or cfg.height). ``norm``
    overrides the loss normalization (shard bands pass the full-image
    1/(H_full*W*3) while rendering only their band). Returns grads as a
    Scene-structured pytree.
    """
    H = out_height or cfg.height
    if tiles is None:
        tiles = TileConfig.for_shape(H, cfg.width, tile_object_count(scene, cfg))
    apply = _make_loss_grad(scene, cfg, tiles, interpret, out_h=out_height)

    bhb = min(tiles.bh_bwd, _round_up(H, 8))
    bwb = min(tiles.bw_bwd, _round_up(cfg.width, 128))
    Hp, Wp = _round_up(H, bhb), _round_up(cfg.width, bwb)

    if norm is None:
        norm = 1.0 / (cfg.height * cfg.width * 3) if loss == "mse" else 1.0
    target = jnp.asarray(target, jnp.float32)
    pads = ((0, Hp - H), (0, Wp - cfg.width))
    tr = jnp.pad(target[..., 0], pads)
    tg = jnp.pad(target[..., 1], pads)
    tb = jnp.pad(target[..., 2], pads)

    flat = flatten_scene(scene)
    meta_row = jnp.stack(
        [
            jnp.asarray(row0, jnp.float32),
            jnp.asarray(col0, jnp.float32),
            jnp.asarray(norm, jnp.float32),
        ]
    ).reshape(1, 3)
    sq, dflat = apply(flat, meta_row, tr, tg, tb)
    return norm * sq, unflatten_scene(scene, dflat)


def render_pallas(
    scene: Scene,
    cfg: RenderConfig,
    row0=0.0,
    col0=0.0,
    tiles: TileConfig | None = None,
    interpret: bool = False,
    out_height: int | None = None,
):
    """Render via the fused Pallas kernels. Differentiable w.r.t. ``scene``
    (gradients flow through `flatten_scene`'s concatenate back into the
    pytree). ``row0``/``col0`` offset the pixel grid — under shard_map each
    device passes its band offset (may be a traced value) and sets
    ``out_height`` to its band height.
    """
    if tiles is None:
        tiles = TileConfig.for_shape(out_height or cfg.height, cfg.width,
                                     tile_object_count(scene, cfg))
    apply = _make_fused(scene, cfg, tiles, interpret, out_h=out_height)
    flat = flatten_scene(scene)
    offsets = jnp.stack(
        [jnp.asarray(row0, jnp.float32), jnp.asarray(col0, jnp.float32)]
    ).reshape(1, 2)
    return apply(flat, offsets)
