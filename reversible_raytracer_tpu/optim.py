"""Inverse rendering: Adam + bound projection over the scene pytree.

Reference counterpart: `grad_descent.py` — plain GD/momentum over VariableSet
values with bound clipping (SURVEY.md C12, §3.3). The BASELINE north star
specifies Adam (BASELINE.json:5). TPU-native formulation:

- one jitted ``step``: value_and_grad of the render loss, gradient masking
  (the ParamSpec trainability registry), optax.adam update, box projection;
- the whole optimization loop can also run *on device* via ``lax.scan``
  (``optimize_scan``) so a convergence benchmark pays one dispatch, not one
  per iteration — this is the "wall-clock-to-converge" fast path;
- under a device mesh, the same step runs inside shard_map with per-tile
  losses and psum'd gradients (parallel/shard.py) — this module is agnostic.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import optax

from .models.scene import ParamSpec, Scene, scene_textured
from .ops.pipeline import RenderConfig
from .ops.render import mse_loss, render_jnp, sum_squared_loss


@dataclass(frozen=True)
class OptConfig:
    iters: int = 200
    lr: float = 2e-2
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    loss: str = "mse"  # "mse" | "sum" (reference-faithful sum of squares)
    # LR schedule. "cosine" (decay to 0 over `iters`) is the default: plain
    # constant-lr Adam reliably *destabilizes after converging* on this
    # problem class — near the optimum gradients shrink, the second moment
    # decays, effective steps grow, and the optimizer jumps out of the basin
    # into a sphere-inflation attractor (observed: loss 1.3e-3 at iter 28 ->
    # 1.1e-2 at iter 400 on the 4-sphere 512^2 config). Decaying to zero
    # pins the endgame.
    schedule: str = "cosine"  # "cosine" | "constant"
    # Optimizer family. "adam" converges fastest but its per-parameter
    # normalization turns near-flat valleys (the sphere depth/scale
    # projective ambiguity) into full-speed random walks — observed runaway
    # on the 4-sphere scene: center-z marches 0.3 -> 2.3 while radius
    # inflates to compensate. "sgd" (optionally with momentum) follows true
    # gradient magnitudes — in a flat valley it barely moves — matching the
    # reference's plain-GD behavior (its grad_descent.py); use it for stiff
    # joint geometry problems.
    optimizer: str = "adam"  # "adam" | "sgd"
    momentum: float = 0.0  # sgd only
    # Per-parameter-group LR multipliers, applied AFTER Adam normalization:
    # (("spheres.radius", 0.3), ("camera", 0.1), ...). Adam equalizes step
    # sizes across parameters regardless of their true sensitivity; scene
    # geometry / pose / materials have wildly different curvatures, and
    # these rules restore the distinction (first matching substring wins).
    lr_scales: tuple = ()

    def learning_rate(self):
        if self.schedule == "cosine":
            return optax.cosine_decay_schedule(self.lr, max(self.iters, 1))
        if self.schedule == "constant":
            return self.lr
        raise ValueError(f"unknown schedule {self.schedule!r}")


def loss_fn_for(name: str):
    return {"mse": mse_loss, "sum": sum_squared_loss}[name]


def _path_name(path) -> str:
    return ".".join(getattr(k, "name", getattr(k, "key", str(k))) for k in path)


def scale_by_path(rules):
    """optax transform: multiply each leaf's update by the factor of the
    first rule matching the leaf's dotted path (segment-aware — same
    convention as ParamSpec.train, so "color" never matches "color2")."""
    from .models.scene import path_matches

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        def scale(path, u):
            name = _path_name(path)
            for needle, mult in rules:
                if path_matches(name, needle):
                    return u * mult
            return u

        return jax.tree_util.tree_map_with_path(scale, updates), state

    return optax.GradientTransformation(init, update)


def make_optimizer(ocfg: OptConfig):
    if ocfg.optimizer == "sgd":
        base = [optax.trace(decay=ocfg.momentum)] if ocfg.momentum else []
    elif ocfg.optimizer == "adam":
        base = [optax.scale_by_adam(b1=ocfg.b1, b2=ocfg.b2, eps=ocfg.eps)]
    else:
        raise ValueError(f"unknown optimizer {ocfg.optimizer!r}")
    parts = base
    if ocfg.lr_scales:
        parts = parts + [scale_by_path(tuple(ocfg.lr_scales))]
    parts = parts + [optax.scale_by_learning_rate(ocfg.learning_rate())]
    return optax.chain(*parts)


def mask_grads(grads: Scene, spec: ParamSpec) -> Scene:
    """Zero gradients of non-trainable leaves (the functional VariableSet)."""
    return jax.tree_util.tree_map(
        lambda g, t: jnp.where(t, g, jnp.zeros_like(g)), grads, spec.trainable
    )


def project_bounds(scene: Scene, spec: ParamSpec) -> Scene:
    """Box-projection after the update (reference bound-clipping semantics)."""
    return jax.tree_util.tree_map(
        lambda x, t, lo, hi: jnp.where(t, jnp.clip(x, lo, hi), x),
        scene, spec.trainable, spec.lower, spec.upper,
    )


def make_flat_update(template: Scene, spec: ParamSpec, ocfg: OptConfig):
    """Optimizer update on ONE flat f32 vector (round 4, VERDICT r3 #4).

    The per-leaf update (mask -> adam -> lr-scale -> apply -> project) emits
    a separate tiny XLA fusion per scene leaf: ~34 leaves x a few fusions
    each ~ 0.4 ms/step on v5e — 3x the 0.128 ms fused training kernel it
    wraps (measured: optimize_scan step 0.55 ms vs bare vag 0.128 ms).
    Flattening the whole scene with `ravel_pytree` collapses the update to
    a handful of vector ops on one ~O(10^2..10^4)-element array.

    Semantics are element-for-element identical to the per-leaf chain
    (masking, Adam/SGD, `lr_scales` path rules, cosine schedule, box
    projection are all elementwise; the ParamSpec registry is pre-flattened
    into aligned mask/lo/hi/scale vectors). Enforced by
    tests/test_optimize.py::test_flat_update_matches_per_leaf_step.

    Returns ``(init, apply)`` with ``init(scene) -> opt_state`` and
    ``apply(scene, opt_state, grads) -> (scene, opt_state, grad_norm)``.

    Only TRAINABLE leaves ride the flat vector; untrainable leaves pass
    through ``apply`` verbatim. This is a loop-invariance requirement,
    not a micro-optimization: raveling the whole scene makes every leaf
    (camera, lights, materials …) a slice of the carried update vector,
    so inside `lax.scan` XLA can no longer treat the untouched leaves as
    loop constants and fold them into the render — measured on XLA:CPU
    as +8 ms/step on the 256² config-2 scan (13.8 → 21.7 ms; the flat
    update ALONE is 1.3 us/step, the loss was all in the de-optimized
    render). Numerics are unchanged: untrainable elements' updates were
    exactly zero under the mask already.
    """
    import numpy as np

    from .models.scene import path_matches

    leaves, treedef = jax.tree_util.tree_flatten(template)
    tflags = [bool(t) for t in jax.tree_util.tree_leaves(spec.trainable)]
    assert len(tflags) == len(leaves)
    assert any(tflags), "no trainable leaves"
    shapes = [jnp.shape(l) for l in leaves]
    sizes = [int(np.prod(s)) for s in shapes]

    def ravel_t(tree):
        ls = jax.tree_util.tree_flatten(tree)[0]
        return jnp.concatenate([
            jnp.ravel(l).astype(jnp.float32)
            for l, f in zip(ls, tflags) if f
        ])

    def unravel_t(flat, scene):
        ls = jax.tree_util.tree_flatten(scene)[0]
        out, off = [], 0
        for l, f, shp, n in zip(ls, tflags, shapes, sizes):
            if f:
                out.append(jnp.reshape(flat[off:off + n], shp))
                off += n
            else:
                out.append(l)
        return jax.tree_util.tree_unflatten(treedef, out)

    def expand(fills):
        # Per-leaf scalar registry entry -> trainable-leaf-shape vector.
        return ravel_t(jax.tree_util.tree_map(
            lambda leaf, v: jnp.full(jnp.shape(leaf), v, jnp.float32),
            template, fills,
        ))

    mask = expand(spec.trainable)  # all-ones while trainability is
    lo = expand(spec.lower)        # per-leaf; kept for per-element specs
    hi = expand(spec.upper)

    def scale_leaf(path, leaf):
        name = _path_name(path)
        for needle, mult in ocfg.lr_scales:
            if path_matches(name, needle):
                return jnp.full(jnp.shape(leaf), mult, jnp.float32)
        return jnp.full(jnp.shape(leaf), 1.0, jnp.float32)

    scale = ravel_t(
        jax.tree_util.tree_map_with_path(scale_leaf, template)
    )

    if ocfg.optimizer == "sgd":
        base = [optax.trace(decay=ocfg.momentum)] if ocfg.momentum else []
    elif ocfg.optimizer == "adam":
        base = [optax.scale_by_adam(b1=ocfg.b1, b2=ocfg.b2, eps=ocfg.eps)]
    else:
        raise ValueError(f"unknown optimizer {ocfg.optimizer!r}")

    # lr_scales multiply AFTER the base normalization, BEFORE the lr — the
    # exact chain position of scale_by_path in make_optimizer (float
    # multiplies don't commute in rounding; same order keeps the two paths
    # bit-compatible).
    def _scale_by_vector():
        return optax.GradientTransformation(
            lambda params: optax.EmptyState(),
            lambda updates, st, params=None: (updates * scale, st),
        )

    parts = base
    if ocfg.lr_scales:
        parts = parts + [_scale_by_vector()]
    tx = optax.chain(*parts, optax.scale_by_learning_rate(ocfg.learning_rate()))

    def init(scene: Scene):
        return tx.init(ravel_t(scene))

    def apply(scene: Scene, opt_state, grads: Scene):
        g = ravel_t(grads) * mask
        gnorm = jnp.sqrt(jnp.sum(g * g))
        u, new_state = tx.update(g, opt_state)
        flat = ravel_t(scene) + u
        flat = jnp.where(mask > 0, jnp.clip(flat, lo, hi), flat)
        return unravel_t(flat, scene), new_state, gnorm

    return init, apply


def make_step(
    rcfg: RenderConfig,
    spec: ParamSpec,
    ocfg: OptConfig,
    render_fn=None,
    vag_fn=None,
):
    """Build the jitted single optimization step.

    ``render_fn(scene) -> (H, W, 3)`` defaults to the pure-jnp renderer;
    pass the Pallas renderer or a shard_map-wrapped renderer for TPU/mesh
    execution. ``vag_fn(scene, target) -> (loss, grads)`` overrides the
    whole value-and-grad (the fused single-kernel training step,
    `ops.render.loss_and_grad_fn`); when given, ``render_fn`` and the
    configured loss are unused. Returns ``step(scene, opt_state, target) ->
    (scene, opt_state, loss, grad_norm)``.
    """
    if render_fn is None:
        render_fn = lambda s: render_jnp(s, rcfg)
    loss_of = loss_fn_for(ocfg.loss)
    tx = make_optimizer(ocfg)

    def loss(scene: Scene, target):
        return loss_of(render_fn(scene), target)

    @jax.jit
    def step(scene: Scene, opt_state, target):
        if vag_fn is not None:
            l, grads = vag_fn(scene, target)
        else:
            l, grads = jax.value_and_grad(loss)(scene, target)
        grads = mask_grads(grads, spec)
        gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, scene)
        scene = optax.apply_updates(scene, updates)
        scene = project_bounds(scene, spec)
        return scene, opt_state, l, gnorm

    return step, tx


def optimize(
    scene: Scene,
    target,
    spec: ParamSpec,
    rcfg: RenderConfig,
    ocfg: OptConfig,
    render_fn=None,
    logger=None,
    log_every: int = 10,
    frame_every: int = 0,
    frame_dir: str | None = None,
    checkpoint_every: int = 0,
    checkpoint_path: str | None = None,
    truth: Scene | None = None,
    resume: str | None = None,
    vag_fn=None,
):
    """Host-driven optimization loop with observability (SURVEY.md §5.5).

    ``vag_fn``: optional fused value-and-grad override (see make_step).
    Returns (final_scene, history list of dicts).
    """
    from .utils import checkpoint as ckpt
    from .utils.imageio import save_png

    step, tx = make_step(rcfg, spec, ocfg, render_fn, vag_fn=vag_fn)
    opt_state = tx.init(scene)
    start_iter = 0
    if resume is not None:
        scene, opt_state, start_iter = ckpt.load(resume, scene, opt_state)

    target = jnp.asarray(target, jnp.float32)
    history = []
    for it in range(start_iter, ocfg.iters):
        scene, opt_state, l, gnorm = step(scene, opt_state, target)
        if log_every and (it % log_every == 0 or it == ocfg.iters - 1):
            rec = {"step": it, "loss": float(l), "grad_norm": float(gnorm)}
            if truth is not None:
                rec["param_err"] = float(param_error(scene, truth, spec))
            history.append(rec)
            if logger is not None:
                logger.log(**rec)
        if frame_every and frame_dir and it % frame_every == 0:
            img = render_jnp(scene, rcfg) if render_fn is None else render_fn(scene)
            save_png(f"{frame_dir}/frame_{it:05d}.png", img)
        if checkpoint_every and checkpoint_path and it and it % checkpoint_every == 0:
            # it+1: iteration `it` has already been applied, so resume must
            # restart at the NEXT iteration (saving `it` double-applied it).
            ckpt.save(checkpoint_path, scene, opt_state, it + 1)
    if checkpoint_path:
        ckpt.save(checkpoint_path, scene, opt_state, ocfg.iters)
    return scene, history


_SCAN_CACHE: dict = {}
_RESEED_CACHE: dict = {}


def optimize_scan(
    scene: Scene,
    target,
    spec: ParamSpec,
    rcfg: RenderConfig,
    ocfg: OptConfig,
    render_fn=None,
    cache_key=None,
    max_chunk: "int | None" = None,
    vag_fn=None,
    chunk_callback=None,
):
    """Whole optimization loop on-device via lax.scan: one dispatch total
    (or ``ceil(iters / max_chunk)`` dispatches when ``max_chunk`` is set).

    This is the TPU-native convergence fast path (the reference ran a Python
    loop crossing the host boundary every iteration, SURVEY.md §3.3). Returns
    (final_scene, losses[iters]).

    Pass a hashable ``cache_key`` identifying ``render_fn`` (e.g. "pallas")
    to reuse the compiled runner across calls — otherwise each call builds a
    fresh jit closure and RECOMPILES the whole scan (~seconds), which
    silently dominates repeated-call timings.

    ``vag_fn(scene, target) -> (loss, grads)`` overrides the per-step value
    -and-grad with the fused single-kernel training step (see make_step);
    give it its own ``cache_key`` (e.g. "pallas-step").

    ``max_chunk``: cap on scan length per device dispatch. The axon PJRT
    tunnel kills the worker on very long single executions (observed: a
    300-iteration 1024^2 scan ~75 s of device time dies with "TPU worker
    crashed"; <=100-iteration dispatches are reliable). Optimizer state
    carries across chunks, so results are identical to one big scan.

    ``chunk_callback(scene, it)``: host callback after each chunk with the
    running iteration count — observability (frame dumps for convergence
    GIFs) at chunk granularity without leaving the on-device scan fast
    path inside chunks.
    """
    if render_fn is None:
        render_fn = lambda s: render_jnp(s, rcfg)
        cache_key = cache_key or "jnp-default"
    loss_of = loss_fn_for(ocfg.loss)
    target = jnp.asarray(target, jnp.float32)
    # Flat-vector update (make_flat_update): the per-leaf optax chain costs
    # more than the fused render kernel per step on TPU (one tiny XLA
    # fusion per scene leaf); the flat form is a handful of vector ops.
    finit, fapply = make_flat_update(scene, spec, ocfg)

    def build(length):
        @jax.jit
        def run(scene: Scene, opt_state, target):
            def body(carry, _):
                scene, opt_state = carry
                if vag_fn is not None:
                    # Fused single-kernel value-and-grad (ops.render.
                    # loss_and_grad_fn): loss + scene grads in one Pallas
                    # launch — no forward kernel, no image in HBM.
                    l, grads = vag_fn(scene, target)
                else:
                    l, grads = jax.value_and_grad(
                        lambda s: loss_of(render_fn(s), target)
                    )(scene)
                scene, opt_state, _ = fapply(scene, opt_state, grads)
                return (scene, opt_state), l

            (scene, opt_state), losses = jax.lax.scan(
                body, (scene, opt_state), None, length=length
            )
            return scene, opt_state, losses

        return run

    def runner_for(length):
        if cache_key is None:
            return build(length)
        leaves, treedef = jax.tree_util.tree_flatten(scene)
        spec_digest = (
            tuple(bool(t) for t in jax.tree_util.tree_leaves(spec.trainable)),
            tuple(float(x) for x in jax.tree_util.tree_leaves(spec.lower)),
            tuple(float(x) for x in jax.tree_util.tree_leaves(spec.upper)),
        )
        sig = (treedef, tuple(jnp.shape(l) for l in leaves), rcfg, ocfg,
               spec_digest, cache_key, length)
        run = _SCAN_CACHE.get(sig)
        if run is None:
            run = _SCAN_CACHE[sig] = build(length)
        return run

    if max_chunk is None or ocfg.iters <= max_chunk:
        lengths = [ocfg.iters]
    else:
        n_full, rem = divmod(ocfg.iters, max_chunk)
        lengths = [max_chunk] * n_full + ([rem] if rem else [])

    opt_state = finit(scene)
    all_losses = []
    it = 0
    for length in lengths:
        scene, opt_state, losses = runner_for(length)(scene, opt_state, target)
        all_losses.append(losses)
        it += length
        if chunk_callback is not None:
            chunk_callback(scene, it)
    return scene, (all_losses[0] if len(all_losses) == 1 else jnp.concatenate(all_losses))


def param_error(scene: Scene, truth: Scene, spec: ParamSpec):
    """RMS error over trainable parameters vs the ground-truth scene —
    the convergence metric for the benchmark configs (truth is known there)."""
    sq = jax.tree_util.tree_map(
        lambda a, b, t: jnp.sum(jnp.where(t, (a - b) ** 2, 0.0)), scene, truth, spec.trainable
    )
    n = jax.tree_util.tree_map(
        lambda a, t: jnp.where(t, jnp.asarray(a.size, jnp.float32), 0.0), scene, spec.trainable
    )
    total = sum(jax.tree_util.tree_leaves(sq))
    count = sum(jax.tree_util.tree_leaves(n))
    return jnp.sqrt(total / jnp.maximum(count, 1.0))


def swap_spheres(scene: Scene, i: int, j: int, geometry_only: bool = True) -> Scene:
    """Swap parameter rows of spheres ``i`` and ``j``.

    ``geometry_only=True`` (the useful form) swaps ONLY the center rows:
    a topology stall is an identity error — the sphere carrying A's
    appearance descended into B's spatial basin — and center-swapping is
    its exact inverse, re-pairing appearances with basins. Swapping FULL
    rows (``geometry_only=False``) is a NO-OP by permutation symmetry:
    the re-indexed scene renders identically, so descent from it lands in
    the same stall (measured: all 8 full-swap restarts reproduced the
    stall loss to 10 digits — docs/OPTIMIZATION_NOTES.md
    'Structure-aware restarts')."""
    import dataclasses

    n = scene.spheres.count

    def swap_leaf(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] == n:
            xi, xj = x[i], x[j]
            return x.at[i].set(xj).at[j].set(xi)
        return x

    if geometry_only:
        return dataclasses.replace(
            scene,
            spheres=dataclasses.replace(
                scene.spheres, center=swap_leaf(scene.spheres.center)
            ),
        )
    return dataclasses.replace(
        scene, spheres=jax.tree_util.tree_map(swap_leaf, scene.spheres)
    )


def rejitter_one_sphere(start: Scene, spec: ParamSpec, idx: int,
                        scale: float, seed: int) -> Scene:
    """Re-perturb ONLY sphere ``idx``'s trainable rows (same relative-
    noise convention as configs.perturb), leaving every other parameter at
    ``start``. The i.i.d. whole-scene jitter must trade off dislodging the
    stuck sphere against wrecking the converged ones; the per-sphere
    proposal takes arbitrarily large kicks at one suspect for free."""
    import dataclasses

    from .models.configs import perturb

    n = start.spheres.count
    jittered = perturb(start, spec, scale=scale, seed=seed)

    def merge(a, b):
        if getattr(a, "ndim", 0) >= 1 and a.shape[0] == n:
            return a.at[idx].set(b[idx])
        return a

    return dataclasses.replace(
        start,
        spheres=jax.tree_util.tree_map(merge, start.spheres, jittered.spheres),
    )


def residual_reseed(start: Scene, spec: ParamSpec, target, rcfg,
                    rank: int, seed: int, jitter: float) -> Scene:
    """Residual-guided restart proposal (VERDICT r3 #7's third family):
    re-seed one SUSPECT sphere's center at the brightest UNEXPLAINED
    image region, then half-jitter everything (the swap_jitter lesson:
    an identity repair alone may leave the start outside the repaired
    basin).

    - Suspect ranking: per-sphere visible-footprint attribution — nearest
      sphere per pixel (sphere-only trace via `pipeline.intersect_sphere`
      over `camera_rays`); a sphere's suspicion is the mean |luma
      residual| over the pixels it wins. Spheres with NO footprint
      (driven behind another or off-frame by the stall) rank most
      suspect. ``rank`` cycles through the suspect order.
    - Target region: per cycle, the next non-max-suppressed peak of the
      POSITIVE residual (target brighter than render = mass we fail to
      explain); the suspect's center moves onto that pixel's camera ray
      at its CURRENT eye distance (depth is the raytracer's blind axis —
      keep it, fix the image-plane position).
    All device work runs under ONE cached jit per (rcfg, scene structure)
    — eager jnp on the axon tunnel pays a ~30 ms roundtrip PER OP, which
    would make each proposal minutes-slow at 512²; the host keeps only
    the tiny argsort/NMS logic.
    """
    import dataclasses

    import numpy as np

    from .models.configs import perturb
    from .ops.pipeline import BIG, camera_rays, intersect_sphere

    n = start.spheres.count
    key = ("resid", rcfg, n, jax.tree_util.tree_structure(start))
    attrib = _RESEED_CACHE.get(key)
    if attrib is None:
        from .ops.pipeline_vec import render_jnp_vec

        hard = dataclasses.replace(rcfg, soft_tau=0.0, checker_tau=0.0)
        H, W = rcfg.height, rcfg.width

        @jax.jit
        def attrib(scene, tgt):
            img = render_jnp_vec(scene, hard)
            resid = tgt.mean(-1) - img.mean(-1)  # signed luma
            ii, jj = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                                  jnp.arange(W, dtype=jnp.float32),
                                  indexing="ij")
            o, d = camera_rays(scene.camera, ii, jj, H, W, rcfg.projection)
            ts = jnp.stack([
                intersect_sphere(
                    o, d,
                    (scene.spheres.center[k, 0], scene.spheres.center[k, 1],
                     scene.spheres.center[k, 2]),
                    scene.spheres.radius[k])
                for k in range(n)
            ])
            kbest, tmin = ts.argmin(0), ts.min(0)
            vis = tmin < BIG * 0.5
            suspicion = jnp.stack([
                jnp.where(
                    (vis & (kbest == k)).any(),
                    jnp.sum(jnp.abs(resid) * (vis & (kbest == k)))
                    / jnp.maximum(jnp.sum(vis & (kbest == k)), 1),
                    jnp.inf,  # no-footprint spheres sort first
                )
                for k in range(n)
            ])
            return resid, suspicion

        @jax.jit
        def unproject(scene, py, px, t_keep):
            o1, d1 = camera_rays(scene.camera, py[None, None],
                                 px[None, None], H, W, rcfg.projection)
            return jnp.stack([
                jnp.ravel(oc + t_keep * dc)[0] for oc, dc in zip(o1, d1)
            ])

        _RESEED_CACHE[key] = (attrib, unproject)

    attrib, unproject = _RESEED_CACHE[key]
    resid, suspicion = jax.device_get(
        attrib(start, jnp.asarray(target, jnp.float32))
    )
    H, W = resid.shape
    order = np.argsort(-suspicion, kind="stable")  # inf (hidden) first
    idx = int(order[rank % n])
    cycle = rank // n
    centers = np.asarray(start.spheres.center)

    # cycle-th positive-residual peak under non-max suppression, so
    # successive cycles try distinct unexplained regions.
    pos = np.clip(resid, 0.0, None)
    r_sup2 = float(max(2, H // 10)) ** 2
    peaks = []
    for p in np.argsort(pos.ravel(), kind="stable")[::-1]:
        py, px = divmod(int(p), W)
        if all((py - a) ** 2 + (px - b) ** 2 > r_sup2 for a, b in peaks):
            peaks.append((py, px))
            if len(peaks) > cycle:
                break
    py, px = peaks[min(cycle, len(peaks) - 1)]

    eye = np.asarray(start.camera.eye)
    if rcfg.projection == "orthographic":
        # Parallel rays have their origins OFFSET on the image plane, so
        # eye distance along the ray is not |center - eye|; the depth to
        # preserve is the along-fwd component (ADVICE r4). fwd matches
        # pipeline.camera_basis: normalize(look_at - eye).
        fwd = np.asarray(start.camera.look_at) - eye
        fwd = fwd / np.linalg.norm(fwd)
        t_keep = float(np.dot(centers[idx] - eye, fwd))
    else:
        t_keep = float(np.linalg.norm(centers[idx] - eye))
    new_c = unproject(start, jnp.float32(py), jnp.float32(px),
                      jnp.float32(t_keep))
    out = dataclasses.replace(
        start,
        spheres=dataclasses.replace(
            start.spheres, center=start.spheres.center.at[idx].set(new_c)
        ),
    )
    return perturb(out, spec, scale=0.5 * jitter, seed=seed)


def propose_restart(start: Scene, spec: ParamSpec, r: int, jitter: float,
                    seed: int, proposal: str = "jitter",
                    target=None, rcfg=None) -> Scene:
    """Starting point for restart ``r`` >= 1 (restart 0 is always
    ``start`` verbatim) under the given proposal family:

    - ``"jitter"``     — i.i.d. relative re-jitter of all trainable leaves
      (the round-3 behavior);
    - ``"per_sphere"`` — re-jitter ONLY sphere (r-1) % N, cycling through
      the spheres (and growing the kick scale each full cycle);
    - ``"swap"``       — swap sphere pair (r-1) % C(N,2) in a fixed
      enumeration (no randomness: the proposal set IS the hypothesis set);
    - ``"swap_jitter"``— the same center-swap enumeration, then a HALF-
      jitter of all trainable leaves (composite moves: an identity repair
      alone may leave the start outside the repaired basin);
    - ``"mixed"``      — alternate swap (odd r) and per_sphere (even r);
    - ``"resid"``      — residual-guided: re-seed the rank-(r-1) suspect
      sphere at the brightest unexplained image region + half-jitter
      (`residual_reseed`; needs ``target`` and ``rcfg``).
    """
    from itertools import combinations

    from .models.configs import perturb

    if r == 0:
        return start
    if proposal == "jitter":
        return perturb(start, spec, scale=jitter, seed=seed + r)
    n = start.spheres.count
    if n == 0 and proposal != "jitter":
        # Every sphere-structural family (swap/per_sphere/mixed/resid)
        # indexes into the sphere table; a rect-only scene reached these
        # via the CLI as an opaque ZeroDivisionError (ADVICE r4). Fall
        # back to the jitter family — still a valid restart proposal.
        return perturb(start, spec, scale=jitter, seed=seed + r)
    if proposal == "resid":
        if target is None or rcfg is None:
            raise ValueError("proposal='resid' needs target and rcfg")
        return residual_reseed(start, spec, target, rcfg, r - 1,
                               seed + r, jitter)
    if (proposal in ("swap", "swap_jitter")
            or (proposal == "mixed" and r % 2 == 1)):
        k = (r - 1) if proposal != "mixed" else (r - 1) // 2
        pairs = list(combinations(range(n), 2))
        if not pairs:  # n == 1: no pair exists — re-kick the one sphere
            return rejitter_one_sphere(start, spec, 0, jitter, seed + r)
        i, j = pairs[k % len(pairs)]
        out = swap_spheres(start, i, j)
        if proposal == "swap_jitter":
            out = perturb(out, spec, scale=0.5 * jitter, seed=seed + r)
        return out
    if proposal == "per_sphere" or proposal == "mixed":
        k = (r - 1) if proposal == "per_sphere" else (r - 2) // 2
        idx = k % n
        scale = jitter * (1.0 + k // n)  # grow the kick each full cycle
        return rejitter_one_sphere(start, spec, idx, scale, seed + r)
    raise ValueError(f"unknown restart proposal {proposal!r}")


def optimize_multistart(
    start: Scene,
    target,
    spec: ParamSpec,
    rcfg: RenderConfig,
    ocfg: OptConfig,
    restarts: int = 4,
    jitter: float = 0.15,
    seed: int = 0,
    optimize_fn=None,
    proposal: str = "jitter",
    chain: bool = False,
    **anneal_kw,
):
    """Seeded random-restart wrapper: run the inner optimizer from
    ``restarts`` starting points and keep the best FINAL HARD loss
    (docs/OPTIMIZATION_NOTES.md "Narrow basins": silhouette displacements
    past ~20% of radius put the start outside every first-order basin —
    no optimizer escapes, but a different start CAN land inside).

    Restart 0 runs from ``start`` verbatim; restart r > 0 re-perturbs the
    trainable leaves of ``start`` by ``jitter`` (relative scale, the same
    convention as configs.perturb) with seed ``seed + r``. Candidates are
    ranked on the TRUE objective — ``ocfg.loss`` of the HARD render
    (soft_tau = checker_tau = 0) against ``target`` — never on any
    relaxed stage loss, so a soft-stage artifact can't win.

    ``optimize_fn(scene) -> (final_scene, losses)`` overrides the inner
    optimizer; default is `optimize_annealed` with ``**anneal_kw``.

    ``proposal``: how restart starting points are generated — see
    `propose_restart` (round 4: "swap" / "per_sphere" / "mixed" attack
    topology stalls with structure-aware moves that i.i.d. jitter cannot
    reach; measured on the documented config-2 stall set in
    docs/OPTIMIZATION_NOTES.md).

    Returns (best_scene, best_loss, per_restart_final_losses). Wall-clock
    is ``restarts`` x the inner optimizer (compiles are shared: every
    restart reuses the same cached scan runners).
    """
    import dataclasses

    from .ops.pipeline_vec import render_jnp_vec

    if optimize_fn is None:
        def optimize_fn(s):
            return optimize_annealed(
                s, target, spec, rcfg, ocfg, **anneal_kw
            )

    hard_cfg = dataclasses.replace(rcfg, soft_tau=0.0, checker_tau=0.0)
    lossf = loss_fn_for(ocfg.loss)
    eval_loss = jax.jit(
        lambda s: lossf(render_jnp_vec(s, hard_cfg), jnp.asarray(target))
    )

    best_scene, best_loss, finals = None, None, []
    stale = 0  # chained mode: rounds since the last improvement
    for r in range(restarts):
        # chain=True: propose from the best CONVERGED scene so far instead
        # of the original start — sequential repair for stalls with more
        # than one displaced sphere (one proposal can only fix one; the
        # next proposal should see the previous fix, not undo it). Most
        # useful with proposal="resid", whose suspect ranking re-derives
        # from the chained scene's own residual each round; the proposal
        # index advances only while stuck (same base + same index would
        # re-propose the identical restart), and resets on improvement so
        # each new base is attacked at its own worst suspect first.
        if chain and best_scene is not None:
            # seed + r keeps the half-jitter fresh across chained rounds
            # (ri resets on improvement, so a fixed seed would repeat it).
            base, ri, sd = best_scene, stale + 1, seed + r
        else:
            base, ri, sd = start, r, seed
        s0 = propose_restart(base, spec, ri, jitter, sd, proposal,
                             target=target, rcfg=rcfg)
        final, _ = optimize_fn(s0)
        l = float(eval_loss(final))
        finals.append(l)
        if best_loss is None or l < best_loss:
            best_scene, best_loss = final, l
            stale = 0
        else:
            stale += 1
    return best_scene, best_loss, finals


def anneal_stage_impl(scene: Scene, tau: float) -> str:
    """Which renderer an `optimize_annealed` stage uses for this scene and
    tau on the CURRENT backend (exposed so tests and callers share the
    decision). Soft (tau > 0) stages run in the soft vec kernels whenever
    `fused_vec_soft.soft_kernel_ok` allows: env maps ride their SMEM
    globals plan (K <= 24 for the soft family — measured scoped-vmem
    boundary, see soft_kernel_ok) and object texel grids ride per-row
    SMEM tails (round 4 — same probed vec_smem_ok budget as the hard
    family); anything past those budgets runs on render_jnp_vec. The
    hard tau = 0 polish runs on fused_vec under the same budgets."""
    if jax.default_backend() != "tpu":
        return "jnp_vec"
    textured = scene_textured(scene)
    if tau > 0.0:
        from .ops.kernels.fused_vec_soft import soft_kernel_ok

        return "pallas_vec_soft" if soft_kernel_ok(scene) else "jnp_vec"
    if textured:
        from .ops.kernels.fused_vec import vec_smem_ok
        from .ops.render import env_size

        if env_size(scene) > 32 or not vec_smem_ok(scene):
            return "jnp_vec"
    return "pallas_vec"


def anneal_stage_uses_step(impl_name: str, spp: int) -> bool:
    """Whether an `optimize_annealed` stage runs the FUSED training-step
    kernel (loss+grads in one launch) vs jax.value_and_grad over the
    stage's render (exposed so tests pin the decision — VERDICT r4 #7).

    The hard vec step fuses spp=4 in-kernel (round 3: the mse residual is
    of the post-clip subsample AVERAGE, which cannot decompose into 4
    launches). The SOFT step kernel is spp=1 only, so spp=4 soft stages
    fall through to value_and_grad over the 4-launch wrapper-averaged
    soft render — semantically exact (XLA forms the average and the
    residual outside the kernels; AD runs each launch's fwd+bwd kernel
    pair). Measured cost of that fall-through on v5e (64-obj 512^2,
    scripts/soft_spp4_probe.py): see the NotImplementedError note at
    fused_vec_soft._make_fused_vec_soft."""
    return (
        (impl_name == "pallas_vec" and spp in (1, 4))
        or (impl_name == "pallas_vec_soft" and spp == 1)
    )


def optimize_annealed(
    scene: Scene,
    target,
    spec: ParamSpec,
    rcfg: RenderConfig,
    ocfg: OptConfig,
    taus=(0.08, 0.03, 0.01, 0.0),
    target_scene: "Scene | None" = None,
    soft_size: "int | None" = None,
    max_chunk: "int | None" = 100,
    hard_ocfg: "OptConfig | None" = "auto",
    checker_ratio: float = 0.0,
    chunk_callback=None,
):
    """Soft-visibility annealing for joint geometry inversion (the config-5
    capability; docs/OPTIMIZATION_NOTES.md "Open" item, closed in round 2).

    Runs ``ocfg.iters`` Adam steps per tau stage on the jnp_vec renderer
    with RenderConfig.soft_tau = tau, warm-starting each stage from the
    previous one. Soft stages see silhouette AND shadow-silhouette
    gradients that hard raytracer autodiff lacks (the shadow term is what
    pins sphere depth — see OPTIMIZATION_NOTES); the final tau=0.0 stage
    is the reference-faithful hard objective, so the result is an optimum
    of the TRUE problem.

    ``target_scene``: when the ground-truth scene is available (the
    reference's own demo workflow renders its targets from a known scene,
    as do all five driver configs), pass it — each soft stage then compares
    against the truth rendered AT ITS OWN tau, which removes the soft-vs-
    hard edge bias entirely (measured: 16-sphere joint inversion converges
    0.027 -> 0.007 RMS with matched targets vs diverging against the hard
    image). Without it, soft stages run against the hard ``target`` image
    (image-only inverse rendering): unbiased only as tau -> 0, so prefer
    small taus and expect weaker basins.

    ``soft_size``: run the soft (tau > 0) stages at this resolution instead
    of the full one (coarse-to-fine; requires ``target_scene``). The soft
    renderer's reverse-mode intermediates are O(n_objects * H * W) several
    times over — 64 spheres at 1024^2 crashed the v5e worker (HBM), while
    soft stages at 512^2 + the hard polish at 1024^2 fit comfortably and
    silhouette signal is resolution-robust.

    ``chunk_callback(scene, global_it)``: host observability per scan
    chunk across all stages (frame dumps — see optimize_scan).

    ``checker_ratio``: when > 0, each stage also relaxes the CHECKER to a
    smooth blend with RenderConfig.checker_tau = checker_ratio * tau
    (config-4 capability: camera pose against checkered materials — the
    hard floor/mod checker gives positions zero gradient, so camera-only
    inversion DIVERGES without it; measured loss 0.012 -> 0.060 over 150
    hard Adam steps vs 0.035 -> 0.0002 eye-RMS with ratio 12.5). The tau=0
    polish stage is the exact hard reference semantics either way. Units:
    checker cells per soft_tau unit; 12.5 maps the default taus to cell
    widths (1.0, 0.375, 0.125).

    Returns (final_scene, losses[(len(taus) * iters)]).
    """
    import dataclasses

    from .ops.pipeline_vec import render_jnp_vec

    if soft_size is not None and target_scene is None:
        raise ValueError("soft_size requires target_scene (stage targets are re-rendered)")
    if hard_ocfg == "auto":
        # The tau=0 polish must NOT use Adam: starting from the soft stages'
        # near-optimum, gradients are tiny and Adam's normalization takes
        # full-lr steps in noise directions — measured on the 64-sphere
        # 1024^2 inversion: soft stages reach RMS 0.0005, a 200-step Adam
        # hard stage then RANDOM-WALKS to 0.027 (SGD lr 3.0 drifts to
        # 0.005; lr 0.3 HOLDS at 0.00054). Plain low-lr SGD steps are
        # proportional to the true (tiny) gradients — the reference's own
        # descent dynamics (grad_descent.py).
        hard_ocfg = dataclasses.replace(ocfg, optimizer="sgd", lr=0.3, momentum=0.0)

    # On TPU every stage runs through fused Pallas kernels where the
    # family supports the scene (anneal_stage_impl is the decision): the
    # soft (tau > 0) stages through fused_vec_soft (hand-planned two-layer
    # soft backward; allclose-grade vs render_jnp_vec) and the hard tau=0
    # polish through fused_vec (bit-exact vs render_jnp_vec there).
    # Elsewhere stages run through render_jnp_vec. Stage targets are
    # rendered with the SAME renderer as the stage optimization, so the
    # stage loss floor is exactly zero regardless of implementation.
    all_losses = []
    for tau in taus:
        cfg_t = dataclasses.replace(
            rcfg, soft_tau=float(tau),
            checker_tau=float(checker_ratio) * float(tau),
        )
        if tau > 0.0 and soft_size is not None:
            cfg_t = dataclasses.replace(cfg_t, height=soft_size, width=soft_size)
        impl_name = anneal_stage_impl(scene, float(tau))
        if impl_name == "pallas_vec":
            from .ops.kernels.fused_vec import render_pallas_vec as render_stage
        elif impl_name == "pallas_vec_soft":
            from .ops.kernels.fused_vec_soft import (
                render_pallas_vec_soft as render_stage,
            )
        else:
            render_stage = render_jnp_vec
        tgt = target
        if target_scene is not None and tau > 0.0:
            tgt = render_stage(target_scene, cfg_t)
        stage_ocfg = hard_ocfg if (tau == 0.0 and hard_ocfg is not None) else ocfg
        use_step = anneal_stage_uses_step(impl_name, cfg_t.spp)
        if use_step:
            if impl_name == "pallas_vec":
                from .ops.kernels.fused_vec import (
                    loss_grad_pallas_vec as step_fn,
                )
            else:
                from .ops.kernels.fused_vec_soft import (
                    loss_grad_pallas_vec_soft as step_fn,
                )
            vag = lambda s, t, c=cfg_t, f=step_fn: f(s, c, t, loss=stage_ocfg.loss)
        else:
            vag = None
        done = sum(int(l.shape[0]) for l in all_losses)
        scene, losses = optimize_scan(
            scene, tgt, spec, cfg_t, stage_ocfg,
            render_fn=lambda s, c=cfg_t, r=render_stage: r(s, c),
            vag_fn=vag,
            cache_key=(f"annealed-{impl_name}-step" if vag else
                       f"annealed-{impl_name}", float(tau),
                       cfg_t.checker_tau, soft_size),
            max_chunk=max_chunk,
            chunk_callback=(
                None if chunk_callback is None
                else (lambda s, it, base=done: chunk_callback(s, base + it))
            ),
        )
        all_losses.append(losses)
    return scene, jnp.concatenate(all_losses)
