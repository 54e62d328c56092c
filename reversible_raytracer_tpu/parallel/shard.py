"""Ray/tile parallelism over a device mesh (SURVEY.md P1/P2).

The reference is single-process, single-graph Theano — it has NO parallelism
(SURVEY.md §2 checklist). The scaling dimension of this workload is the
pixel grid: the image rows are the "sequence", so sharding rows across chips
is simultaneously data parallelism over rays and the raytracing analog of
sequence/context parallelism. Scene parameters are O(10^2..10^3) floats and
stay fully replicated; their per-band gradients are the ONLY cross-device
traffic — one small `lax.psum` per step, riding ICI within a slice and DCN
across hosts (SURVEY.md §5.8). A second optional mesh axis provides true
data parallelism over *batches of scenes* (joint inverse rendering of many
targets at once — a capability the reference could not express at all).

Why not TP/PP/EP (documented per SURVEY.md §2 checklist): there are no
weight matrices to shard (TP n/a), the fused kernel has pipeline depth 1
(PP n/a), there are no experts (EP n/a), and there is no attention/KV to
rotate, so ring-attention/Ulysses-style SP mechanics reduce to the plain
row-band sharding implemented here.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.scene import ParamSpec, Scene
from ..optim import (
    OptConfig,
    loss_fn_for,
    make_flat_update,
    make_optimizer,
    mask_grads,
    project_bounds,
)
from ..ops.pipeline import RenderConfig
from ..ops.render import render_jnp

RAYS_AXIS = "rays"
BATCH_AXIS = "batch"

_SHARD_SCAN_CACHE: dict = {}


_AUTO = (jax.sharding.AxisType.Auto,)


def make_ray_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over all (or the first n) devices: the P1 layout.

    Axis type Auto (not JAX 0.9's Explicit default): the sharded step mixes
    shard_map regions with ordinary jit code (optax update), which is the
    auto-sharding programming model."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return jax.make_mesh((n,), (RAYS_AXIS,), axis_types=_AUTO, devices=devs[:n])


def make_scene_ray_mesh(batch: int, rays: int) -> Mesh:
    """2-D mesh: DP over scene batch x SP over image rows."""
    return jax.make_mesh((batch, rays), (BATCH_AXIS, RAYS_AXIS), axis_types=_AUTO * 2)


def _band_render_fn(cfg: RenderConfig, band: int, impl: str):
    """Per-device renderer of a `band`-row slice starting at a traced row0."""
    if impl == "pallas":
        from ..ops.kernels.fused import render_pallas

        return lambda scene, row0: render_pallas(scene, cfg, row0=row0, out_height=band)
    if impl == "pallas_vec":
        from ..ops.kernels.fused_vec import render_pallas_vec

        return lambda scene, row0: render_pallas_vec(scene, cfg, row0=row0, out_height=band)
    if impl == "pallas_vec_soft":
        from ..ops.kernels.fused_vec_soft import render_pallas_vec_soft

        return lambda scene, row0: render_pallas_vec_soft(
            scene, cfg, row0=row0, out_height=band
        )
    if impl == "jnp_vec":
        from ..ops.pipeline_vec import render_jnp_vec

        return lambda scene, row0: render_jnp_vec(scene, cfg, row0=row0, height=band)
    return lambda scene, row0: render_jnp(scene, cfg, row0=row0, height=band)


def _band_vag_fn(rcfg: RenderConfig, band: int, loss: str = "mse",
                 interpret: bool = False, vec: bool = False):
    """Per-device FUSED training step for one row band (impl
    "pallas_step" / "pallas_vec_step"): `loss_grad_pallas[_vec]` computes
    the band's squared-error sum and scene gradients in ONE kernel launch
    — no band image in HBM. `norm` pre-scales by the GLOBAL loss
    normalization, so psum-ing the per-band (loss, grads) over the rays
    axis yields exactly the global value_and_grad (the P2 gradient
    all-reduce, now explicit). ``vec=True`` selects the object-chunked
    family (the production large-N path, O(1)-compile in object count)."""
    if vec:
        from ..ops.kernels.fused_vec import loss_grad_pallas_vec as _lg
    else:
        from ..ops.kernels.fused import loss_grad_pallas as _lg

    denom = float(rcfg.height * rcfg.width * 3) if loss == "mse" else 1.0

    def vag(scene, target_band, row0):
        return _lg(
            scene, rcfg, target_band, loss=loss, row0=row0,
            out_height=band, norm=1.0 / denom, interpret=interpret,
        )

    return vag


def _sharded_loss_and_grads(mesh: Mesh, rcfg: RenderConfig, band: int,
                            loss: str, impl: str):
    """Build the shard_mapped (loss, grads) fn for one step: either the
    fused band step ("pallas_step") or autodiff of the local band loss
    (every other impl); both all-reduce the loss and the tiny scene-grad
    pytree with ONE explicit psum over the rays axis (P2)."""
    denom = float(rcfg.height * rcfg.width * 3) if loss == "mse" else 1.0

    if impl in ("pallas_step", "pallas_vec_step"):
        band_vag = _band_vag_fn(
            rcfg, band, loss, interpret=jax.default_backend() != "tpu",
            vec=impl == "pallas_vec_step",
        )

        # check_vma=False: pallas_call out_shapes carry no varying-mesh-
        # axes annotation, which JAX 0.9's vma checker rejects inside
        # shard_map; correctness is carried by the explicit psums below.
        @partial(jax.shard_map, mesh=mesh, check_vma=False,
                 in_specs=(P(), P(RAYS_AXIS)), out_specs=(P(), P()))
        def loss_and_grads(scene, target_band):
            row0 = (jax.lax.axis_index(RAYS_AXIS) * band).astype(jnp.float32)
            sq, grads = band_vag(scene, target_band, row0)
            l = jax.lax.psum(sq, RAYS_AXIS)
            grads = jax.tree_util.tree_map(
                lambda g: jax.lax.psum(g, RAYS_AXIS), grads
            )
            return l, grads

        return loss_and_grads

    render_band = _band_render_fn(rcfg, band, impl)

    def local_loss(scene, target_band, row0):
        img = render_band(scene, row0)
        d = img - target_band
        return jnp.sum(d * d) / denom

    # P2: autodiff runs on the LOCAL band loss; one explicit psum then
    # all-reduces the loss and the (tiny, replicated-scene) gradient pytree
    # over ICI/DCN. check_vma=False is required because the band renderer
    # may be a pallas_call (impl "pallas"/"pallas_vec"/soft) whose
    # out_shapes carry no varying-mesh-axes annotation — and without vma
    # tracking shard_map cannot insert the replicated-input transpose psum
    # itself, hence the explicit form. (The forward-psum formulation whose
    # AD transpose IS the all-reduce is exercised under full vma checking
    # in tests/test_sharding.py::test_sharded_psum_grads_match_single_device.)
    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(P(), P(RAYS_AXIS)), out_specs=(P(), P()))
    def loss_and_grads(scene, target_band):
        row0 = (jax.lax.axis_index(RAYS_AXIS) * band).astype(jnp.float32)
        l_loc, g_loc = jax.value_and_grad(local_loss)(scene, target_band, row0)
        return (
            jax.lax.psum(l_loc, RAYS_AXIS),
            jax.tree_util.tree_map(lambda g: jax.lax.psum(g, RAYS_AXIS), g_loc),
        )

    return loss_and_grads


def render_sharded(scene: Scene, cfg: RenderConfig, mesh: Mesh, impl: str = "jnp"):
    """Full image rendered cooperatively: device i renders rows
    [i*band, (i+1)*band). Output is row-sharded over the mesh (a host
    `np.asarray` gathers it; multi-host gather lives in .distributed)."""
    n = mesh.shape[RAYS_AXIS]
    assert cfg.height % n == 0, f"height {cfg.height} not divisible by mesh size {n}"
    band = cfg.height // n
    render_band = _band_render_fn(cfg, band, impl)

    # check_vma only needs disabling for pallas band renderers (their
    # out_shapes lack vma annotations). jnp impls keep full vma tracking,
    # so differentiating through the jnp render_sharded still gets the
    # auto-inserted replicated-input transpose psum (or a loud error) —
    # with check_vma=False that grad would be silently band-local.
    @partial(
        jax.shard_map,
        mesh=mesh,
        check_vma=not impl.startswith("pallas"),
        in_specs=(P(),),
        out_specs=P(RAYS_AXIS),
    )
    def f(scene):
        row0 = (jax.lax.axis_index(RAYS_AXIS) * band).astype(jnp.float32)
        return render_band(scene, row0)

    return f(scene)


def make_sharded_step(
    mesh: Mesh,
    rcfg: RenderConfig,
    spec: ParamSpec,
    ocfg: OptConfig,
    impl: str = "jnp",
):
    """Build the jitted distributed optimization step (SURVEY.md §3.3 TPU
    equivalent): per-device band loss -> local grads -> `psum` over the rays
    axis (P2: the gradient all-reduce) -> replicated Adam update -> bounds.

    The psum'd gradient pytree is tiny (the scene), so the collective is
    latency-bound and XLA's latency-hiding scheduler overlaps it with the
    backward of subsequent operations where possible.

    Returns (step, init) where step(scene, opt_state, target) ->
    (scene, opt_state, loss, grad_norm) and target is the (H, W, 3) image
    (sharded or replicated; jit re-shards as needed).
    """
    n = mesh.shape[RAYS_AXIS]
    assert rcfg.height % n == 0
    band = rcfg.height // n
    loss_and_grads = _sharded_loss_and_grads(mesh, rcfg, band, ocfg.loss, impl)

    target_sharding = NamedSharding(mesh, P(RAYS_AXIS))
    replicated = NamedSharding(mesh, P())
    # The flat optimizer update bakes the scene's treedef AND leaf shapes
    # (it ravels the trainable leaves), so it is (re)built by init() per
    # scene structure; step() before init() fails loudly, and a second
    # init() with a different structure rebuilds instead of silently
    # reusing the first scene's baked shapes (ADVICE r4).
    flat_init, flat_apply = None, None
    built_key = None

    def _scene_key(scene):
        return (
            jax.tree_util.tree_structure(scene),
            tuple(jnp.shape(l) for l in jax.tree_util.tree_leaves(scene)),
        )

    @jax.jit
    def step(scene, opt_state, target):
        if flat_apply is None:  # closure read at trace time
            raise RuntimeError(
                "make_sharded_step: call init(scene, target) before step() "
                "— the flat optimizer update is built from the scene's "
                "structure at init time"
            )
        l, grads = loss_and_grads(scene, target)
        # Flat-vector update (optim.make_flat_update): the per-leaf chain
        # costs one tiny XLA fusion per scene leaf — more than the fused
        # band kernel itself per step (VERDICT r3 #4).
        scene, opt_state, gnorm = flat_apply(scene, opt_state, grads)
        return scene, opt_state, l, gnorm

    def init(scene, target):
        nonlocal flat_init, flat_apply, built_key
        key = _scene_key(scene)
        if built_key != key:
            flat_init, flat_apply = make_flat_update(scene, spec, ocfg)
            built_key = key
        scene = jax.device_put(scene, replicated)
        target = jax.device_put(jnp.asarray(target, jnp.float32), target_sharding)
        return scene, flat_init(scene), target

    return step, init


def optimize_sharded_scan(
    scene: Scene,
    target,
    mesh: Mesh,
    rcfg: RenderConfig,
    spec: ParamSpec,
    ocfg: OptConfig,
    impl: str = "jnp",
):
    """Whole sharded optimization on-device via lax.scan: ONE dispatch for
    the entire inverse render (the wall-clock-to-converge fast path; the
    host-loop variant pays a dispatch + a host roundtrip per iteration).

    Returns (final_scene, losses[iters]). The compiled runner is cached by
    (scene structure, configs, spec, mesh shape, impl) — a fresh jit closure
    per call would recompile the whole scan every time.
    """
    n = mesh.shape[RAYS_AXIS]
    assert rcfg.height % n == 0
    band = rcfg.height // n

    def build():
        loss_and_grads = _sharded_loss_and_grads(
            mesh, rcfg, band, ocfg.loss, impl
        )
        flat_init, flat_apply = make_flat_update(scene, spec, ocfg)

        @jax.jit
        def run(scene, target):
            opt_state = flat_init(scene)

            def body(carry, _):
                scene, opt_state = carry
                l, grads = loss_and_grads(scene, target)
                scene, opt_state, _ = flat_apply(scene, opt_state, grads)
                return (scene, opt_state), l

            (scene, _), losses = jax.lax.scan(
                body, (scene, opt_state), None, length=ocfg.iters
            )
            return scene, losses

        return run

    leaves, treedef = jax.tree_util.tree_flatten(scene)
    spec_digest = (
        tuple(bool(t) for t in jax.tree_util.tree_leaves(spec.trainable)),
        tuple(float(x) for x in jax.tree_util.tree_leaves(spec.lower)),
        tuple(float(x) for x in jax.tree_util.tree_leaves(spec.upper)),
    )
    sig = ("sharded", treedef, tuple(jnp.shape(l) for l in leaves), rcfg, ocfg,
           spec_digest, tuple(mesh.shape.items()),
           tuple(d.id for d in mesh.devices.flat), impl)
    run = _SHARD_SCAN_CACHE.get(sig)
    if run is None:
        run = _SHARD_SCAN_CACHE[sig] = build()

    scene = jax.device_put(scene, NamedSharding(mesh, P()))
    target = jax.device_put(jnp.asarray(target, jnp.float32), NamedSharding(mesh, P(RAYS_AXIS)))
    return run(scene, target)


# ---------------------------------------------------------------------------
# Batched scenes: DP over scenes x SP over rays (2-D mesh)
# ---------------------------------------------------------------------------


def stack_scenes(scenes: "list[Scene]") -> Scene:
    """Stack B structurally-identical scenes into one batched pytree
    (leading axis B on every leaf)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *scenes)


def unstack_scenes(batched: Scene) -> "list[Scene]":
    b = jax.tree_util.tree_leaves(batched)[0].shape[0]
    return [jax.tree_util.tree_map(lambda x: x[i], batched) for i in range(b)]


def make_batched_step(
    mesh: Mesh,
    rcfg: RenderConfig,
    spec: ParamSpec,
    ocfg: OptConfig,
    impl: str = "jnp",
):
    """Distributed step for a BATCH of independent inverse renders.

    Mesh is 2-D (batch, rays): each device owns a (scenes-slice x row-band)
    block of the problem. Per-scene gradients psum over the rays axis only;
    scenes never communicate (they are independent problems). This is the
    dp x sp sharding validated by `__graft_entry__.dryrun_multichip`.

    step(batched_scene, opt_state, targets[B,H,W,3]) ->
        (batched_scene, opt_state, per_scene_loss[B], grad_norm)
    """
    nb = mesh.shape[BATCH_AXIS]
    nr = mesh.shape[RAYS_AXIS]
    assert rcfg.height % nr == 0
    band = rcfg.height // nr
    render_band = _band_render_fn(rcfg, band, impl)
    tx = make_optimizer(ocfg)
    denom = float(rcfg.height * rcfg.width * 3) if ocfg.loss == "mse" else 1.0

    def one_scene_loss(scene: Scene, target_band):
        row0 = (jax.lax.axis_index(RAYS_AXIS) * band).astype(jnp.float32)
        img = render_band(scene, row0)
        d = img - target_band
        return jnp.sum(d * d) / denom

    # Local-band AD + ONE explicit psum over rays for the whole batch of
    # (loss, grads); scenes never communicate across BATCH_AXIS.
    # check_vma=False: see _sharded_loss_and_grads.
    @partial(
        jax.shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(BATCH_AXIS), P(BATCH_AXIS, RAYS_AXIS)),
        out_specs=(P(BATCH_AXIS), P(BATCH_AXIS)),
    )
    def loss_and_grads(scenes_local, targets_local):
        # scenes_local: leaves with leading dim B/nb; targets (B/nb, band, W, 3)
        l, g = jax.vmap(jax.value_and_grad(one_scene_loss))(scenes_local, targets_local)
        return jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, RAYS_AXIS), (l, g)
        )

    @jax.jit
    def step(scenes, opt_state, targets):
        l, grads = loss_and_grads(scenes, targets)
        grads = jax.vmap(lambda g: mask_grads(g, spec))(grads)
        gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, scenes)
        scenes = optax.apply_updates(scenes, updates)
        scenes = jax.vmap(lambda s: project_bounds(s, spec))(scenes)
        return scenes, opt_state, l, gnorm

    def init(scenes, targets):
        scenes = jax.device_put(scenes, NamedSharding(mesh, P(BATCH_AXIS)))
        targets = jax.device_put(
            jnp.asarray(targets, jnp.float32), NamedSharding(mesh, P(BATCH_AXIS, RAYS_AXIS))
        )
        return scenes, tx.init(scenes), targets

    return step, init


def optimize_batched_scan(
    scenes: Scene,
    targets,
    mesh: Mesh,
    rcfg: RenderConfig,
    spec: ParamSpec,
    ocfg: OptConfig,
    impl: str = "jnp",
):
    """On-device scan loop over `make_batched_step`'s update: the whole
    batched inverse render in one dispatch. Returns (scenes, losses[iters, B])."""
    nr = mesh.shape[RAYS_AXIS]
    assert rcfg.height % nr == 0
    band = rcfg.height // nr
    render_band = _band_render_fn(rcfg, band, impl)
    tx = make_optimizer(ocfg)
    denom = float(rcfg.height * rcfg.width * 3) if ocfg.loss == "mse" else 1.0

    def one_scene_loss(scene, target_band):
        row0 = (jax.lax.axis_index(RAYS_AXIS) * band).astype(jnp.float32)
        img = render_band(scene, row0)
        d = img - target_band
        return jnp.sum(d * d) / denom

    # Local-band AD + explicit psum (see make_batched_step).
    @partial(
        jax.shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(BATCH_AXIS), P(BATCH_AXIS, RAYS_AXIS)),
        out_specs=(P(BATCH_AXIS), P(BATCH_AXIS)),
    )
    def loss_and_grads(scenes_local, targets_local):
        l, g = jax.vmap(jax.value_and_grad(one_scene_loss))(scenes_local, targets_local)
        return jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, RAYS_AXIS), (l, g)
        )

    @jax.jit
    def run(scenes, targets):
        opt_state = tx.init(scenes)

        def body(carry, _):
            scenes, opt_state = carry
            l, grads = loss_and_grads(scenes, targets)
            grads = jax.vmap(lambda g: mask_grads(g, spec))(grads)
            updates, opt_state = tx.update(grads, opt_state, scenes)
            scenes = optax.apply_updates(scenes, updates)
            scenes = jax.vmap(lambda s: project_bounds(s, spec))(scenes)
            return (scenes, opt_state), l

        (scenes, _), losses = jax.lax.scan(body, (scenes, opt_state), None, length=ocfg.iters)
        return scenes, losses

    scenes = jax.device_put(scenes, NamedSharding(mesh, P(BATCH_AXIS)))
    targets = jax.device_put(
        jnp.asarray(targets, jnp.float32), NamedSharding(mesh, P(BATCH_AXIS, RAYS_AXIS))
    )
    return run(scenes, targets)
