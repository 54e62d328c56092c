"""Full-image renderers and losses (the reference's `scene.build()` +
compiled callable, SURVEY.md L4/C10, re-expressed as pure jit-able fns).

Two interchangeable implementations of the same math:

- ``render_jnp``   — pure jnp over the whole image; XLA fuses the unrolled
  pipeline. This is the differential-testing twin and the CPU/fake-mesh path.
- ``render_pallas``— fused Pallas TPU kernel pair (ops.kernels.fused) with a
  hand-planned backward (recompute-in-backward); the production TPU path.

``render`` dispatches: Pallas on TPU backends, jnp elsewhere — so the same
user code runs on the local v5e chip, on a CPU fake mesh, and in multi-host
pods without change.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.scene import Scene, scene_textured
from .pipeline import RenderConfig, render_tile


def render_jnp(scene: Scene, cfg: RenderConfig, row0=0, height: int | None = None):
    """Render rows [row0, row0+height) of the cfg.height x cfg.width image.

    Returns (height, width, 3) float32. ``row0``/``height`` support the
    shard_map row-band decomposition (parallel.shard): each device renders
    its own band of the global image.
    """
    h = cfg.height if height is None else height
    r, g, b = render_tile(scene, cfg, row0, 0, h, cfg.width)
    return jnp.stack([r, g, b], axis=-1)


def env_size(scene: Scene) -> int:
    """K of the (K, K, 3) environment map (0 when absent) — the dispatch
    threshold input for the kernels' dense env sampler."""
    import numpy as np

    return int(np.shape(scene.env)[0])


def resolve_impl(scene: Scene, cfg: RenderConfig) -> str:
    """The impl='auto' dispatch decision, exposed for tests and callers
    that need to know which renderer `render` would pick."""
    n_obj = scene.spheres.count + scene.rects.count
    on_tpu = jax.default_backend() == "tpu"
    textured = scene_textured(scene)
    if cfg.soft_tau > 0.0 or cfg.checker_tau > 0.0:
        # Soft-visibility / soft-checker rendering: the dedicated soft
        # Pallas kernels on TPU, the object-vectorized jnp path
        # elsewhere (the HARD Pallas kernels would silently drop the
        # taus — they refuse). The soft kernels require soft_tau > 0;
        # env maps ride their SMEM globals plan (round 3; soft env cap
        # K <= 24, stricter than the hard family's 32 — measured
        # scoped-vmem boundary, see soft_kernel_ok), texel grids ride
        # per-row SMEM tails (round 4, vec_smem_ok budget); only the
        # checker-only relaxation runs on the jnp path.
        # (reflections + taus raises in jnp_vec — the relaxations are
        # reflections-exclusive.) Eligibility is the shared
        # fused_vec_soft.soft_kernel_ok predicate (one source of truth
        # with optim.anneal_stage_impl).
        from .kernels.fused_vec_soft import soft_kernel_ok

        return (
            "pallas_vec_soft"
            if (on_tpu and cfg.soft_tau > 0.0 and soft_kernel_ok(scene))
            else "jnp_vec"
        )
    if textured:
        # Image textures / env maps: the unrolled kernels sample them
        # gather-free (dense hat-basis, `pipeline.sample_texture_dense`)
        # — TPU-validated vs jnp in scripts/tpu_textured_check.py
        # (fwd ≤1e-7, grads ≤1e-6 rel on configs 7/8/9-noreflect).
        # Routed by the VMEM-effective object count (texture grids keep
        # ~K/4 object-equivalents of hat-weight tiles live).
        # OBJECT-textured+reflections replays the O(K^2) dense chain per
        # bounce: the unrolled family refuses it (the chain is traced per
        # OBJECT there), the vec family runs it (env-only reflective
        # scenes, e.g. config 9, add just one dense env sample per bounce
        # and run in BOTH). Textured scenes past the unrolled threshold
        # ride the object-chunked vec kernels — env maps as a GLOBAL in
        # their SMEM scalar plan (up to K=32: K=48 is a measured compile
        # refusal at any backward tile under both env backends — round-5
        # probe, docs/env_k32_boundary_check.json), object texel grids as
        # row tails within
        # the probed SMEM budget (`vec_smem_ok`); vec spp=4 rendering is
        # the 4-launch wrapper over the same spp=1 compile (round 3:
        # interpret-validated textured/reflective, TPU rows in
        # scripts/vec_textured_tpu_check.py).
        from ..models.scene import scene_object_textured
        from .kernels.fused import tile_object_count

        from .kernels.fused_vec import vec_smem_ok

        obj_tex = scene_object_textured(scene)
        # spp=4 textured is interpret-validated (round 3; worst grad leaf
        # 0.08-0.13 of the house textured tolerance on configs 7/9).
        # tile_object_count folds spp in (each subsample keeps its own
        # live chain; TileConfig.for_shape shrinks tiles to match — at
        # the spp=1 tiles this OOM'd scoped vmem 38.7M > 16M). Budget:
        # the measured spp=1 crossover 24, and at spp=4 a HALVED
        # spp-independent count (folded <= 48; config-7 spp=4 at folded
        # count 32 measured 2.45 ms/step vs the ~240 ms XLA class).
        tile_budget = 24 if cfg.spp == 1 else 48
        if (on_tpu and cfg.spp in (1, 4)
                and not (cfg.reflections and obj_tex)
                and tile_object_count(scene, cfg) <= tile_budget):
            return "pallas"
        if (on_tpu and cfg.spp in (1, 4)
                and env_size(scene) <= 32 and vec_smem_ok(scene)):
            return "pallas_vec"
        return "jnp" if n_obj <= 24 else "jnp_vec"
    if cfg.reflections:
        # Mirror reflections: the unrolled family traces the bounce
        # replay for free; past its threshold the object-chunked kernels
        # (round 3) rerun their O(1)-compile loops once per level. Vec
        # spp=4 reflective rides the 4-launch wrapper over the spp=1
        # reflective compile (round 3: interpret-validated, TPU row in
        # vec_textured_tpu_check.py).
        if n_obj <= 24:
            return "pallas" if on_tpu else "jnp"
        if on_tpu and cfg.spp in (1, 4):
            return "pallas_vec"
        return "jnp_vec"
    if on_tpu:
        # Unrolled fused kernels compile O(N) (fastest for small object
        # counts); the object-chunked kernels compile O(1) — pick by N.
        # Crossover measured on v5e at 512^2 fwd+bwd: unrolled 0.172 ms
        # at 6 objects vs vec 0.686; vec 0.916 ms at 25 objects while
        # the unrolled chain reaches ~1 ms around 25-30 — threshold 24.
        # (spp = 4 multiplies both families by ~4x — the unrolled path
        # fuses subsamples in-kernel, the vec wrappers average four
        # launches — so the crossover is unchanged.)
        return "pallas" if n_obj <= 24 else "pallas_vec"
    return "jnp" if n_obj <= 24 else "jnp_vec"


def render(scene: Scene, cfg: RenderConfig, impl: str = "auto"):
    """Render the full image with the best available implementation."""
    if impl == "auto":
        impl = resolve_impl(scene, cfg)
    if impl == "jnp":
        return render_jnp(scene, cfg)
    if impl == "jnp_vec":
        from .pipeline_vec import render_jnp_vec

        return render_jnp_vec(scene, cfg)
    if impl == "pallas":
        from .kernels.fused import render_pallas

        return render_pallas(scene, cfg)
    if impl == "pallas_vec":
        from .kernels.fused_vec import render_pallas_vec

        return render_pallas_vec(scene, cfg)
    if impl == "pallas_vec_soft":
        from .kernels.fused_vec_soft import render_pallas_vec_soft

        return render_pallas_vec_soft(scene, cfg)
    raise ValueError(f"unknown impl {impl!r}")


def resolve_step_impl(scene_like: Scene, cfg: RenderConfig,
                      impl: str = "auto", loss: str = "mse") -> str:
    """Which training-step implementation `loss_and_grad_fn` builds:

    - ``"step_unrolled"`` — `kernels.fused.loss_grad_pallas` (one fused
      loss+grad launch, unrolled object chain; textures/env via the dense
      sampler);
    - ``"step_vec"``      — `kernels.fused_vec.loss_grad_pallas_vec`
      (object-chunked, O(1) compile in N);
    - ``"vag"``           — ``jax.value_and_grad`` over `render`.

    Exposed (like `resolve_impl`) so the CLI and tests share ONE dispatch
    decision — round 2 shipped a private stale copy in cli.py that sent
    textured inversions to a ~113x slower XLA fallback.
    """
    n_obj = scene_like.spheres.count + scene_like.rects.count
    fused_ok = (
        jax.default_backend() == "tpu"
        and cfg.soft_tau == 0.0
        and cfg.checker_tau == 0.0
        and loss in ("mse", "sum")
        and impl in ("auto", "pallas", "pallas_vec", "pallas_step")
    )
    if not fused_ok:
        return "vag"
    if scene_textured(scene_like):
        # The unrolled step kernel samples textures/env gather-free
        # (TPU-validated, scripts/tpu_textured_check.py) — but refuses
        # OBJECT-textured reflections (per-bounce dense-chain replay is
        # traced per OBJECT there; env-only bounces are one extra dense
        # sample and run in-kernel). Threshold on the VMEM-effective
        # object count. Textured scenes past it — and obj-textured
        # reflective scenes at ANY count — take the vec step kernel: env
        # via its SMEM globals plan (K <= 32), object texel grids as SMEM
        # row tails (`vec_smem_ok` budget), bounce levels replayed by its
        # reverse-level backward, spp=4 fused in-kernel (round 3;
        # interpret grads vs jnp + TPU rows in vec_textured_tpu_check.py).
        from ..models.scene import scene_object_textured
        from .kernels.fused import tile_object_count
        from .kernels.fused_vec import vec_smem_ok

        obj_tex = scene_object_textured(scene_like)
        validated = (
            cfg.spp in (1, 4)
            and not (bool(cfg.reflections) and obj_tex)
        )
        tile_budget = 24 if cfg.spp == 1 else 48  # see resolve_impl
        if impl == "auto":
            want_unrolled = (
                validated and tile_object_count(scene_like, cfg) <= tile_budget
            )
        else:
            # Explicit "pallas"/"pallas_step" both name the unrolled step.
            want_unrolled = impl in ("pallas", "pallas_step")
        if want_unrolled and validated:
            return "step_unrolled"
        if (cfg.spp in (1, 4)
                and env_size(scene_like) <= 32 and vec_smem_ok(scene_like)
                and impl in ("auto", "pallas_vec")):
            return "step_vec"
        return "vag"
    want_unrolled = (
        impl == "pallas" or (impl != "pallas_vec" and n_obj <= 24)
    )
    if want_unrolled and cfg.spp in (1, 4):
        return "step_unrolled"
    # Large reflective scenes take the vec step kernel too (round 3: the
    # reverse-level backward composition), and spp=4 fuses the 2x2
    # subsample loop in-kernel — including their product (the step body
    # loops replay/shade/reverse over subsamples x levels; interpret
    # grads vs jnp validated, tests/test_fused_step.py).
    if cfg.spp in (1, 4):
        return "step_vec"
    return "vag"


def loss_and_grad_fn(scene_like: Scene, cfg: RenderConfig, impl: str = "auto",
                     loss: str = "mse"):
    """Return ``f(scene, target) -> (loss, grads)`` — the training step's
    value-and-grad, fused into ONE Pallas kernel where possible.

    On TPU with the unrolled kernel family (small object count, hard
    semantics, mse/sum loss) this dispatches to
    `kernels.fused.loss_grad_pallas`: no forward kernel, no image in HBM —
    the per-step cost drops from fwd + replaying-bwd to a single fused
    launch. Everywhere else it falls back to ``jax.value_and_grad`` over
    `render` (identical semantics; the fused kernel's vjp traces the same
    `render_tile`). The dispatch decision itself is `resolve_step_impl`
    (tested; shared with the CLI).
    """
    which = resolve_step_impl(scene_like, cfg, impl, loss)
    if which == "step_unrolled":
        from .kernels.fused import loss_grad_pallas

        return lambda scene, target: loss_grad_pallas(
            scene, cfg, target, loss=loss
        )
    if which == "step_vec":
        from .kernels.fused_vec import loss_grad_pallas_vec

        return lambda scene, target: loss_grad_pallas_vec(
            scene, cfg, target, loss=loss
        )

    lossf = {"mse": mse_loss, "sum": sum_squared_loss}[loss]
    # "pallas_step" names the fused step, not a render impl — fall back to
    # auto dispatch when the fused kernel is unavailable (e.g. off-TPU).
    render_impl = "auto" if impl == "pallas_step" else impl

    def vag(scene, target):
        return jax.value_and_grad(
            lambda s: lossf(render(s, cfg, render_impl), target)
        )(scene)

    return vag


def mse_loss(image, target):
    """Mean squared error over pixels (the reference used a sum; mean keeps
    the loss scale resolution-independent — learning rates transfer across
    the 64^2..1024^2 driver configs). Gradients differ only by the constant
    1/(H*W*3), absorbed by the learning rate."""
    diff = image - target
    return jnp.mean(diff * diff)


def sum_squared_loss(image, target):
    """Reference-faithful sum-of-squares loss (Theano `T.sum((a-b)**2)`,
    SURVEY.md §3.3)."""
    diff = image - target
    return jnp.sum(diff * diff)
