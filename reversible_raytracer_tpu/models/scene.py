"""Scene model: immutable pytrees of stacked parameter arrays.

TPU-native redesign of the reference's scene graph (SURVEY.md §1 L2/L3, §2
C2/C9/C10 — reference mount was empty; capability-level reconstruction): the
reference (lebek/reversible-raytracer) represents a scene as Python objects
(`Sphere`, `UnitSquare`, `Light`, `Material`) each holding mutable Theano
shared variables registered in a `VariableSet` with box bounds.

Here the scene is a frozen dataclass pytree where every parameter *kind* is
one stacked array (`Spheres.center: (N, 3)`, `Spheres.radius: (N,)`, ...).
This is the idiomatic JAX formulation:

- the renderer is a pure function of the pytree (jit/grad/vmap compose);
- `jax.value_and_grad` returns a gradient pytree of identical structure;
- optimizer state (Adam moments) is the same pytree, built by `optax`;
- the whole scene flattens to ONE flat f32 vector (`jax.flatten_util.
  ravel_pytree`) which is how it enters the fused Pallas kernels;
- the reference's box bounds + "which params are optimizable" registry
  becomes a pair of pytrees (`bounds`, `trainable`) with the same structure
  (see `spec` helpers below), applied as projection/masking in the optimizer
  step rather than mutable state.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


def _pytree_dataclass(cls):
    cls = dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


def _f32(x):
    return jnp.asarray(x, dtype=jnp.float32)


def _leading_dim(x) -> int:
    """Object count of a stacked leaf. Tolerates tuple-of-scalars leaves —
    the Pallas kernels rebuild scenes as nested tuples of SMEM scalar reads
    (ops/kernels/fused.py), reusing these dataclasses as the view type."""
    return len(x) if isinstance(x, (tuple, list)) else x.shape[0]


@_pytree_dataclass
class Materials:
    """Per-object material parameters, stacked over K objects.

    Mirrors the reference's `Material` (color + ambient/diffuse/specular
    coefficients + shininess; SURVEY.md C9) plus the checker/texture
    extension required by driver config 4 (BASELINE.json:10): `color2`,
    `checker` (0.0 = solid color, 1.0 = checkerboard between color/color2)
    and `checker_scale` (cells per unit length / per uv unit).
    """

    color: jnp.ndarray  # (K, 3) base albedo in [0, 1]
    color2: jnp.ndarray  # (K, 3) second checker color
    checker: jnp.ndarray  # (K,)  0.0 solid / 1.0 checkered (step select)
    checker_scale: jnp.ndarray  # (K,)
    ka: jnp.ndarray  # (K,) ambient coefficient
    kd: jnp.ndarray  # (K,) diffuse (Lambertian) coefficient
    ks: jnp.ndarray  # (K,) specular (Phong) coefficient
    shininess: jnp.ndarray  # (K,) Phong exponent
    # Mirror reflectivity in [0, 1] (capability extension beyond the
    # reference: one-or-more-bounce specular reflection, gated by
    # RenderConfig.reflections; 0.0 = the reference's local-shading-only
    # semantics). The final color is lerp(local, reflected, mirror) — a
    # continuous blend, so `mirror` itself is cleanly optimizable.
    mirror: jnp.ndarray  # (K,)

    @staticmethod
    def stack(mats: "list[Materials]") -> "Materials":
        return jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs), *mats)

    @staticmethod
    def make(
        color,
        color2=None,
        checker=0.0,
        checker_scale=1.0,
        ka=0.1,
        kd=0.9,
        ks=0.0,
        shininess=30.0,
        mirror=0.0,
    ) -> "Materials":
        color = _f32(color).reshape(1, 3)
        color2 = _f32(color2 if color2 is not None else color).reshape(1, 3)
        one = lambda v: _f32(v).reshape(1)
        return Materials(
            color=color,
            color2=color2,
            checker=one(checker),
            checker_scale=one(checker_scale),
            ka=one(ka),
            kd=one(kd),
            ks=one(ks),
            shininess=one(shininess),
            mirror=one(mirror),
        )


@_pytree_dataclass
class Spheres:
    """All spheres in the scene, stacked. Reference: `Sphere` objects with a
    center/radius registered in the VariableSet (SURVEY.md C4/C9)."""

    center: jnp.ndarray  # (N, 3)
    radius: jnp.ndarray  # (N,)
    material: Materials  # fields have leading dim N
    # Optional per-sphere image texture: (N, K, K, 3) texel grid sampled
    # at lat-long UV (pipeline.sphere_uv: azimuth wraps, polar clamps),
    # replacing the checker/solid base color when non-empty. Same rules as
    # Rects.texture: square static K shared across the group; jnp paths
    # only (the Pallas kernel families refuse texel grids).
    texture: jnp.ndarray  # (N, K, K, 3); K == 0 -> untextured

    @property
    def count(self) -> int:
        return _leading_dim(self.center)

    @property
    def textured(self) -> bool:
        if isinstance(self.texture, (tuple, list)):
            return len(self.texture) > 0
        return self.texture.size > 0

    @staticmethod
    def empty() -> "Spheres":
        z = jnp.zeros((0, 3), jnp.float32)
        z1 = jnp.zeros((0,), jnp.float32)
        return Spheres(
            center=z,
            radius=z1,
            material=Materials(
                color=z, color2=z, checker=z1, checker_scale=z1, ka=z1, kd=z1, ks=z1, shininess=z1, mirror=z1
            ),
            texture=jnp.zeros((0, 0, 0, 3), jnp.float32),
        )


@_pytree_dataclass
class Rects:
    """Finite parallelogram patches (the reference's `UnitSquare` /
    ground-plane primitive, SURVEY.md C5, generalized): a rect is
    ``origin + a * edge_u + b * edge_v`` for (a, b) in [0, 1]^2. The face
    normal is ``normalize(edge_u x edge_v)``; (a, b) double as texture
    coordinates for the checker material."""

    origin: jnp.ndarray  # (M, 3)
    edge_u: jnp.ndarray  # (M, 3)
    edge_v: jnp.ndarray  # (M, 3)
    material: Materials  # leading dim M
    # Optional per-rect image texture (capability extension beyond the
    # reference): (M, K, K, 3) texel grid, bilinearly sampled at the rect's
    # (a, b) hit coordinates and REPLACING the checker/solid base color
    # when non-empty (K > 0). Texels are ordinary differentiable scene
    # parameters — `spec.train("rects.texture")` turns inverse rendering
    # into texture recovery (config 7). K is static (trace-time); all
    # rects of a scene share one K (merge_rects requires matching K).
    # Texture scenes render via the jnp paths (XLA lowers the bilinear
    # gathers well); the Pallas kernel families refuse them loudly.
    texture: jnp.ndarray  # (M, K, K, 3); K == 0 -> untextured

    @property
    def count(self) -> int:
        return _leading_dim(self.origin)

    @property
    def textured(self) -> bool:
        """True when the texture grid is non-empty. Tolerates the kernel
        scalar view's tuple sentinel (an empty tuple) for size-0 leaves."""
        if isinstance(self.texture, (tuple, list)):
            return len(self.texture) > 0
        return self.texture.size > 0

    @staticmethod
    def empty() -> "Rects":
        z = jnp.zeros((0, 3), jnp.float32)
        z1 = jnp.zeros((0,), jnp.float32)
        return Rects(
            origin=z,
            edge_u=z,
            edge_v=z,
            material=Materials(
                color=z, color2=z, checker=z1, checker_scale=z1, ka=z1, kd=z1, ks=z1, shininess=z1, mirror=z1
            ),
            texture=jnp.zeros((0, 0, 0, 3), jnp.float32),
        )


@_pytree_dataclass
class Lights:
    """Point lights (reference `Light`: position + intensity, SURVEY.md C9)."""

    position: jnp.ndarray  # (L, 3)
    color: jnp.ndarray  # (L, 3) RGB intensity

    @property
    def count(self) -> int:
        return _leading_dim(self.position)


@_pytree_dataclass
class Camera:
    """Pinhole camera with an optimizable pose (driver config 4 requires
    camera-pose optimization, BASELINE.json:10; the reference's camera was a
    fixed ray grid, SURVEY.md C3)."""

    eye: jnp.ndarray  # (3,)
    look_at: jnp.ndarray  # (3,)
    up: jnp.ndarray  # (3,)
    fov_deg: jnp.ndarray  # () vertical field of view in degrees

    @staticmethod
    def make(eye, look_at, up=(0.0, 1.0, 0.0), fov_deg=60.0) -> "Camera":
        return Camera(
            eye=_f32(eye), look_at=_f32(look_at), up=_f32(up), fov_deg=_f32(fov_deg)
        )


@_pytree_dataclass
class Scene:
    """The whole differentiable scene: one pytree, one flat vector."""

    spheres: Spheres
    rects: Rects
    lights: Lights
    camera: Camera
    ambient: jnp.ndarray  # (3,) ambient light color
    background: jnp.ndarray  # (3,) miss color
    # Optional lat-long environment map: (K, K, 3) texel grid sampled by
    # the (unit) ray direction on every miss — primary rays AND missed
    # mirror bounces — replacing the flat `background` color. Same
    # addressing as Spheres.texture (pipeline.sphere_uv of the direction:
    # azimuth wraps, polar clamps) and fully differentiable: "recover the
    # sky" is config 9. K == 0 -> flat background.
    env: jnp.ndarray  # (K, K, 3)

    @property
    def env_mapped(self) -> bool:
        if isinstance(self.env, (tuple, list)):
            return len(self.env) > 0
        return self.env.size > 0

    @staticmethod
    def make(
        spheres: Spheres | None = None,
        rects: Rects | None = None,
        lights: Lights | None = None,
        camera: Camera | None = None,
        ambient=(1.0, 1.0, 1.0),
        background=(0.0, 0.0, 0.0),
        env=None,
    ) -> "Scene":
        if env is None:
            env_leaf = jnp.zeros((0, 0, 3), jnp.float32)
        else:
            env_leaf = _f32(env)
            assert env_leaf.ndim == 3 and env_leaf.shape[-1] == 3, env_leaf.shape
            # Square grids only, like the object textures (the native
            # oracle ABI carries one K per grid).
            assert env_leaf.shape[0] == env_leaf.shape[1], (
                f"env map must be square (K, K, 3), got {tuple(env_leaf.shape)}"
            )
        return Scene(
            spheres=spheres if spheres is not None else Spheres.empty(),
            rects=rects if rects is not None else Rects.empty(),
            lights=lights
            if lights is not None
            else Lights(position=_f32([[0.0, 5.0, 0.0]]), color=_f32([[1.0, 1.0, 1.0]])),
            camera=camera if camera is not None else Camera.make((0, 0, 5), (0, 0, 0)),
            ambient=_f32(ambient),
            background=_f32(background),
            env=env_leaf,
        )


# ---------------------------------------------------------------------------
# Builders (the ergonomic layer the reference got from Python classes)
# ---------------------------------------------------------------------------


def _texture_leaf(texture) -> jnp.ndarray:
    """(K, K, 3) grid (or None) -> the (1, K, K, 3) stacked-texture leaf."""
    if texture is None:
        return jnp.zeros((1, 0, 0, 3), jnp.float32)
    tex = _f32(texture)
    assert tex.ndim == 3 and tex.shape[-1] == 3, tex.shape
    # Square grids only: the native oracle's ABI carries one K per group
    # (oracle/native.py), so the builders enforce it.
    assert tex.shape[0] == tex.shape[1], (
        f"texture must be square (K, K, 3), got {tuple(tex.shape)}"
    )
    return tex[None]


def sphere(center, radius, material: Materials, texture=None) -> Spheres:
    """``texture``: optional (K, K, 3) lat-long texel grid (Spheres.texture)."""
    return Spheres(
        center=_f32(center).reshape(1, 3),
        radius=_f32(radius).reshape(1),
        material=material,
        texture=_texture_leaf(texture),
    )


def rect(origin, edge_u, edge_v, material: Materials, texture=None) -> Rects:
    """``texture``: optional (K, K, 3) texel grid (see Rects.texture)."""
    return Rects(
        origin=_f32(origin).reshape(1, 3),
        edge_u=_f32(edge_u).reshape(1, 3),
        edge_v=_f32(edge_v).reshape(1, 3),
        material=material,
        texture=_texture_leaf(texture),
    )


def ground_plane(y, half_extent, material: Materials, center_xz=(0.0, 0.0),
                 texture=None) -> Rects:
    """Horizontal rect of side 2*half_extent at height y, facing +y."""
    cx, cz = center_xz
    s = float(half_extent)
    return rect(
        origin=(cx - s, y, cz - s),
        edge_u=(0.0, 0.0, 2 * s),  # u along +z
        edge_v=(2 * s, 0.0, 0.0),  # v along +x; u x v = +y
        material=material,
        texture=texture,
    )


def _check_texture_ks(parts, what: str):
    ks = {tuple(np.shape(p.texture)[1:3]) for p in parts}
    if len(ks) > 1:
        raise ValueError(
            f"{what}: all objects must share one texture resolution "
            f"(got K grids {sorted(ks)}); give every object a (K, K, 3) "
            f"texture — a constant-color grid stands in for 'untextured'"
        )


def merge_spheres(parts: "list[Spheres]") -> Spheres:
    _check_texture_ks(parts, "merge_spheres")
    return jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs), *parts)


def merge_rects(parts: "list[Rects]") -> Rects:
    _check_texture_ks(parts, "merge_rects")
    return jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs), *parts)


def scene_textured(scene: Scene) -> bool:
    """True when the scene carries any image-texture grid — object
    textures or the environment map (the dispatch predicate: textured
    scenes route off the object-vectorized kernels; the UNROLLED kernels
    sample them gather-free and take small textured scenes in impl='auto'
    — TPU-validated, scripts/tpu_textured_check.py)."""
    return scene.rects.textured or scene.spheres.textured or scene.env_mapped


def scene_object_textured(scene: Scene) -> bool:
    """True when an OBJECT carries a texel grid (env map excluded). The
    unrolled kernels' reflections refusal keys on this: a mirror bounce
    replays each object-texture's O(K^2) dense chain (trace/compile
    explosion), but an env-only scene adds just ONE extra dense env
    sample per bounce (`miss_color` of the bounced ray) — cheap, so
    env-only reflective scenes (config 9 as shipped) run in-kernel."""
    return scene.rects.textured or scene.spheres.textured


def lights(positions, colors) -> Lights:
    return Lights(position=_f32(positions).reshape(-1, 3), color=_f32(colors).reshape(-1, 3))


# ---------------------------------------------------------------------------
# Trainability + bounds spec (the reference's VariableSet, functionally)
# ---------------------------------------------------------------------------


def path_matches(name: str, needle: str) -> bool:
    """Segment-aware dotted-path matching: ``needle`` must align to '.'
    boundaries of ``name``, so "spheres.material.color" does NOT match
    "...color2" (that substring bug silently marked color2 trainable — it
    has zero gradient when checker==0, putting a permanent noise floor
    under param-RMS convergence metrics)."""
    if name == needle:
        return True
    if name.startswith(needle + "."):
        return True
    if name.endswith("." + needle):
        return True
    return ("." + needle + ".") in name


@dataclass(frozen=True)
class ParamSpec:
    """Which leaves of the Scene pytree are optimized, and their box bounds.

    ``trainable`` is a pytree of bools (one per Scene leaf) — the functional
    replacement of "was this value registered in the VariableSet".
    ``lower`` / ``upper`` are pytrees of per-leaf scalar bounds (applied as a
    clip-projection after each optimizer update, exactly the reference's
    bound-clipping semantics, SURVEY.md C2/C12).
    """

    trainable: Scene
    lower: Scene
    upper: Scene

    @staticmethod
    def none(scene: Scene) -> "ParamSpec":
        f = lambda x: np.zeros((), bool)
        lo = lambda x: jnp.full((), -jnp.inf, jnp.float32)
        hi = lambda x: jnp.full((), jnp.inf, jnp.float32)
        return ParamSpec(
            trainable=jax.tree_util.tree_map(f, scene),
            lower=jax.tree_util.tree_map(lo, scene),
            upper=jax.tree_util.tree_map(hi, scene),
        )

    def train(self, path_pred, lower=-np.inf, upper=np.inf) -> "ParamSpec":
        """Mark leaves whose dotted path satisfies ``path_pred`` trainable.

        ``path_pred`` is a string (segment-aware match, e.g.
        "spheres.center" — see `path_matches`) or a callable path -> bool.
        """
        if isinstance(path_pred, str):
            needle = path_pred
            path_pred = lambda p: path_matches(p, needle)

        def visit(tree, update):
            paths_leaves = jax.tree_util.tree_flatten_with_path(tree)
            leaves, treedef = paths_leaves
            out = []
            for path, leaf in leaves:
                name = ".".join(
                    getattr(k, "name", getattr(k, "key", str(k))) for k in path
                )
                out.append(update(leaf) if path_pred(name) else leaf)
            return jax.tree_util.tree_unflatten(treedef, out)

        new_trainable = visit(self.trainable, lambda _: np.ones((), bool))
        new_lower = visit(self.lower, lambda _: jnp.asarray(lower, jnp.float32))
        new_upper = visit(self.upper, lambda _: jnp.asarray(upper, jnp.float32))
        return ParamSpec(trainable=new_trainable, lower=new_lower, upper=new_upper)


def leaf_paths(scene: Scene) -> "list[str]":
    """Dotted paths of every leaf — for CLI/docs introspection."""
    paths, _ = jax.tree_util.tree_flatten_with_path(scene)
    return [
        ".".join(getattr(k, "name", getattr(k, "key", str(k))) for k in p)
        for p, _ in paths
    ]
