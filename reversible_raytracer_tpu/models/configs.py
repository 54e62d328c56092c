"""The five driver benchmark scenes (BASELINE.json:6-12), as builders.

Each builder returns ``(scene, spec, cfg)``:
  scene — the ground-truth Scene pytree,
  spec  — ParamSpec marking which parameters the inverse render optimizes
          (with box bounds, replacing the reference's VariableSet bounds),
  cfg   — RenderConfig (resolution + shading options).

`perturb` produces the perturbed starting scene for inverse rendering
(the reference demos perturb the shared variables then descend;
SURVEY.md §3.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pipeline import RenderConfig
from .scene import (
    Camera,
    Lights,
    Materials,
    ParamSpec,
    Scene,
    ground_plane,
    merge_spheres,
    sphere,
)


def _mat(color, **kw) -> Materials:
    return Materials.make(color, **kw)


def config1_single_sphere(size: int = 64):
    """Config 1: single sphere, Lambertian, 64^2; optimize center+radius."""
    s = sphere((0.0, 0.0, 0.0), 1.0, _mat((0.9, 0.2, 0.2), ka=0.15, kd=0.9, ks=0.0))
    scene = Scene.make(
        spheres=s,
        lights=Lights(
            position=jnp.array([[3.0, 4.0, 5.0]], jnp.float32),
            color=jnp.array([[1.0, 1.0, 1.0]], jnp.float32),
        ),
        camera=Camera.make((0.0, 0.0, 4.0), (0.0, 0.0, 0.0), fov_deg=50.0),
    )
    spec = (
        ParamSpec.none(scene)
        .train("spheres.center", lower=-3.0, upper=3.0)
        .train("spheres.radius", lower=0.2, upper=2.5)
    )
    cfg = RenderConfig(height=size, width=size, shadows=False)
    return scene, spec, cfg


def config2_four_spheres(size: int = 128):
    """Config 2: 4 spheres + ground plane, Phong specular, 128^2;
    optimize centers/radii/albedos."""
    parts = [
        sphere((-1.1, 0.0, 0.0), 0.55, _mat((0.9, 0.2, 0.2), ks=0.5, shininess=40.0)),
        sphere((1.1, 0.1, 0.3), 0.6, _mat((0.2, 0.8, 0.3), ks=0.5, shininess=40.0)),
        sphere((0.0, 0.9, -0.6), 0.5, _mat((0.25, 0.35, 0.9), ks=0.6, shininess=60.0)),
        sphere((0.1, -0.5, 1.0), 0.35, _mat((0.9, 0.8, 0.2), ks=0.4, shininess=25.0)),
    ]
    plane = ground_plane(-1.1, 12.0, _mat((0.6, 0.6, 0.6), ka=0.15, kd=0.85))
    scene = Scene.make(
        spheres=merge_spheres(parts),
        rects=plane,
        lights=Lights(
            position=jnp.array([[4.0, 6.0, 4.0]], jnp.float32),
            color=jnp.array([[1.0, 1.0, 1.0]], jnp.float32),
        ),
        camera=Camera.make((0.0, 1.0, 5.0), (0.0, 0.0, 0.0), fov_deg=55.0),
    )
    spec = (
        ParamSpec.none(scene)
        .train("spheres.center", lower=-3.0, upper=3.0)
        .train("spheres.radius", lower=0.15, upper=2.0)
        .train("spheres.material.color", lower=0.0, upper=1.0)
    )
    cfg = RenderConfig(height=size, width=size, shadows=True)
    return scene, spec, cfg


def config3_multi_light(size: int = 256):
    """Config 3: multi-light scene with shadow rays, 256^2; optimize light
    position + materials."""
    parts = [
        sphere((-0.9, -0.1, 0.0), 0.6, _mat((0.85, 0.3, 0.25), ks=0.4, shininess=35.0)),
        sphere((0.9, 0.0, -0.4), 0.7, _mat((0.25, 0.45, 0.85), ks=0.4, shininess=35.0)),
        sphere((0.0, 0.8, 0.6), 0.4, _mat((0.3, 0.8, 0.35), ks=0.5, shininess=50.0)),
    ]
    plane = ground_plane(-0.8, 14.0, _mat((0.55, 0.55, 0.58), ka=0.15, kd=0.85))
    scene = Scene.make(
        spheres=merge_spheres(parts),
        rects=plane,
        lights=Lights(
            position=jnp.array([[4.0, 5.0, 3.0], [-4.0, 4.0, 1.5]], jnp.float32),
            color=jnp.array([[0.8, 0.75, 0.7], [0.35, 0.4, 0.5]], jnp.float32),
        ),
        camera=Camera.make((0.0, 1.2, 5.0), (0.0, 0.0, 0.0), fov_deg=55.0),
    )
    spec = (
        ParamSpec.none(scene)
        .train("lights.position", lower=-8.0, upper=8.0)
        .train("spheres.material.color", lower=0.0, upper=1.0)
        .train("spheres.material.ks", lower=0.0, upper=1.0)
        .train("spheres.material.kd", lower=0.0, upper=1.0)
    )
    cfg = RenderConfig(height=size, width=size, shadows=True)
    return scene, spec, cfg


def config4_checker_camera(size: int = 512):
    """Config 4: textured/checker materials + camera-pose optimization, 512^2."""
    parts = [
        sphere(
            (-0.9, 0.0, 0.0),
            0.65,
            _mat((0.9, 0.25, 0.2), color2=(0.95, 0.9, 0.85), checker=1.0,
                 checker_scale=4.0, ks=0.4, shininess=40.0),
        ),
        sphere((0.95, 0.1, -0.3), 0.6, _mat((0.2, 0.5, 0.9), ks=0.5, shininess=60.0)),
    ]
    plane = ground_plane(
        -0.75,
        14.0,
        _mat((0.85, 0.85, 0.85), color2=(0.15, 0.15, 0.18), checker=1.0,
             checker_scale=18.0, ka=0.15, kd=0.85),
    )
    scene = Scene.make(
        spheres=merge_spheres(parts),
        rects=plane,
        lights=Lights(
            position=jnp.array([[4.0, 6.0, 4.0]], jnp.float32),
            color=jnp.array([[1.0, 1.0, 1.0]], jnp.float32),
        ),
        camera=Camera.make((0.3, 1.3, 4.6), (0.0, 0.0, 0.0), fov_deg=55.0),
    )
    spec = (
        ParamSpec.none(scene)
        .train("camera.eye", lower=-10.0, upper=10.0)
        .train("camera.look_at", lower=-5.0, upper=5.0)
        .train("spheres.material.color", lower=0.0, upper=1.0)
        .train("spheres.material.color2", lower=0.0, upper=1.0)
    )
    cfg = RenderConfig(height=size, width=size, shadows=True)
    return scene, spec, cfg


def config5_many_spheres(size: int = 1024, n_spheres: int = 64, seed: int = 0):
    """Config 5: 64-sphere scene, 1024^2, rays sharded across the mesh;
    full joint inverse render (centers+radii+albedos+light)."""
    rng = np.random.default_rng(seed)
    # Deterministic jittered grid of spheres in an 8x8 arrangement.
    g = int(np.ceil(np.sqrt(n_spheres)))
    centers, radii, colors = [], [], []
    for k in range(n_spheres):
        gx, gz = k % g, k // g
        x = (gx - (g - 1) / 2) * 1.1 + rng.uniform(-0.2, 0.2)
        z = (gz - (g - 1) / 2) * 1.1 + rng.uniform(-0.2, 0.2)
        y = rng.uniform(-0.1, 0.45)
        centers.append((x, y, z))
        radii.append(rng.uniform(0.28, 0.5))
        colors.append(rng.uniform(0.15, 0.95, size=3))
    parts = [
        sphere(c, r, _mat(col, ks=0.35, shininess=40.0))
        for c, r, col in zip(centers, radii, colors)
    ]
    plane = ground_plane(-0.6, 30.0, _mat((0.6, 0.6, 0.62), ka=0.15, kd=0.85))
    scene = Scene.make(
        spheres=merge_spheres(parts),
        rects=plane,
        lights=Lights(
            position=jnp.array([[6.0, 12.0, 6.0]], jnp.float32),
            color=jnp.array([[1.0, 1.0, 1.0]], jnp.float32),
        ),
        camera=Camera.make((0.0, 7.0, 9.5), (0.0, 0.0, 0.0), fov_deg=60.0),
    )
    spec = (
        ParamSpec.none(scene)
        .train("spheres.center", lower=-8.0, upper=8.0)
        .train("spheres.radius", lower=0.15, upper=1.0)
        .train("spheres.material.color", lower=0.0, upper=1.0)
        .train("lights.position", lower=-16.0, upper=16.0)
    )
    cfg = RenderConfig(height=size, width=size, shadows=True)
    return scene, spec, cfg


def config6_mirror(size: int = 512):
    """Config 6 (extension beyond the driver set): mirror reflections.

    A chrome-ish sphere and a diffuse sphere over a checkered,
    slightly-reflective floor, rendered with RenderConfig.reflections=1.
    The inverse render recovers every object's mirror coefficient from a
    large (30%) perturbation — the gradient path runs THROUGH the bounce.
    Geometry gradients through reflections are exact too (FD-validated in
    tests/test_reflections.py), but center recovery at hard semantics sits
    in the same no-silhouette-gradient valley as configs 1-5 (see
    docs/OPTIMIZATION_NOTES.md) and soft_tau is reflections-exclusive by
    design, so the optimization demo trains the mirror fields.
    """
    parts = [
        sphere(
            (-0.55, 0.05, 0.0),
            0.85,
            _mat((0.55, 0.56, 0.6), ka=0.08, kd=0.25, ks=0.5, shininess=80.0,
                 mirror=0.65),
        ),
        sphere(
            (1.25, -0.15, -0.9),
            0.65,
            _mat((0.2, 0.55, 0.9), ks=0.3, shininess=40.0),
        ),
    ]
    plane = ground_plane(
        -0.8,
        14.0,
        _mat((0.85, 0.85, 0.85), color2=(0.12, 0.12, 0.14), checker=1.0,
             checker_scale=16.0, ka=0.15, kd=0.8, mirror=0.18),
    )
    scene = Scene.make(
        spheres=merge_spheres(parts),
        rects=plane,
        lights=Lights(
            position=jnp.array([[4.0, 6.0, 4.0]], jnp.float32),
            color=jnp.array([[1.0, 1.0, 1.0]], jnp.float32),
        ),
        camera=Camera.make((0.2, 1.1, 4.4), (0.0, 0.0, 0.0), fov_deg=55.0),
    )
    spec = (
        ParamSpec.none(scene)
        .train("spheres.material.mirror", lower=0.0, upper=0.95)
        .train("rects.material.mirror", lower=0.0, upper=0.95)
    )
    cfg = RenderConfig(height=size, width=size, shadows=True, reflections=1)
    return scene, spec, cfg


def config7_texture(size: int = 512, tex_k: int = 16, seed: int = 0):
    """Config 7 (extension beyond the driver set): texture recovery.

    A glossy sphere over a floor carrying a (tex_k, tex_k, 3) image
    texture (bilinearly sampled, `Rects.texture`). The inverse render
    optimizes the texel grid itself — 3*tex_k^2 parameters (768 at the
    default 16), an order of magnitude more than any driver config — from
    a noise-perturbed start. Every visible texel receives a direct,
    piecewise-linear gradient through the bilinear weights, so recovery
    is near-exact wherever the floor is visible and unshadowed; occluded
    texels keep their start value (no signal — the test masks them).
    Renders via the jnp paths (impl='auto' routes; the SMEM-scalar Pallas
    kernels refuse texel grids by design).
    """
    rng = np.random.default_rng(seed)
    # Deterministic smooth-ish RGB pattern: low-frequency gradients plus
    # a few random blobs — recognizable in artifacts, not adversarial.
    ii, jj = np.meshgrid(np.linspace(0, 1, tex_k), np.linspace(0, 1, tex_k),
                         indexing="ij")
    tex = np.stack([
        0.25 + 0.6 * ii,
        0.25 + 0.6 * jj,
        0.5 + 0.4 * np.sin(6.0 * ii) * np.cos(4.0 * jj),
    ], axis=-1)
    for _ in range(4):
        ci, cj = rng.uniform(0.15, 0.85, size=2)
        r2 = (ii - ci) ** 2 + (jj - cj) ** 2
        tex += rng.uniform(-0.35, 0.35, size=3) * np.exp(-r2 / 0.02)[..., None]
    tex = np.clip(tex, 0.05, 0.95).astype(np.float32)

    s = sphere(
        (0.4, 0.1, 0.3),
        0.75,
        _mat((0.85, 0.3, 0.25), ks=0.45, shininess=50.0),
    )
    plane = ground_plane(
        -0.7, 4.5,
        _mat((1.0, 1.0, 1.0), ka=0.2, kd=0.85),
        texture=tex,
    )
    scene = Scene.make(
        spheres=s,
        rects=plane,
        lights=Lights(
            position=jnp.array([[3.0, 7.0, 4.0]], jnp.float32),
            color=jnp.array([[1.0, 1.0, 1.0]], jnp.float32),
        ),
        # Elevated, tilted view so most of the textured floor is visible.
        camera=Camera.make((0.0, 4.2, 5.2), (0.0, -0.7, 0.0), fov_deg=55.0),
    )
    spec = ParamSpec.none(scene).train("rects.texture", lower=0.0, upper=1.0)
    cfg = RenderConfig(height=size, width=size, shadows=True)
    return scene, spec, cfg


def config8_globe(size: int = 512, tex_k: int = 16, seed: int = 0):
    """Config 8 (extension beyond the driver set): sphere-texture recovery.

    A "globe" — a sphere carrying a (tex_k, tex_k, 3) lat-long image
    texture (`Spheres.texture`, sampled via `pipeline.sphere_uv`: azimuth
    wraps at the atan2 seam, polar clamps) — over a plain floor. The
    inverse render recovers the texel grid itself from a noise-perturbed
    start. Only the camera-facing hemisphere's texels receive gradient
    (the far side is invisible — no signal), so recovery tests mask by
    texel visibility like config 7 masks occluded floor texels. Renders
    via the jnp paths (impl='auto' routes; the SMEM-scalar Pallas kernels
    refuse texel grids by design).
    """
    rng = np.random.default_rng(seed)
    # Continent-ish blobs on an ocean gradient: recognizable in artifacts,
    # smooth enough that bilinear sampling resolves it at K=16.
    ii, jj = np.meshgrid(np.linspace(0, 1, tex_k), np.linspace(0, 1, tex_k),
                         indexing="ij")
    tex = np.stack([
        0.15 + 0.1 * jj,
        0.25 + 0.25 * ii,
        0.55 + 0.3 * jj,
    ], axis=-1)
    for _ in range(5):
        ci, cj = rng.uniform(0.1, 0.9, size=2)
        r2 = (ii - ci) ** 2 + (jj - cj) ** 2
        tex += np.array([0.35, 0.3, -0.25]) * np.exp(-r2 / 0.015)[..., None]
    tex = np.clip(tex, 0.05, 0.95).astype(np.float32)

    globe = sphere(
        (0.0, 0.3, 0.0),
        1.1,
        _mat((1.0, 1.0, 1.0), ka=0.25, kd=0.9, ks=0.25, shininess=40.0),
        texture=tex,
    )
    floor = ground_plane(-0.9, 5.0, _mat((0.75, 0.75, 0.78), ka=0.2, kd=0.8))
    scene = Scene.make(
        spheres=globe,
        rects=floor,
        lights=Lights(
            position=jnp.array([[3.5, 5.0, 4.0]], jnp.float32),
            color=jnp.array([[1.0, 1.0, 1.0]], jnp.float32),
        ),
        camera=Camera.make((0.0, 0.9, 3.6), (0.0, 0.1, 0.0), fov_deg=50.0),
    )
    spec = ParamSpec.none(scene).train("spheres.texture", lower=0.0, upper=1.0)
    cfg = RenderConfig(height=size, width=size, shadows=True)
    return scene, spec, cfg


def config9_sky(size: int = 512, env_k: int = 16, seed: int = 0):
    """Config 9 (extension beyond the driver set): environment-map ("sky")
    recovery.

    A chrome-ish mirror sphere over a floor under a (env_k, env_k, 3)
    lat-long environment map (`Scene.env` — sampled by missed-ray
    direction, azimuth wraps). The inverse render recovers the sky's
    texel grid from a perturbed start: miss pixels give DIRECT bilinear
    gradients into the visible sky band, and the mirror sphere adds
    signal from directions behind the camera (the reflected rays' misses
    sample the env too). Texels no ray reaches keep their start value.
    Renders via the jnp paths (impl='auto' routes textured scenes there).
    """
    rng = np.random.default_rng(seed)
    ii, jj = np.meshgrid(np.linspace(0, 1, env_k), np.linspace(0, 1, env_k),
                         indexing="ij")
    # Sky-ish vertical gradient (jj is the polar axis via the lat-long
    # convention: texture axis 0 = azimuth, axis 1 = polar) + sun blobs.
    env = np.stack([
        0.2 + 0.15 * ii,
        0.3 + 0.2 * jj,
        0.6 + 0.3 * (1.0 - jj),
    ], axis=-1)
    for _ in range(3):
        ci, cj = rng.uniform(0.1, 0.9, size=2)
        r2 = (ii - ci) ** 2 + (jj - cj) ** 2
        env += np.array([0.5, 0.4, 0.1]) * np.exp(-r2 / 0.01)[..., None]
    env = np.clip(env, 0.05, 0.95).astype(np.float32)

    chrome = sphere(
        (0.0, 0.1, 0.0),
        0.9,
        _mat((0.9, 0.9, 0.9), ka=0.1, kd=0.3, ks=0.5, shininess=80.0,
             mirror=0.7),
    )
    floor = ground_plane(-0.8, 4.5, _mat((0.55, 0.5, 0.45), ka=0.2, kd=0.8))
    scene = Scene.make(
        spheres=chrome,
        rects=floor,
        lights=Lights(
            position=jnp.array([[3.0, 6.0, 3.0]], jnp.float32),
            color=jnp.array([[1.0, 1.0, 1.0]], jnp.float32),
        ),
        camera=Camera.make((0.0, 0.6, 3.8), (0.0, 0.1, 0.0), fov_deg=55.0),
        env=env,
    )
    spec = ParamSpec.none(scene).train("env", lower=0.0, upper=1.0)
    cfg = RenderConfig(height=size, width=size, shadows=True, reflections=1)
    return scene, spec, cfg


def config10_chrome_field(size: int = 512, n_spheres: int = 64,
                          env_k: int = 16, seed: int = 0):
    """Config 10 (round-3 showcase): a FIELD of 64 chrome spheres under a
    sky — the vec-scale env+reflections capability in one scene.

    Every sphere carries a per-object mirror coefficient; the inverse
    render recovers the mirror coefficients AND the sky texels jointly
    from a perturbed start. On TPU the whole training step runs in ONE
    object-chunked fused kernel launch (env rides the SMEM globals plan,
    bounce levels rerun the O(1)-compile loops — 3.7 ms/step at 512^2 on
    v5e vs the ~300 ms XLA class that round 2 would have used, since the
    vec kernels then refused both env maps and reflections).
    """
    rng = np.random.default_rng(seed)
    g = int(np.ceil(np.sqrt(n_spheres)))
    parts = []
    for k in range(n_spheres):
        gx, gz = k % g, k // g
        x = (gx - (g - 1) / 2) * 1.1 + rng.uniform(-0.2, 0.2)
        z = (gz - (g - 1) / 2) * 1.1 + rng.uniform(-0.2, 0.2)
        y = rng.uniform(-0.1, 0.45)
        parts.append(sphere(
            (x, y, z), rng.uniform(0.28, 0.5),
            _mat(rng.uniform(0.3, 0.9, size=3), ka=0.1, kd=0.35, ks=0.4,
                 shininess=60.0, mirror=float(rng.uniform(0.3, 0.8))),
        ))
    floor = ground_plane(-0.6, 30.0, _mat((0.5, 0.5, 0.52), ka=0.15, kd=0.85))
    # Same procedural sky as config 9 (gradient + sun blobs).
    ii, jj = np.meshgrid(np.linspace(0, 1, env_k), np.linspace(0, 1, env_k),
                         indexing="ij")
    env = np.stack([
        0.2 + 0.15 * ii,
        0.3 + 0.2 * jj,
        0.6 + 0.3 * (1.0 - jj),
    ], axis=-1)
    for _ in range(3):
        ci, cj = rng.uniform(0.1, 0.9, size=2)
        r2 = (ii - ci) ** 2 + (jj - cj) ** 2
        env += np.array([0.5, 0.4, 0.1]) * np.exp(-r2 / 0.01)[..., None]
    env = np.clip(env, 0.05, 0.95).astype(np.float32)
    scene = Scene.make(
        spheres=merge_spheres(parts),
        rects=floor,
        lights=Lights(
            position=jnp.array([[6.0, 12.0, 6.0]], jnp.float32),
            color=jnp.array([[1.0, 1.0, 1.0]], jnp.float32),
        ),
        camera=Camera.make((0.0, 7.0, 9.5), (0.0, 0.0, 0.0), fov_deg=60.0),
        env=env,
    )
    spec = (
        ParamSpec.none(scene)
        .train("spheres.material.mirror", lower=0.0, upper=1.0)
        .train("env", lower=0.0, upper=1.0)
    )
    cfg = RenderConfig(height=size, width=size, shadows=True, reflections=1)
    return scene, spec, cfg


CONFIGS = {
    1: config1_single_sphere,
    2: config2_four_spheres,
    3: config3_multi_light,
    4: config4_checker_camera,
    5: config5_many_spheres,
    6: config6_mirror,
    7: config7_texture,
    8: config8_globe,
    9: config9_sky,
    10: config10_chrome_field,
}


def perturb(scene: Scene, spec: ParamSpec, scale: float = 0.25, seed: int = 0) -> Scene:
    """Additive-noise perturbation of the trainable leaves (the starting
    point of the inverse render). Noise magnitude is `scale` x leaf std-dev
    (or `scale` absolute for near-constant leaves), clipped to bounds."""
    leaves, treedef = jax.tree_util.tree_flatten(scene)
    tr = jax.tree_util.tree_leaves(spec.trainable)
    lo = jax.tree_util.tree_leaves(spec.lower)
    hi = jax.tree_util.tree_leaves(spec.upper)
    rng = np.random.default_rng(seed)
    out = []
    for leaf, t, l, h in zip(leaves, tr, lo, hi):
        if not bool(t):
            out.append(leaf)
            continue
        mag = max(float(jnp.std(leaf)), 1.0) * scale
        noise = rng.normal(0.0, mag, size=leaf.shape).astype(np.float32)
        out.append(jnp.clip(leaf + noise, l, h))
    return jax.tree_util.tree_unflatten(treedef, out)
