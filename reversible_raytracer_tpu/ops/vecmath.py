"""Structure-of-arrays 3-vector math.

TPU-native design note: the reference (lebek/reversible-raytracer, a Theano
program — see SURVEY.md §1 L1/C1; the mount at /root/reference was empty, so
citations are capability-level) stores rays as (H, W, 3) tensors and reduces
over the trailing size-3 axis. On TPU the trailing axis is the 128-lane VPU
dimension, so a size-3 trailing axis wastes 125/128 lanes. We instead keep
each vector *component* as its own (H, W)-shaped array ("structure of
arrays"), so every elementwise op is a full-width (8, 128)-tiled VPU op.

A Vec3 is simply a tuple ``(x, y, z)`` of equally-shaped (or broadcastable)
jnp/np arrays. All helpers are backend-agnostic: they work on jax tracers
(inside jit, shard_map, or a Pallas kernel body) and on numpy arrays alike.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Vec3 = tuple  # (x, y, z) of arrays


def v3(x, y, z) -> Vec3:
    return (x, y, z)


def splat(v) -> Vec3:
    """Turn a length-3 array (e.g. a scene-parameter row) into a Vec3 of
    scalars, which then broadcast against (H, W) pixel arrays for free."""
    return (v[0], v[1], v[2])


def vadd(a: Vec3, b: Vec3) -> Vec3:
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def vsub(a: Vec3, b: Vec3) -> Vec3:
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def vscale(a: Vec3, s) -> Vec3:
    return (a[0] * s, a[1] * s, a[2] * s)


def vmul(a: Vec3, b: Vec3) -> Vec3:
    """Hadamard product (used for color * color)."""
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


def vneg(a: Vec3) -> Vec3:
    return (-a[0], -a[1], -a[2])


def vdot(a: Vec3, b: Vec3):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def vcross(a: Vec3, b: Vec3) -> Vec3:
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def vnorm(a: Vec3):
    return jnp.sqrt(vdot(a, a))


def vnormalize(a: Vec3, eps: float = 1e-12) -> Vec3:
    """Safe normalize: guards the rsqrt so reverse-mode AD at a (never-taken)
    zero vector cannot poison gradients with NaN (SURVEY.md §7 'grazing-ray
    numerics': both branches of a `where` are differentiated)."""
    n2 = vdot(a, a)
    inv = jax.lax.rsqrt(jnp.where(n2 > eps, n2, 1.0))
    return vscale(a, inv)


def vwhere(mask, a: Vec3, b: Vec3) -> Vec3:
    return (
        jnp.where(mask, a[0], b[0]),
        jnp.where(mask, a[1], b[1]),
        jnp.where(mask, a[2], b[2]),
    )


def vbroadcast(a: Vec3, shape) -> Vec3:
    return (
        jnp.broadcast_to(a[0], shape),
        jnp.broadcast_to(a[1], shape),
        jnp.broadcast_to(a[2], shape),
    )


def safe_sqrt(x, guard=1.0):
    """sqrt with NaN-free reverse-mode at/below zero.

    ``sqrt(where(x > 0, x, guard))`` — the classic JAX pattern: the plain
    ``where(x > 0, sqrt(x), 0)`` still produces NaN cotangents because both
    branches are evaluated under AD.
    """
    return jnp.sqrt(jnp.where(x > 0.0, x, guard))


def safe_pow(x, p):
    """x ** p for x possibly <= 0, with zero value and zero gradient there.

    Matches the subgradient convention of clamping (``max(r.v, 0) ** alpha``
    in Phong shading): at x <= 0 both the value and the incoming gradient are
    zero, exactly as Theano's switch-based formulation yields.

    Implemented as exp(p * log(x)) — Mosaic (the Pallas TPU compiler) has no
    `powf` lowering, but exp/log are native transcendentals.
    """
    safe_x = jnp.where(x > 0.0, x, 1.0)
    return jnp.where(x > 0.0, jnp.exp(p * jnp.log(safe_x)), 0.0)


# Cephes atanf minimax coefficients for atan(r), r in [0, 1] after the
# tan(pi/8) fold below: atan(r) ~= r + r^3 * P(r^2), ~1-2 ulp in f32.
_ATAN_P = (8.05374449538e-2, -1.38776856032e-1, 1.99777106478e-1,
           -3.33329491539e-1)

_TAN_PI_8 = 0.4142135623730951  # tan(pi/8): the Cephes fold point


def _atan_01(r):
    """atan of r in [0, 1] (branchless Cephes fold): for r above tan(pi/8)
    use atan(r) = pi/4 + atan((r-1)/(r+1)), whose argument lies back in
    [-0.1716, 0.1716]; then the odd minimax polynomial. All elementary
    mul/add/div/select — lowers in Mosaic (no atan/atan2 primitive there,
    see pallas/mosaic/lowering.py: only tan/tanh are registered)."""
    fold = r > _TAN_PI_8
    x = jnp.where(fold, (r - 1.0) / (r + 1.0), r)
    z = x * x
    p = _ATAN_P[0]
    for c in _ATAN_P[1:]:
        p = p * z + c
    y = p * z * x + x
    return jnp.where(fold, y + jnp.pi / 4, y)


def atan2(y, x):
    """Branchless, overflow-free, Mosaic-lowerable arctan2.

    Octant-reduced: feed `_atan_01` the ratio min/max of |x|,|y| (always in
    [0, 1], guarded denominator so no inf/NaN ever appears in EITHER branch
    of a where — the 0*NaN cotangent-poisoning trap), then unfold swap /
    x-sign / y-sign. atan2(0, 0) = 0 (numpy convention). Max error ~2 ulp
    f32 vs the libm atan2 the jnp/XLA paths would otherwise call — the
    pipeline uses THIS everywhere (sphere_uv) so the jnp path and the
    Pallas kernel trace identical math and stay bit-comparable.

    Signed-zero deviation from numpy: the final sign select compares
    ``y < 0.0``, which is False for y = -0.0, so atan2(-0.0, x<0) returns
    +pi where ``jnp.arctan2`` returns -pi. Harmless for `sphere_uv` (the
    azimuth wraps: u = 1.0 and u = 0.0 address the same texel), and
    deliberately NOT fixed with `signbit`: Mosaic has no signbit/bitcast
    lowering on the f32 vector path, and a where-on-signbit would be dead
    weight in every kernel for a convention no caller depends on.
    """
    ax, ay = jnp.abs(x), jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    r = lo / jnp.where(hi > 0.0, hi, 1.0)
    a = _atan_01(r)
    a = jnp.where(ay > ax, jnp.pi / 2 - a, a)
    a = jnp.where(x < 0.0, jnp.pi - a, a)
    return jnp.where(y < 0.0, -a, a)


def asin(t):
    """Mosaic-lowerable arcsin via atan2(t, sqrt((1-t)(1+t))).

    Callers must keep |t| strictly below 1 (sphere_uv clips to 1 - 1e-6) so
    the sqrt argument stays positive and its derivative finite; the guard
    in `safe_sqrt` protects the cotangent if they don't.
    """
    return atan2(t, safe_sqrt((1.0 - t) * (1.0 + t), guard=1.0))
