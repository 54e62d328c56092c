"""vecmath.atan2 / vecmath.asin — the Mosaic-lowerable replacements for
jnp.arctan2 / jnp.arcsin (Pallas TPU has no atan/atan2/asin lowering;
pipeline.sphere_uv uses these in EVERY path so kernel and jnp stay
bit-comparable). Branchless Cephes fold, ~2 ulp, NaN-free AD everywhere
(guarded denominators — the 0*NaN cotangent-poisoning trap)."""

import jax
import jax.numpy as jnp
import numpy as np

from reversible_raytracer_tpu.ops import vecmath as vm


def test_atan2_accuracy_full_plane():
    rng = np.random.default_rng(0)
    y = (rng.normal(size=50000) * 10).astype(np.float32)
    x = (rng.normal(size=50000) * 10).astype(np.float32)
    got = np.asarray(vm.atan2(jnp.asarray(y), jnp.asarray(x)))
    ref = np.arctan2(y.astype(np.float64), x.astype(np.float64))
    assert np.abs(got - ref).max() < 5e-7


def test_atan2_edge_cases():
    cases = [(0.0, 0.0), (0.0, 1.0), (0.0, -1.0), (1.0, 0.0), (-1.0, 0.0),
             (1e-30, -1.0), (-1e-30, -1.0)]
    for y, x in cases:
        got = float(vm.atan2(jnp.float32(y), jnp.float32(x)))
        ref = float(np.arctan2(np.float32(y), np.float32(x)))
        assert abs(got - ref) < 1e-6, (y, x, got, ref)


def test_asin_accuracy_and_pole_guard():
    rng = np.random.default_rng(1)
    t = np.clip(rng.normal(size=50000), -1 + 1e-6, 1 - 1e-6).astype(np.float32)
    got = np.asarray(vm.asin(jnp.asarray(t)))
    assert np.abs(got - np.arcsin(t.astype(np.float64))).max() < 5e-7
    # derivative stays finite right at the sphere_uv clip bound
    g = jax.grad(vm.asin)(jnp.float32(1.0 - 1e-6))
    assert np.isfinite(float(g))


def test_atan2_grads_finite_and_correct():
    # analytic: d/dy atan2(y,x) = x/(y^2+x^2), d/dx = -y/(y^2+x^2)
    for y, x in [(0.3, -0.7), (2.0, 0.1), (-1.5, -2.5), (0.0, 1.0)]:
        gy, gx = jax.grad(lambda v: vm.atan2(v[0], v[1]))(
            jnp.array([y, x], jnp.float32)
        )
        r2 = y * y + x * x
        assert abs(float(gy) - x / r2) < 1e-5
        assert abs(float(gx) - (-y / r2)) < 1e-5
    # the degenerate origin must not produce NaN (masked-out pixels still
    # propagate cotangents through both where-branches)
    g = jax.grad(lambda v: vm.atan2(v[0], v[1]))(jnp.zeros(2, jnp.float32))
    assert np.isfinite(np.asarray(g)).all()
