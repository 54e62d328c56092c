"""Native C++ oracle (native/oracle.cpp via ctypes) vs the numpy oracle:
identical float64 math, ~3 orders of magnitude faster at config-5 scale."""

import numpy as np
import pytest

from reversible_raytracer_tpu.models import configs
from reversible_raytracer_tpu.oracle import native, reference_np

pytestmark = pytest.mark.skipif(not native.available(), reason="native oracle not built")


@pytest.mark.parametrize("num,size", [(1, 48), (2, 64), (3, 64), (4, 64)])
def test_native_matches_numpy(num, size):
    scene, _, _ = configs.CONFIGS[num](size)
    a = reference_np.render(scene, size, size)
    b = native.render(scene, size, size)
    assert np.abs(a - b).max() < 1e-10


def test_native_matches_numpy_config5():
    scene, _, _ = configs.config5_many_spheres(64, n_spheres=16)
    a = reference_np.render(scene, 64, 64)
    b = native.render(scene, 64, 64)
    assert np.abs(a - b).max() < 1e-10


def test_native_matches_jnp_large():
    """Use the native oracle where numpy would be too slow: full 64-sphere
    fidelity check of the jnp pipeline at 128^2."""
    import jax

    from reversible_raytracer_tpu.ops.pipeline import RenderConfig
    from reversible_raytracer_tpu.ops.render import render_jnp

    scene, _, _ = configs.config5_many_spheres(128)
    cfg = RenderConfig(height=128, width=128, shadows=True)
    img = np.asarray(jax.jit(lambda s: render_jnp(s, cfg))(scene))
    ref = native.render(scene, 128, 128)
    err = np.abs(img - ref)
    assert float((err > 2e-3).mean()) < 1e-3
    assert float(err.mean()) < 2e-4


def test_native_soft_checker_matches_numpy():
    """Soft checker (checker_tau, ABI v2): the C++ and numpy f64 oracles
    implement the identical formula — agreement to f64 noise on the
    checkered config-4 scene."""
    scene, _, _ = configs.CONFIGS[4](64)
    for tau in (0.05, 0.5):
        a = reference_np.render(scene, 64, 64, checker_tau=tau)
        b = native.render(scene, 64, 64, checker_tau=tau)
        assert np.abs(a - b).max() < 1e-10, tau
