"""Sanitizer surface (utils/paranoid.py, SURVEY.md §5.2) — direct coverage
of checked_render (clean scene passes; poisoned scene is caught with a
named check) and the CLI --paranoid flag (VERDICT round-1 item #8)."""

import dataclasses

import jax
import numpy as np
import pytest

from reversible_raytracer_tpu.models import configs
from reversible_raytracer_tpu.utils.paranoid import checked_render, enable_nan_debugging


def test_checked_render_clean_scene():
    scene, _, cfg = configs.config1_single_sphere(32)
    err, img = checked_render(scene, cfg)
    err.throw()  # no error on a healthy scene
    assert np.isfinite(np.asarray(img)).all()


def test_checked_render_catches_nan_scene():
    scene, _, cfg = configs.config1_single_sphere(32)
    bad = dataclasses.replace(
        scene,
        ambient=jax.numpy.asarray([np.nan, 1.0, 1.0], jax.numpy.float32),
    )
    err, _ = checked_render(bad, cfg)
    with pytest.raises(Exception, match="nan|non-finite"):
        err.throw()


def test_cli_paranoid_flag(tmp_path):
    from reversible_raytracer_tpu.cli import main

    main([
        "invert", "--config", "1", "--size", "24", "--iters", "3",
        "--perturb", "0.05", "--paranoid", "--log-every", "0",
    ])
    # --paranoid leaves jax_debug_nans enabled by design; reset for the
    # rest of the suite.
    enable_nan_debugging(False)
