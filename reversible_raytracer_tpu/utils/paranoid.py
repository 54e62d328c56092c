"""Numerical sanitizers (SURVEY.md §5.2).

The reference's equivalents were Theano's NanGuardMode/DebugMode (unused
in-repo). TPU-native version:

- ``enable_nan_debugging()``  — global `jax_debug_nans` (XLA re-runs the
  offending op un-jitted and raises at the op that produced the NaN);
- ``checked_render``          — `checkify`-instrumented jnp render that
  *returns* NaN/Inf findings instead of silently propagating them;
- interpret-mode Pallas comparisons (tests/test_cli_and_io.py) act as the
  kernel sanitizer — no shared-memory races exist by construction (pure
  functional; XLA owns all buffers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from ..models.scene import Scene
from ..ops.pipeline import RenderConfig
from ..ops.render import render_jnp


def enable_nan_debugging(on: bool = True) -> None:
    jax.config.update("jax_debug_nans", on)


def checked_render(scene: Scene, cfg: RenderConfig):
    """Render with float checks; returns (error, image). `error.throw()`
    raises with a message naming the failed check."""

    def f(scene):
        img = render_jnp(scene, cfg)
        checkify.check(jnp.isfinite(img).all(), "non-finite pixels in render")
        return img

    checked = checkify.checkify(f, errors=checkify.float_checks)
    return checked(scene)
