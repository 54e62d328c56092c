"""reversible_raytracer_tpu — a TPU-native differentiable raytracer.

Brand-new JAX/XLA/Pallas framework with the capability surface of
`lebek/reversible-raytracer` (a single-process Theano inverse renderer),
redesigned TPU-first. See SURVEY.md for the blueprint and README.md for the
architecture tour.
"""

from .models.scene import (
    Camera,
    Lights,
    Materials,
    ParamSpec,
    Rects,
    Scene,
    Spheres,
    ground_plane,
    lights,
    merge_rects,
    merge_spheres,
    rect,
    sphere,
)
from .ops.pipeline import RenderConfig
from .ops.render import mse_loss, render, render_jnp, sum_squared_loss

__version__ = "0.1.0"

__all__ = [
    "Camera",
    "Lights",
    "Materials",
    "ParamSpec",
    "Rects",
    "RenderConfig",
    "Scene",
    "Spheres",
    "ground_plane",
    "lights",
    "merge_rects",
    "merge_spheres",
    "mse_loss",
    "rect",
    "render",
    "render_jnp",
    "sphere",
    "sum_squared_loss",
]
