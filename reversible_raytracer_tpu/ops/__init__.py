from .pipeline import RenderConfig  # noqa: F401
from .render import mse_loss, render, render_jnp, sum_squared_loss  # noqa: F401
