from . import reference_np  # noqa: F401
