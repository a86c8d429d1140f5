from . import mesh, stats  # noqa: F401
