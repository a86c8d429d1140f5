from . import evolution, score  # noqa: F401
