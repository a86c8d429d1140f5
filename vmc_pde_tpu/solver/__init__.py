from . import steppers, tdvp  # noqa: F401
