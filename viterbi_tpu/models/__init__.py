from . import dab  # noqa: F401
