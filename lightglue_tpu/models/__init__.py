from . import lightglue  # noqa: F401
