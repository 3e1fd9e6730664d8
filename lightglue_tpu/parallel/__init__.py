from . import batching, mesh  # noqa: F401
