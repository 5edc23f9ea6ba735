from . import datasets, pipeline  # noqa: F401
