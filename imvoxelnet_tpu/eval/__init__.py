from . import indoor_eval  # noqa: F401
