from . import anchors, coder, target_assign  # noqa: F401
