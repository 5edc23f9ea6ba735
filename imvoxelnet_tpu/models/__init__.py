from . import detector, fpn, necks3d, resnet  # noqa: F401
