from . import layers, resnet, fpn, second, sparse_encoder  # noqa: F401
