from . import (  # noqa: F401
    decoder,
    detector,
    fpn,
    layers,
    mmri_encoder,
    resnet,
    second,
    sparse_encoder,
    swin,
)
