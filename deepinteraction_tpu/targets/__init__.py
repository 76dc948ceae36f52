from .coder import TransFusionBBoxCoder

__all__ = ["TransFusionBBoxCoder"]
