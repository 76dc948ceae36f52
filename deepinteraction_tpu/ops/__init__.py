from .voxelize import voxelize, hard_simple_vfe, VoxelizedOutput

__all__ = ["voxelize", "hard_simple_vfe", "VoxelizedOutput"]
