"""DeepInteraction-TPU: a TPU-native (JAX/XLA/Pallas) camera+LiDAR 3D detection framework.

A from-scratch rebuild of the capabilities of fudan-zvg/DeepInteraction
(NeurIPS 2022) and DeepInteraction++ (TPAMI 2025) designed for TPU hardware:

- static-shape, fully jittable forward graph (no host round-trips)
- hard voxelization as sort/segment XLA ops instead of CUDA spconv
- MMRI bilateral fusion encoder with masked fixed-K attention instead of
  dynamic bucketed attention
- MMPI query decoder with vmapped per-view blocks instead of Python loops
- data parallelism via jax.sharding.Mesh + pjit instead of NCCL DDP
"""

__version__ = "0.1.0"
