"""EPRecon-TPU: a TPU-native framework for real-time panoptic 3D reconstruction.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of EPRecon
(arXiv 2409.01807, reference implementation in PyTorch/CUDA): incremental
panoptic TSDF reconstruction from posed monocular keyframe fragments.

Layout:
  config    — typed dataclass config tree (reference: config/default.py)
  ops       — TPU compute primitives: voxel grids, camera projection,
              back-projection, static-shape sparse-conv engine, TSDF fusion
  models    — flax modules: MNASNet-FPN backbone, occupancy init, SPVCNN,
              GRU fusion, Mask2Former-style panoptic decoder
  data      — fragment data model, ScanNet pipeline, synthetic scenes
  train     — losses, train state, pjit data-parallel training loop
  parallel  — device mesh / sharding helpers
  inference — streaming incremental reconstruction + mesh export
"""

__version__ = "0.1.0"

from eprecon_tpu.config import Config, default_config  # noqa: F401
