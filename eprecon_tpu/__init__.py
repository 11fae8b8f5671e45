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

__version__ = "0.3.0"

import os as _os

if _os.environ.get("EPRECON_PLATFORM"):
    # Force a jax platform (e.g. EPRECON_PLATFORM=cpu to debug on a machine
    # whose TPU plugin auto-registers at interpreter start): JAX_PLATFORMS
    # from the environment can be overridden by plugin registration hooks;
    # a config.update before first backend use cannot.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["EPRECON_PLATFORM"])

from eprecon_tpu.config import Config, default_config  # noqa: F401
