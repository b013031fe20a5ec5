"""gaussmart_tpu — TPU-native 2D Gaussian Splatting (GauSSmart) framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
GauSSmart reference (2DGS training + surface reconstruction + semantic
densification). The compute path is functional JAX compiled by XLA; the hot
rasterization kernel has a Pallas TPU implementation; scale-out uses
``jax.sharding`` meshes instead of per-process CUDA devices.

Layer map (mirrors reference layers, re-architected TPU-first):
  ops/        - SH eval, SSIM, image metrics, KNN init, depth->normal
  render/     - differentiable 2DGS surfel rasterizer (dense oracle + Pallas)
  models/     - GaussianState pytree (fixed capacity), densify/prune
  optim       - sparse-aware Adam with per-group LRs and state surgery
  io/         - COLMAP / PLY / Blender readers, checkpointing
  mesh/       - TSDF fusion + marching cubes (bounded & unbounded)
  semantics/  - hull removal, view clustering, segment projection, DINO
  parallel/   - device-mesh sharding for camera-DP / pixel-sharded rendering
  eval/       - PSNR/SSIM/LPIPS metrics CLI, DTU chamfer, TnT F-score
  viewer/     - network GUI protocol server
"""

__version__ = "0.1.0"
