"""CAP4D-TPU: a TPU-native (JAX/XLA/Pallas) avatar framework.

Re-implements the capabilities of the CAP4D reference (hitminxuanwang/cap4d):
  1. MMDM — morphable multi-view latent diffusion for novel-view /
     novel-expression face image generation (reference: cap4d/mmdm/*).
  2. Rigged 3D Gaussian-splatting avatar fitting (reference: gaussianavatars/*).
  3. Animation / export of fitted avatars (reference: gaussianavatars/animate.py).

Architecture is TPU-first: functional JAX core over parameter pytrees,
Flax linen modules for networks, Pallas kernels for the hot ops
(flash attention, triangle rasterization, 3DGS splatting), `jax.sharding`
meshes for multi-chip scaling. Host-side IO (images, video, PLY) stays in
numpy and keeps the reference's on-disk formats (fit.npz,
reference_images.json, flame/*.npz, exported_animation.ply).
"""

__version__ = "0.1.0"
