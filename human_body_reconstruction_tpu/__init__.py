"""TPU-native Human-Body-Reconstruction framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
RishabhSri14/Human-Body-Reconstruction (an Instant-NGP-style hash-encoded
NeRF pipeline for reconstructing a human body / object from video):

  capture (COLMAP poses)  ->  segmentation  ->  hash-grid NeRF training
  (occupancy grid, hierarchical sampling, optional SDF/eikonal)  ->
  marching-cubes mesh export.

Design stance (TPU-first, not a port):
  * pure functions over pytree parameters; everything in the hot path is
    jit-compiled with static shapes,
  * the multires hash encoder is a single batched gather over a stacked
    (L, T, F) table (optionally a fused Pallas kernel with the table
    resident in VMEM),
  * rays are generated on-device from (image, pixel) index batches --
    no host-side ray precompute (the reference materialises every ray of
    the dataset into host RAM, reference train_hash2.py:74-99),
  * occupancy culling is multiplicative masking (static shapes), not
    ragged boolean gathers (reference vol_renderer.py:211-216),
  * scaling is a 1-D jax.sharding.Mesh over the ray-batch axis with
    replicated parameters and psum gradient reduction.
"""

__version__ = "0.1.0"

from human_body_reconstruction_tpu.utils import config as config  # noqa: F401
