"""nnuzoo_tpu — TPU-native (JAX / Flax / pjit / Pallas) medical image segmentation
framework with the capabilities of nnUZoo (nnU-Net v2 model-zoo fork).

Re-designed TPU-first, not a port: device compute is jitted JAX/Flax with Pallas
kernels for the Mamba selective scan; multi-chip scaling is jax.sharding over a
device Mesh; host-side IO/preprocessing is numpy/scipy.

Reference behavior documented in SURVEY.md; reference snapshot: nnUZoo @ 2025-08-24.
"""

__version__ = "0.1.0"
