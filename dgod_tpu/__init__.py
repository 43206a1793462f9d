"""dgod_tpu — TPU-native Domain-Generalised Object Detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
DGOD codebase (Faster R-CNN + FCOS detectors on ResNet-50-FPN, gradient-reversal
domain-adversarial training over multi-domain driving datasets, COCO mAP@0.5
evaluation), built TPU-first:

- static shapes everywhere (padded GT, fixed image canvas),
- no per-image Python loops (vmap / batched kernels),
- one jit-compiled train step per DG mode,
- data/tensor parallel over a `jax.sharding.Mesh` (ICI collectives via GSPMD).
"""

__version__ = "0.1.0"
