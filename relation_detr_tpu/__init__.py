"""relation_detr_tpu: a TPU-native JAX/XLA/Pallas detection framework.

A from-scratch rebuild of the capabilities of Relation-DETR (ECCV 2024,
arXiv:2407.11699) designed TPU-first:

- pure-functional flax modules with static shapes (aspect-ratio bucketed
  canvases, fixed-capacity ground-truth padding),
- multi-scale deformable attention as a fused XLA gather formulation plus a
  Pallas TPU kernel for the hot path,
- on-device Hungarian matching (Jonker-Volgenant shortest augmenting path in
  ``lax`` control flow) instead of a host scipy sync point,
- data parallelism via ``jax.sharding`` over a device ``Mesh`` (XLA
  collectives over ICI) instead of NCCL/DDP.

Reference behavior citations in docstrings point into the upstream PyTorch
implementation mounted at /root/reference (file:line).
"""

__version__ = "0.1.0"
