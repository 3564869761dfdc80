"""pdc_tpu — a TPU-native dense visual object descriptor framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
RobotLocomotion/pytorch-dense-correspondence ("Dense Object Nets", CoRL 2018):
self-supervised per-pixel descriptor learning from posed RGBD logs, with
depth-reprojection correspondence generation, pixelwise contrastive training,
quantitative evaluation, and manipulation-facing inference tools.

Design principles (TPU-first, not a port):
  * Everything from correspondence generation onward is jit-compiled XLA with
    static shapes — data-dependent pruning becomes validity masks.
  * Masked categorical sampling uses inverse-CDF over a cumulative mask instead
    of ``nonzero`` gathers.
  * Best-match search is an MXU matmul + argmin over the flattened pixel axis,
    never a host-side numpy loop.
  * Multi-chip scaling uses ``jax.sharding.Mesh`` + collectives over ICI
    (data-parallel pairs; pixel-axis sharding for argmin/statistics).
"""

__version__ = "0.1.0"
