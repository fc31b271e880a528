"""stif_tpu — TPU-native continuous space-time video super-resolution framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
paperwave/STIF-continuous-video-representation: continuous space-time video
super-resolution (a Zooming-Slow-Mo-style deformable-alignment encoder with a
bidirectional deformable ConvLSTM, and a LIIF/SIREN coordinate-MLP decoder that
renders any (x, y, t) query).

Layout
------
- ``stif_tpu.ops``      pure tensor ops (grid_sample, deformable conv, MATLAB
                        bicubic resize, coordinate helpers) with exact parity
                        to the reference semantics.
- ``stif_tpu.nn``       network building blocks (flax.linen modules).
- ``stif_tpu.models``   full model families (LunaTokis variants, TMNet).
- ``stif_tpu.parallel`` device-mesh / sharding utilities (pjit, shard_map).
- ``stif_tpu.data``     datasets, augmentation, batch collation.
- ``stif_tpu.train``    losses, LR schedules, train step, checkpointing.
- ``stif_tpu.runtime``  inference pipeline, eval harnesses.
- ``stif_tpu.utils``    metrics, config, logging, video IO.
- ``stif_tpu.convert``  PyTorch ``.pth`` checkpoint import.

All image tensors are channels-last (NHWC / NTHWC) — the native layout for TPU
convolutions — in contrast to the reference's NCHW.
"""

__version__ = "0.1.0"
