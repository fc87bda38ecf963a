"""BaseBoostDepth-TPU: a TPU-native self-supervised monocular depth framework.

A from-scratch JAX/Flax/Pallas re-design of the capabilities of
kieran514/BaseBoostDepth ("Exploiting Larger Baselines for Self-Supervised
Monocular Depth Estimation", arXiv 2407.20437):

- curriculum over ever-larger stereo/temporal baselines,
- incremental (chained) pose estimation,
- partial pose replacement,
- tri-minimization of the photometric reprojection loss,
- error-induced reconstructions,
- five interchangeable depth-network zoos (Monodepth2 ResNet, MonoViT/MPViT,
  SQLdepth, CADepth, DIFFNet/HRNet),
- KITTI / SYNS / odometry evaluation.

Architecture is TPU-first, not a port: the reference's ragged per-batch frame
bookkeeping (reference trainer.py:867-981) is replaced by a fixed candidate-slot
axis with validity masks so every training step compiles once per curriculum
stage; data parallelism is jit + NamedSharding over a jax Mesh; the hot warp /
photometric ops live in ops/ as fused XLA/Pallas kernels.
"""

__version__ = "0.1.0"

from baseboostdepth_tpu import geometry, losses  # noqa: F401
