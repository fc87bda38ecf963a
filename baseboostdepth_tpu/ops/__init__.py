"""Hot-path compute ops: bilinear warping, SSIM, resizing, chamfer.

These replace the reference's reliance on cuDNN built-ins
(F.grid_sample at trainer.py:439,442, F.interpolate at trainer.py:456,
AvgPool-based SSIM at layers.py:219-249) with TPU-native implementations:
XLA-fused formulations first, Pallas kernels where XLA's lowering leaves
throughput on the table.
"""

from baseboostdepth_tpu.ops.sampling import bilinear_sample  # noqa: F401
from baseboostdepth_tpu.ops.ssim import ssim  # noqa: F401
from baseboostdepth_tpu.ops.resize import (  # noqa: F401
    resize_bilinear,
    upsample2x_nearest,
    lanczos_pyramid,
)
