"""TPU-native 21-keypoint hand pose estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ZJULiHongxin/HRNet-Hand-Pose-Estimation (reference surveyed in SURVEY.md):
HRNet-family 2D heatmap models, soft-argmax decoding with trainable
temperature, multi-view 3D lifting (DLT / RANSAC / algebraic / volumetric
triangulation), the full loss suite, SPMD data-parallel training over a
`jax.sharding.Mesh`, and evaluation tooling producing the same metric
artifacts (EPE / PCK / AUC).

Layout
------
- ``config``   frozen config tree; loads the reference ``experiments/*.yaml`` 1:1
- ``models``   Flax (NHWC) model zoo behind a string registry
- ``ops``      decoding, targets, geometry, upsampling, Pallas kernels
- ``parallel`` mesh construction, sharded train steps, checkpointing
- ``data``     dataset readers + numpy pipeline + synthetic data
- ``core``     losses, metrics, train/eval engines
- ``utils``    logging, torch-checkpoint conversion, summaries
"""

__version__ = "0.1.0"
