"""vcrnet_tpu — a TPU-native (JAX/XLA/Pallas) point-cloud registration framework.

A ground-up rebuild of the capabilities of qiaozhijian/VCR-Net (IROS 2020,
rigid point-cloud registration with partial-to-partial overlap) designed for
TPU hardware: channels-last layouts that map onto the MXU, fully batched math
(no per-item python loops), static shapes everywhere, `jax.sharding` data
parallelism over a device mesh, and Pallas kernels for the hot graph ops.

Reference capability map (see SURVEY.md):
  models:   vcrnet / dcp / lpd / icp        (reference main.py:17-33)
  datasets: modelnet40 / kitti              (reference util/data.py)
  heads:    topK / att / dist VCP heads + SVD solve
  pointer:  transformer encoder-decoder with partial-overlap re-masking
"""

__version__ = "0.1.0"

from vcrnet_tpu import geometry
from vcrnet_tpu.config import Config

__all__ = ["geometry", "Config", "__version__"]
# vcrnet_tpu.serve.Registrar is the deployment-facing inference surface
# (imported lazily by users — it pulls in the model stack)
