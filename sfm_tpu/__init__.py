"""sfm_tpu — a TPU-native Structure-from-Motion framework.

A ground-up JAX/Pallas re-design of the capabilities of
Black-Phoenix/CUDA-SfM (SIFT extraction, brute-force matching, 8-point
RANSAC essential estimation, pose recovery, DLT triangulation), extended
with bundle adjustment, incremental multi-view SfM, and multi-chip
sharding the reference lacks.
"""

__version__ = "0.1.0"
