"""LONER-TPU: a TPU-native LiDAR neural-implicit SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of LONER
("LiDAR Only Neural Representations for Real-Time SLAM", RA-L 2023) and its
Forest-Digital-Twin fork: an ICP odometry tracker plus an online
neural-implicit mapper (multi-resolution hash-grid + MLP field trained from
lidar rays with a JS-divergence-weighted line-of-sight loss), offline
implicit-map optimization from groundtruth trajectories, submap partitioning,
rendering/meshing/metric analysis, and multi-chip scaling via jax.sharding.

Design stance (vs the torch/CUDA reference):
  * purely functional core — poses, scans, fields are pytrees; every hot path
    is a jitted, differentiable function with static shapes.
  * the tcnn hash-grid/fused-MLP roles are played by our own JAX field with
    Pallas TPU kernels on the hot ops.
  * tracker/mapper concurrency is host-side threading over async dispatch
    instead of multiprocessing + queues.
  * scaling is jax.sharding.Mesh + collectives, not process pools.
"""

__version__ = "0.1.0"
