"""monorfs_tpu — a TPU-native Random-Finite-Set SLAM framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the MonoRFS
reference (afalchetti/monorfs): Rao-Blackwellized PHD filtering, Loopy-PHD
smoothing, an iSAM2-equivalent pose-graph backend, pixel-range RGB-D
frontends, simulated 1D/2D/3D worlds, the recording format, and the ATE/OSPA
evaluation suite — expressed as dense batched kernels with particles, mixture
components, and trajectory blocks as shardable mesh axes.
"""

__version__ = "0.1.0"
