"""Pallas TPU kernels for the ops where XLA's generic lowering is the
bottleneck (measured in docs/PERF.md): the fused prediction sweep and the
occupancy/resample pool pass."""
