"""Pallas TPU kernels for the ops where XLA's generic lowering is the
bottleneck (measured in docs/PERF.md): stream compaction and the fused
measurement update."""
