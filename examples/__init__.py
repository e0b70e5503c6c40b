"""Pedagogical Pallas matmul ladder (TPU analog of the reference's
examples/sgemm_*.cu progression — reference: examples/CMakeLists.txt:12-17)."""
