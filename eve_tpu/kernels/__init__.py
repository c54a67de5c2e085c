"""Pallas TPU kernels for the hot non-matmul ops."""
