"""Pallas TPU kernels (the sgl-kernel / jit_kernel analogue, SURVEY §2 K)."""
