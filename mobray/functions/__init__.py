"""Vectorized scalar/array kernels shared by stages and pipelines."""
