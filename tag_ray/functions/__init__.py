"""Vectorized scalar-function kernels used inside ``map_batches`` stages."""
