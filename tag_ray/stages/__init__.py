"""Reusable map_batches stages (stateless kernels + actor-pool classes)."""
