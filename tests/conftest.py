"""Session-scoped Ray + fixture-corpus setup.

Ray is initialised ONCE per pytest session (driver contract: library
code never calls ray.init itself).
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def smoke_corpus() -> str:
    """FIXTURES.md smoke tier: 1,000 base rows, 4 partitions, seed 42."""
    from tag_ray.fixtures import cached_corpus

    return cached_corpus(n_rows=1000, n_partitions=4, seed=42)
