"""Table sources. Parquet in-sandbox; the interface is storage-agnostic
so the prod path can swap in ``ray.data.read_lance`` (SURVEY.md §2.1 S1
— no lance wheel available offline)."""

from __future__ import annotations

import os

import ray.data as rd


def table(sf_dir: str, name: str, columns: list[str] | None = None) -> rd.Dataset:
    """Read one named table from a scale-factor dir, pruned at the read."""
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")
