"""Declarative constraint registry — the engine's §2.9 extension surface.

The reference's per-version frame-legality tables are *data-driven*
schemas: ``validID3Frame`` checks a frame name against a per-version map
(/root/reference/id3v2frames.go:289-296, tables :21-287), so supporting
a new frame is a table entry, not a parser edit. The engine mirrors
that two ways:

  * ``ColumnConstraint`` — a declared per-column legality row
    (type / not-null / range / set membership) compiled into one
    vectorized pyarrow.compute kernel; a new constraint is data.
  * ``CheckRegistry.register`` — a named custom check (required
    columns + batch kernel) picked up by ``validate()`` end-to-end
    without editing the built-in suite (the ``Raw()``-escape-hatch
    role the ``mbz`` package plays downstream of the reference,
    /root/reference/mbz/mbz.go:108-114).

Kernel contract: ``kernel(batch: pa.Table) -> (mask, details)`` where
``mask`` is a boolean ndarray marking violating rows and ``details`` is
a per-row string sequence or one shared string. Row-level containment
is preserved: a kernel that raises produces one violation row per batch
(check name + error), never a task failure (cmd/check/main.go:154-159
lesson).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tag_ray.schema import VIOLATION_SCHEMA

KernelResult = "tuple[np.ndarray, Sequence[str] | str]"


@dataclass(frozen=True)
class RowCheck:
    """A named per-row check over declared input columns."""

    name: str
    columns: tuple[str, ...]
    kernel: Callable[[pa.Table], tuple]


@dataclass(frozen=True)
class ColumnConstraint:
    """One declared-legality row (the ``validID3Frame`` analogue)."""

    column: str
    not_null: bool = False
    min_value: float | None = None
    max_value: float | None = None
    allowed: tuple | None = None
    dtype: str | None = None  # pyarrow type name, e.g. "int32", "string"

    def to_check(self) -> RowCheck:
        cons = self

        def kernel(batch: pa.Table) -> tuple:
            col = batch[cons.column]
            n = batch.num_rows
            mask = np.zeros(n, dtype=bool)
            details = np.full(n, "", dtype=object)
            if cons.dtype is not None and str(col.type) != cons.dtype:
                mask[:] = True
                details[:] = f"{cons.column}: type {col.type} != {cons.dtype}"
                return mask, details
            isnull = pc.is_null(col).to_numpy(zero_copy_only=False)
            if cons.not_null and isnull.any():
                mask |= isnull
                details[isnull] = f"{cons.column}: null"
            valid = ~isnull
            if cons.min_value is not None or cons.max_value is not None:
                v = col.to_numpy(zero_copy_only=False).astype(np.float64)
                with np.errstate(invalid="ignore"):
                    bad = np.zeros(n, dtype=bool)
                    if cons.min_value is not None:
                        bad |= valid & (v < cons.min_value)
                    if cons.max_value is not None:
                        bad |= valid & (v > cons.max_value)
                for i in np.flatnonzero(bad & ~mask):
                    details[i] = f"{cons.column}={v[i]:g} out of range"
                mask |= bad
            if cons.allowed is not None:
                ok = pc.is_in(col, value_set=pa.array(list(cons.allowed))) \
                    .to_numpy(zero_copy_only=False)
                bad = valid & ~ok
                for i in np.flatnonzero(bad & ~mask):
                    details[i] = f"{cons.column}: value not in allowed set"
                mask |= bad
            return mask, details

        return RowCheck(name=f"constraint_{self.column}",
                        columns=(self.column,), kernel=kernel)


@dataclass
class CheckRegistry:
    """Named custom checks run by ``validate_batch`` after the built-in
    suite. Registered checks travel to the validator actors by value
    (cloudpickle), so kernels must be self-contained."""

    checks: dict[str, RowCheck] = field(default_factory=dict)

    def register(self, check: RowCheck | ColumnConstraint) -> None:
        if isinstance(check, ColumnConstraint):
            check = check.to_check()
        if check.name in self.checks:
            raise ValueError(f"check {check.name!r} already registered")
        self.checks[check.name] = check

    def unregister(self, name: str) -> None:
        self.checks.pop(name, None)

    def run(self, batch: pa.Table) -> pa.Table | None:
        """All registered checks over one batch → violations (or None)."""
        if not self.checks:
            return None
        n = batch.num_rows
        ids = batch["image_id"].to_pylist() \
            if "image_id" in batch.column_names else [None] * n
        parts = batch["partition_id"].to_pylist() \
            if "partition_id" in batch.column_names else [-1] * n
        o_ids, o_parts, o_checks, o_details = [], [], [], []
        for check in self.checks.values():
            missing = [c for c in check.columns
                       if c not in batch.column_names]
            try:
                if missing:
                    raise KeyError(f"missing required columns {missing}")
                mask, details = check.kernel(batch)
                mask = np.asarray(mask, dtype=bool)
                for i in np.flatnonzero(mask):
                    o_ids.append(ids[i])
                    o_parts.append(parts[i] if parts[i] is not None else -1)
                    o_checks.append(check.name)
                    o_details.append(details if isinstance(details, str)
                                     else str(details[i]))
            except Exception as e:  # containment: kernel bug ≠ task failure
                o_ids.append(None)
                o_parts.append(-1)
                o_checks.append(check.name)
                o_details.append(f"check kernel error: {e!r}")
        if not o_ids:
            return None
        return pa.Table.from_pydict(
            {"image_id": o_ids, "partition_id": o_parts,
             "check": o_checks, "detail": o_details},
            schema=VIOLATION_SCHEMA)


DEFAULT_REGISTRY = CheckRegistry()


def register_check(check: RowCheck | ColumnConstraint) -> None:
    """Register into the default registry used by ``validate()``."""
    DEFAULT_REGISTRY.register(check)


def unregister_check(name: str) -> None:
    DEFAULT_REGISTRY.unregister(name)
