"""Constraint checks: per-row kernels + cross-row (shuffle) semantics.

The check registry is the engine's user-extension surface — the
analogue of the reference's public per-format entry points and the
``Raw()`` escape hatch the ``mbz`` package builds on (SURVEY.md §2.9).
"""

from tag_ray.checks.registry import (DEFAULT_REGISTRY, CheckRegistry,
                                     ColumnConstraint, RowCheck,
                                     register_check, unregister_check)
from tag_ray.checks.row_checks import RowValidator, validate_batch

__all__ = ["RowValidator", "validate_batch", "CheckRegistry", "RowCheck",
           "ColumnConstraint", "DEFAULT_REGISTRY", "register_check",
           "unregister_check"]
