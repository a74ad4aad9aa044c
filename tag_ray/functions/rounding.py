"""Half-away-from-zero rounding (DuckDB ``ROUND`` semantics).

numpy's ``rint``/``round`` and Python's ``round()`` round half to EVEN;
DuckDB's ``ROUND()`` on DOUBLE rounds half AWAY from zero. Any column
compared value-exactly against the SQL oracle must round with these
helpers — round-1 verification showed ``np.floor(x*100+0.5)`` matches
DuckDB bit-exactly over sf0.01 lineitem while ``np.rint`` differs on
hundreds of rows (VERDICT.md "What's wrong" #1).
"""

from __future__ import annotations

import numpy as np


def round_half_away(x, decimals: int = 0) -> np.ndarray:
    """Element-wise round-half-away-from-zero at ``decimals`` places."""
    a = np.asarray(x, dtype=np.float64)
    s = np.float64(10.0**decimals)
    return np.sign(a) * np.floor(np.abs(a) * s + 0.5) / s


def to_cents(x) -> np.ndarray:
    """float money → int64 cents with DuckDB-compatible rounding.

    The integer-cents discipline (CLAUDE.md invariants) makes SUMs exact
    regardless of addition order; this rounding mode makes the per-row
    cents themselves identical to ``CAST(round(x*100) AS BIGINT)``."""
    a = np.asarray(x, dtype=np.float64)
    return (np.sign(a) * np.floor(np.abs(a) * 100.0 + 0.5)).astype(np.int64)
