"""Empty-block-safe wrapper around ``Dataset.join``.

Ray 2.49's hash-shuffle join crashes with ``ArrowInvalid: No match or
multiple matches for key field reference FieldRef.Name(<key>)`` when a
join side contains EMPTY BLOCKS (a filter that matched nothing in some
block — the normal output shape of any selective ``map_batches``
filter): empty blocks ship no schema'd shards, so a hash partition
whose only contribution from that side came from empty blocks builds a
schema-less ``pa.table({})`` and acero can't resolve the key field
(reproduced deterministically and pinned by
``test_keyjoin::test_safe_join_survives_empty_blocks``; the effect is
data-placement-dependent — a sparse FILTERED dimension side makes it
near-certain, which is how q2's regional-supplier attach found it).

``safe_join`` coalesces each side through a zero-copy identity
``map_batches`` with an explicit ``batch_size`` — Ray bundles blocks up
to the batch size, so empty blocks merge into their neighbours and
every shipped block is schema'd. Cost: one extra zero-copy pass per
side (single-node plasma reads are shared-memory; measured neutral),
and the fact side gets re-blocked to ``batch_size`` rows — the same
order as normal block sizing.
"""

from __future__ import annotations

import ray.data as rd

COALESCE_BATCH_ROWS = 65_536


def _coalesce(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(lambda b: b, batch_format="pyarrow",
                          batch_size=COALESCE_BATCH_ROWS)


def safe_join(left: rd.Dataset, right: rd.Dataset, join_type: str,
              *, num_partitions: int, on: tuple, right_on: tuple,
              ) -> rd.Dataset:
    """Drop-in for ``left.join(right, ...)`` that survives empty blocks
    on either side (see module docstring). All joins in this repo go
    through here — a raw ``Dataset.join`` on anything downstream of a
    filter is a placement-dependent crash."""
    return _coalesce(left).join(
        _coalesce(right), join_type, num_partitions=num_partitions,
        on=on, right_on=right_on)
