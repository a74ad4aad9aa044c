"""Driver-evidence policy pins for the __ray_entry__ query registry.

The driver's CORRECTNESS window records only a prefix of queries()
(r01 = all 43, r02 = first 50 of 85), so ORDER is evidence: every
oracle-carrying entry must precede every no-oracle entry, keys must be
unique across rounds, and oracle_sql() must never reference a query
that doesn't exist."""

import sys

sys.path.insert(0, "/root/repo")


def test_oracle_entries_precede_rows_only():
    import __ray_entry__ as ent

    names = list(ent.queries())
    oracle = set(ent.oracle_sql())
    first_no_oracle = min(i for i, n in enumerate(names) if n not in oracle)
    late_oracle = [n for n in names[first_no_oracle:] if n in oracle]
    assert not late_oracle, (
        f"oracle-carrying queries placed after rows-only entries "
        f"(would lose their driver correctness row): {late_oracle}")


def test_oracle_keys_subset_of_queries():
    import __ray_entry__ as ent

    q = set(ent.queries())
    o = set(ent.oracle_sql())
    assert o <= q, o - q
    assert len(o) >= 100  # the evidenced oracle surface never shrinks
    assert len(q) >= 121
