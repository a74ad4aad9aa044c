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


def test_window_slots_go_to_first_time_evidence():
    """The ~50-row driver window must hold only oracle queries that have
    no prior-round driver hash row — r02-green entries keep their r02
    evidence and yield their slot (round-3 policy, VERDICT r2 item 1)."""
    import __ray_entry__ as ent

    names = list(ent.queries())
    oracle = set(ent.oracle_sql())
    win = names[:50]
    assert all(n in oracle for n in win), \
        [n for n in win if n not in oracle]
    leaked = [n for n in win if n in ent._R02_EVIDENCED]
    assert not leaked, f"r02-evidenced entries occupying window slots: {leaked}"
    outside = [n for n in names[50:]
               if n in oracle and n not in ent._R02_EVIDENCED]
    assert set(outside) <= set(ent._WINDOW_DEFER), (
        f"never-evidenced oracle entries outside the window that are not "
        f"deliberately deferred: {sorted(set(outside) - set(ent._WINDOW_DEFER))}")


def test_oracle_keys_subset_of_queries():
    import __ray_entry__ as ent

    q = set(ent.queries())
    o = set(ent.oracle_sql())
    assert o <= q, o - q
    assert len(o) >= 101  # the evidenced oracle surface never shrinks
    assert len(q) >= 122
