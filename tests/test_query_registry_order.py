"""Driver-evidence policy pins for the __ray_entry__ query registry.

The driver's CORRECTNESS window records only a prefix of queries()
(r01 = all 43, r02 = first 50 of 85), so ORDER is evidence: every
oracle-carrying entry must precede every no-oracle entry, keys must be
unique across rounds, and oracle_sql() must never reference a query
that doesn't exist."""

import sys

sys.path.insert(0, "/root/repo")


def test_window_slots_go_to_first_time_evidence():
    """Round-5 policy (VERDICT r4 item 3): the oracle surface is fully
    evidenced by r02+r03+r04, so EVERY never-evidenced entry — oracle
    or rows-only (the 10 queries no prior window reached, plus anything
    added this round) — must LEAD the window, followed by the
    changed-code re-evidence block (_R05_RECHECK); all of both groups
    inside the ~50-row window, remaining oracle entries before
    already-evidenced rows-only entries."""
    import __ray_entry__ as ent

    names = list(ent.queries())
    oracle = set(ent.oracle_sql())
    prior = (ent._R02_EVIDENCED | ent._R03_EVIDENCED | ent._R04_EVIDENCED
             | ent._ROWSONLY_EVIDENCED)
    never = [n for n in names if n not in prior]
    assert never, "no never-evidenced entries left — retire this policy"
    assert set(names[:len(never)]) == set(never), (
        f"never-evidenced entries must lead the window: "
        f"{[n for n in never if n not in names[:len(never)]]}")
    recheck = [n for n in ent._R05_RECHECK if n not in never]
    block = names[len(never):len(never) + len(recheck)]
    assert set(block) == set(recheck), block
    win = names[:50]
    for n in (*never, *recheck):
        assert n in win, f"first-evidence entry {n} fell outside the window"
    # within the remainder, oracle entries precede rows-only entries so
    # spare window slots become free hash re-checks, not weaker rows
    tail = names[len(never) + len(recheck):]
    first_rows_only = next(
        (i for i, n in enumerate(tail) if n not in oracle), len(tail))
    late_oracle = [n for n in tail[first_rows_only:] if n in oracle]
    assert not late_oracle, late_oracle


def test_oracle_keys_subset_of_queries():
    import __ray_entry__ as ent

    q = set(ent.queries())
    o = set(ent.oracle_sql())
    assert o <= q, o - q
    assert len(o) >= 111  # the evidenced oracle surface never shrinks
    assert len(q) >= 134
