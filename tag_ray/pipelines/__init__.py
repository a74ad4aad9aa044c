"""End-to-end pipelines composed from stages — the engine's ``cmd/`` layer.

Each pipeline is the distributed analogue of one reference entry point:
validate.py ↔ cmd/check (collection sweep), dedup.py ↔ the -sum
hash-multiplicity mode, stats/drift ↔ the engine-only north_star
additions (SURVEY.md §2.5 A3/A4).
"""
