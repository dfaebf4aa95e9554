"""Composable DataFrame operators (SURVEY §2 inventory).

Each module re-expresses one family of the reference's operator inventory as
reusable, declaratively-planned Spark DataFrame functions:

- :mod:`.projections` — P1-P5 (select/rename/drop/derive)
- :mod:`.quality` — P6-P7 (validation-rule predicates with fail counts)
- :mod:`.joins` — J1-J3 + the general join surface (semi/anti/full/range/as-of)
- :mod:`.aggregates` — A1-A7 (multi-measure, conditional, pivot, rollup)
- :mod:`.windows` — W1-W2 + rank/lag/lead/frames
- :mod:`.setops` — U1 (+ intersect/except)
- :mod:`.sampling` — O2-O4 (limit/sample/pagination)
- :mod:`.dedup` — extension: exact & near-duplicate detection at scale
- :mod:`.similarity` — extension: vector similarity search
"""
