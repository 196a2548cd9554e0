"""Shared sweep-membership derivation for the adversarial batteries.

Membership is derived from the registry at collection time so a sweep
cannot silently rot — from BOTH of:

1. the build function's source (quoted table names, plus explicit
   helper markers like ``_E(spark`` for loaders that hide the quoted
   name), and
2. the query's rendered oracle SQL (``\\b<table>\\b`` word matches —
   catches queries that reach a table only through a composed builder
   or helper CTE, the gap the r9 ADVICE flagged: a refactor that moves
   a read behind a helper used to shrink a battery with no test
   failing).

Each caller also asserts a FLOOR on member count (the catalog is frozen
at 190, so current membership is a stable lower bound): if a refactor
drops the count below the floor, the battery fails loudly at collection
instead of silently thinning.
"""

from __future__ import annotations

import inspect
import re


def sweep_members(
    tables: tuple[str, ...],
    *,
    extra_src_markers: tuple[str, ...] = (),
    floor: int = 0,
) -> list[str]:
    from syntheticdata_pipeline__spark.plans import load_all

    out = set()
    pats = [re.compile(rf"\b{re.escape(t)}\b") for t in tables]
    for name, spec in load_all().items():
        try:
            src = inspect.getsource(spec.build)
        except (OSError, TypeError):
            src = ""
        if any(f'"{t}"' in src or f"'{t}'" in src for t in tables):
            # quoted-name matching avoids the `"part"`-in-`repartition` trap
            out.add(name)
        elif any(m in src for m in extra_src_markers):
            out.add(name)
        elif spec.oracle and any(p.search(spec.oracle) for p in pats):
            out.add(name)
    members = sorted(out)
    assert len(members) >= floor, (
        f"sweep membership for {tables} shrank to {len(members)} "
        f"(floor {floor}) — a refactor hid a table read from the battery; "
        f"update the floor only for a conscious catalog change"
    )
    return members
