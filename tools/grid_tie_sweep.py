"""Grid-key decimal-halfway tie sweep (r13, queued #11).

The class this hunts: ``round(x, k)`` used as a GROUPING/JOIN KEY where
the nearest double to x has a SHORTEST decimal representation that
terminates at exactly k+1 decimals with a trailing '5' — a true decimal
halfway at the k-dp grid. There Spark (BigDecimal HALF_UP over the
shortest representation) and DuckDB (rounding the binary double)
disagree by one grid cell whenever the binary double sits below the
decimal halfway. The r12 sf0.1 sweep caught one live instance (quality
0.72125 in ``rank_normalized_quality``); this sweep's static audit
found the one LATENT sibling and r13 converted both to the IEEE floor
grid.

## Static key audit (r13, full catalog)

Every engine-native round() feeding a groupBy/join/window key:

| site | grid | status |
|---|---|---|
| rank_normalized_quality qv (dataset_q) | quality @ 4dp | converted r12 → floor(q*1e4+0.5) |
| quality_duplication_lift qv (docs_q)   | quality @ 4dp | converted r13 → floor(q*1e4+0.5) (same quality expr ⇒ same 0.72125 exposure at sf0.1; latent only because the one-cell shift didn't cross a quartile boundary) |
| (all other grouping grids) | integer µs buckets / DIV, decimal-exact sums, or 6-dp grids over values with ≤5 decimal digits | tie-free by construction |

Output-position rounds are NOT in scope: on fixed data a live halfway
disagreement in an output is caught directly by the cross-engine
full-catalog oracle sweep (that is how r12 found 0.72125), and a
halfway whose binary double sits above the decimal midpoint rounds the
same way on both engines permanently — there is no latent output class
on committed fixtures.

## Empirical pass (this tool)

The one double-valued grid input in the catalog is the 4-dp quality
score. For each SF dir: compute the quality value set via DuckDB, flag
every value whose shortest repr (Python repr == Java Double.toString's
shortest-decimal algorithm) is a halfway at 4dp, and verify the floor
grid assigns each flagged value a single deterministic key (pure double
multiply-add-floor — bit-identical across engines by IEEE 754).

Usage::

    python tools/grid_tie_sweep.py [sf_dir ...]   # default sf0.01 + sf0.1

Exit 0 when every flagged halfway is floor-grid-covered; 1 if a
round-keyed site remains (the static table above must then be updated).
"""

from __future__ import annotations

import math
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# the quality expression shared by both (former) round-keyed grids —
# kept in sync with operators/textops.py::quality_score via the oracle
# twins of rank_normalized_quality / quality_duplication_lift
_QUALITY_SQL = """
SELECT doc_id,
  (CASE WHEN len(toks) >= 20 AND len(toks) <= 10000 THEN 1.0
        WHEN len(toks) >= 5 THEN 0.5 ELSE 0.0 END) * 0.4
  + least(CAST(len(list_intersect(toks, {stops})) AS DOUBLE) / 4.0, 1.0) * 0.3
  + coalesce(CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
               / nullif(CAST(length(text) AS DOUBLE), 0.0), 0.0) * 0.3 AS q
FROM (SELECT doc_id, text, {toks} AS toks
      FROM read_parquet('{sf}/documents.parquet'))
"""

_HALFWAY_4DP = re.compile(r"^-?\d+\.\d{4}5$")


def scan_sf(sf_dir: str) -> tuple[int, list[tuple[int, float]]]:
    import duckdb

    from syntheticdata_pipeline__spark.functions.text import tokens_sql
    from syntheticdata_pipeline__spark.operators.textops import LANG_STOPWORDS

    con = duckdb.connect()
    sql = _QUALITY_SQL.format(
        stops=repr(list(LANG_STOPWORDS["en"])), toks=tokens_sql("text"), sf=sf_dir
    )
    rows = con.execute(sql).fetchall()
    con.close()
    hits = [(i, q) for i, q in rows if q is not None and _HALFWAY_4DP.match(repr(q))]
    return len(rows), hits


def audit_no_round_keys() -> list[str]:
    """Static backstop: no plan may round(·,k) straight into a qv-style
    grid key alias (the converted sites use floor)."""
    bad: list[str] = []
    plans = os.path.join(ROOT, "syntheticdata_pipeline__spark", "plans")
    for fn in sorted(os.listdir(plans)):
        if not fn.endswith(".py"):
            continue
        src = open(os.path.join(plans, fn)).read()
        for m in re.finditer(r"F\.round\([^\n]*\.alias\(\"qv\"\)", src):
            bad.append(f"{fn}: {m.group(0)[:80]}")
        for m in re.finditer(r"round\([^()]*,\s*\d\)\s*AS\s+qv", src, re.IGNORECASE):
            bad.append(f"{fn} (oracle SQL): {m.group(0)[:80]}")
    return bad


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    bad = audit_no_round_keys()
    if bad:
        print("ROUND-KEYED GRID SITES REMAIN (convert to the floor grid):")
        for b in bad:
            print(f"  {b}")
    for d in dirs:
        n, hits = scan_sf(d)
        print(f"== {d}: {n} docs, {len(hits)} quality values halfway at 4dp")
        for doc_id, q in hits:
            lo = math.floor(q * 10000.0 + 0.5)
            print(f"   doc {doc_id}: q={q!r} -> floor-grid key {int(lo)} (deterministic)")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
