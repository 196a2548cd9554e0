"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, then compares row count, column-name set, and an
order-insensitive value hash (columns sorted by name, rows sorted by their
stringified values). Usage::

    python tools/check_oracle.py [query ...]      # default: all
"""

from __future__ import annotations

import hashlib
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def norm_value(v):
    import math

    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    return str(v)


def frame_hash(cols: list[str], rows: list[tuple]) -> tuple[str, int]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_value(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return h, len(rows)


def main() -> int:
    import duckdb

    from syntheticdata_pipeline__spark.session import get_spark

    only = set(sys.argv[1:])

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    spark = get_spark("oracle-check", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    n_pass = n_fail = n_skip = 0
    for name in sorted(qs):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            shash, sn = frame_hash(scols, srows)
        except Exception:
            print(f"FAIL {name}: SPARK ERROR")
            traceback.print_exc(limit=4)
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={sn}) [{time.time()-t0:.1f}s]")
            n_skip += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            dhash, dn = frame_hash(dcols, drows)
        except Exception:
            print(f"FAIL {name}: DUCKDB ERROR")
            traceback.print_exc(limit=4)
            n_fail += 1
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok = ok_cols and sn == dn and shash == dhash
        status = "PASS" if ok else "FAIL"
        n_pass += ok
        n_fail += not ok
        extra = ""
        if not ok:
            if not ok_cols:
                extra = f" cols spark={sorted(scols)} duck={sorted(dcols)}"
            elif sn != dn:
                extra = f" rows spark={sn} duck={dn}"
            else:
                extra = f" hash spark={shash} duck={dhash} (rows={sn})"
        print(f"{status} {name}: rows={sn} [{time.time()-t0:.1f}s]{extra}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
