"""Hostile-driver simulation: the external driver's exact calling
convention — a fresh SparkSession the DRIVER owns (default confs, NON-UTC
session timezone), then ``__spark_entry__.entry(spark)`` and a
queries-vs-oracle compare. Proves ``ensure_runtime_confs()`` inside the
query builders protects against driver-owned sessions. Usage::

    python tools/driver_sim.py [query ...]    # default: smoke + 5 stalest
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as mod

    res = mod.entry(spark)
    n = res.count()
    print(f"entry(): {n} rows, schema={[f.name for f in res.schema.fields]}")
    assert n >= 0

    from tools.check_oracle import compare_one, duck_connect

    qs = mod.queries()
    oracles = mod.oracle_sql()
    names = sys.argv[1:] or list(qs)[:5]
    con = duck_connect(SF_DIR)
    ok = True
    for name in names:
        ok = compare_one(spark, con, name, qs, oracles, SF_DIR) is not False and ok
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
