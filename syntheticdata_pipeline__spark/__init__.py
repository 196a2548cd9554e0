"""syntheticdata_pipeline__spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the capabilities of the reference pipeline
(`ankitbelbase17/SyntheticData_Pipeline-`, read-only at /root/reference) on
Apache Spark: declarative DataFrame/SQL plans, Catalyst-optimized physical
execution, Structured Streaming for the incremental paths, and Pandas-UDF
plumbing for model/binary columns.

Design rules (see SURVEY.md §7):
- DataFrame/Spark SQL only; explicit StructType schemas; no RDD code.
- Every operator is a library function here plus a correctness query in
  ``__spark_entry__.py`` with a DuckDB oracle twin where SQL-expressible.
- Seeded determinism everywhere (md5-keyed pseudo-random, not rand()).
- Built for 100 TB: broadcast small dims, partial aggregation, pushed-down
  filters/projections, AQE-friendly shuffles, no driver-side collect loops.
"""

__version__ = "0.1.0"
