"""trafficteach_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
the reference traffic-checkpoint analytics system (ABigdataer/TrafficTeach,
see SURVEY.md) as a library of composable, declarative DataFrame operators:

- every operator is a pure function ``(spark, sf_dir) -> DataFrame``;
- plans stay in DataFrame/Catalyst land end-to-end (no RDDs, no
  driver-side loops), so predicate pushdown, column pruning, partial
  aggregation, broadcast selection and AQE all apply for free;
- each query ships with an ANSI-SQL oracle (DuckDB-runnable) used by the
  correctness harness;
- designed for 100 TB scale: date-partition-friendly filters, broadcast
  hints for small dims, bucketized interval joins, LSH-banded near-dup,
  approx-distinct variants.

Package layout (SURVEY.md §8):
    session.py    SparkSession builder with scale-ready defaults
    schemas.py    single source of truth for table schemas
    sources/      parquet/table loaders and sinks
    operators/    the query library (relational, windows, sequences, llm, ...)
    functions/    reusable column-expression helpers
    streaming/    Structured Streaming wrappers of the batch aggregations
    plans/        plan inspection helpers (explain/shuffle audit)
    registry.py   query-key -> (fn, oracle SQL) registry for the harness
"""

__version__ = "0.1.0"
