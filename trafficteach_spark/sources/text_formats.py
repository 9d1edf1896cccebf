"""Text-format sources: newline-delimited JSON (and CSV) for the events
table — the batch twins of the Kafka/socket value contract.

The streaming sources already speak one-JSON-object-per-event with the
PHYSICAL schema (ts as int64 epoch-nanoseconds; see
``streaming/demo.parse_kafka_events``). These readers give batch jobs the
same ingestion path for landed text files, normalizing to the logical
``schemas.EVENTS`` shape so every downstream operator is
format-oblivious, exactly like the parquet loader.

Scale notes (100 TB): schemas are DECLARED (no inference pass over the
files); JSON/CSV scans cannot push predicates into the format the way
parquet row-group stats do, so production lands text into parquet via
``convert_events_to_parquet`` below and text stays an ingestion-edge
format only — the same tiering every lakehouse uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trafficteach_spark import schemas
from trafficteach_spark.session import ensure_session_confs
from trafficteach_spark.functions.exprs import ns_long_to_ntz_us


def _normalize(raw: DataFrame) -> DataFrame:
    """Physical rows (ts int64 ns) -> logical EVENTS rows (ts NTZ µs),
    the same truncating conversion the parquet loader applies."""
    return raw.withColumn(
        "ts", ns_long_to_ntz_us("ts")
    )


def _read_raw_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """The one JSONL reader (shared by the query path and the compaction
    path so reader options can never drift apart): declared physical
    schema — no inference; malformed lines fail the job (mode FAILFAST).

    FAILFAST's scope is PARSE errors only: a well-formed JSON object
    with missing or renamed fields (a producer emitting "timestamp"
    instead of "ts") still yields NULLs silently. The key-field guard
    in :func:`read_events_jsonl` closes that hole (round-6 review
    finding)."""
    ensure_session_confs(spark)
    return (
        spark.read.schema(schemas.EVENTS_PHYSICAL)
        .option("mode", "FAILFAST")
        .json(path)
    )


# Fields a valid event line must carry: NULLs here mean the producer's
# field NAMES drifted from the contract, which FAILFAST cannot catch.
_REQUIRED_EVENT_FIELDS = ("event_id", "ts", "user_id", "event_type")


def validate_event_fields(raw: DataFrame, source: str) -> DataFrame:
    """Fail ingestion when any required field parsed as NULL — the
    missing-/renamed-field failure mode that sails past FAILFAST. ONE
    cheap aggregate action over the batch (ingestion-edge cost, like
    merge_upsert's check_unique); returns the frame unchanged."""
    null_counts = raw.select(
        [
            F.count(F.when(F.col(c).isNull(), 1)).alias(c)
            for c in _REQUIRED_EVENT_FIELDS
        ]
    ).first()
    bad = {c: null_counts[c] for c in _REQUIRED_EVENT_FIELDS if null_counts[c]}
    if bad:
        raise ValueError(
            f"{source}: required event fields parsed as NULL {bad} — "
            "well-formed lines with missing/renamed fields (FAILFAST "
            "only catches malformed ones); fix the producer or the "
            "field mapping"
        )
    return raw


def read_events_jsonl(
    spark: SparkSession, path: str, validate: bool = True
) -> DataFrame:
    """Read newline-delimited JSON events (the Kafka value contract as a
    batch file source), normalized to the logical events shape. With
    ``validate`` (default), required-field NULLs fail the read — an
    EAGER aggregate action (an extra scan of the input) at construction
    time. That is the intended ingestion-edge contract: this reader
    lands external text into the lakehouse, where failing fast beats
    lazy composability (round-6 advisory weighed an ``observe()``
    listener instead — rejected because its metrics only materialize
    after the first downstream action, by which point a corrupt batch
    may already be half-written). Pass ``validate=False`` when
    composing into a plan that must stay action-free."""
    raw = _read_raw_jsonl(spark, path)
    if validate:
        raw = validate_event_fields(raw, path)
    return _normalize(raw)


def read_events_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    validate: bool = True,
    multiline: bool = False,
) -> DataFrame:
    """Read CSV events with the same declared physical schema and
    FAILFAST posture. With ``header=True``, ``enforceSchema`` is turned
    OFF so Spark actually validates the header names against the
    declared schema — the default (enforceSchema=true) skips the header
    and maps columns POSITIONALLY, which silently transposes same-typed
    columns in a reordered file (event_id/user_id are both int64 —
    round-6 review finding). ``header=False`` necessarily trusts
    position: column order must match ``schemas.EVENTS_PHYSICAL``.

    Quoting is RFC 4180 (``escape='"'``: a quote inside a quoted field
    is DOUBLED), the dialect every standard producer emits — Excel,
    Python's csv.writer, Postgres COPY. Spark's default is its own
    backslash-escape dialect, under which a standard file either parses
    with the quotes silently kept in the value (props is JSON — every
    quoted field corrupts) or dies in FAILFAST on an embedded comma
    (round-12 review finding); :func:`write_events_csv` is the matching
    producer. Fields with embedded NEWLINES additionally need
    ``multiline=True`` — deliberately opt-in, because multiLine parsing
    makes each file unsplittable (one task per file at 100 TB).

    ``validate`` applies the same required-field NULL guard as the JSONL
    twin: FAILFAST only catches MALFORMED rows, so an empty ts/event_id
    cell parses to NULL silently — the two batch ingestion paths must
    enforce one contract (round-10 review finding)."""
    ensure_session_confs(spark)
    raw = (
        spark.read.schema(schemas.EVENTS_PHYSICAL)
        .option("header", str(header).lower())
        .option("enforceSchema", "false" if header else "true")
        .option("mode", "FAILFAST")
        .option("escape", '"')
        .option("multiLine", str(multiline).lower())
        .csv(path)
    )
    if validate:
        raw = validate_event_fields(raw, path)
    return _normalize(raw)


def write_events_jsonl(events_physical: DataFrame, path: str) -> None:
    """Write physical-shaped events as newline-delimited JSON — the
    producer side of the contract (what a collector would land)."""
    events_physical.write.mode("overwrite").json(path)


def write_events_csv(events_physical: DataFrame, path: str) -> None:
    """Write physical-shaped events as RFC-4180 CSV (header row, quotes
    doubled inside quoted fields) — the producer twin of
    :func:`read_events_csv`'s dialect, and the dialect every external
    CSV consumer expects. Spark's default writer backslash-escapes
    instead, which only Spark's own default reader understands."""
    events_physical.write.mode("overwrite").option("header", "true").option(
        "escape", '"'
    ).csv(path)


def convert_events_to_parquet(
    spark: SparkSession, jsonl_path: str, parquet_path: str
) -> None:
    """The ingestion-edge compaction step: land text -> columnar. After
    this, every query runs against parquet with pushdown/pruning; the
    text files are an archival input, not a query target.

    Validated like the query-path reader: compaction is the LAST stop
    before corrupt text becomes authoritative parquet — skipping the
    required-field guard here would land an all-NULL-ts table silently,
    the exact failure the guard's docstring warns about (round-10
    review finding)."""
    validate_event_fields(
        _read_raw_jsonl(spark, jsonl_path), jsonl_path
    ).write.mode("overwrite").parquet(parquet_path)
