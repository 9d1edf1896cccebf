"""Structured-Streaming demo (SURVEY.md §3 O35-O38; reference Job 8).

The reference's streaming job (REF: rtmroad/RoadRealTimeAnalyze.java [R])
consumed a Kafka DStream in 5-second micro-batches and computed a
per-checkpoint sliding-window average speed with ``reduceByKeyAndWindow``
— processing-time semantics, no late-data handling, manual checkpointing.

The Spark-native shape (SURVEY §4.3): the *same* aggregation expression as
the batch query ``q20_sliding_window`` (imported, not re-implemented), on
an event-time column with a watermark:

- O35 ingest: ``readStream`` file source over the events schema (a real
  deployment swaps in ``format("kafka")`` + ``from_json`` — one line; no
  Kafka broker exists in this container, and the file source exercises the
  identical plan);
- O36 window: ``sliding_window_agg`` — 1-hour windows / 15-min slide;
- O37 watermark: ``withWatermark("ts", "2 hours")`` — late rows beyond
  2 hours of the max seen event time are dropped instead of growing state
  forever (the reference had NO such bound: its window state was a deque
  of RDDs);
- O38 checkpoint: ``option("checkpointLocation", ...)`` for exactly-once
  sink semantics across restarts.

Correctness contract: because the aggregation body is shared, the batch
harness's DuckDB oracle for q20 *is* the oracle for this stream; the pytest
in tests/test_streaming.py runs the stream to completion on a fixture dir
(``availableNow`` trigger) and asserts the result equals the batch answer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from trafficteach_spark import schemas
from trafficteach_spark.operators.windows import SESSION_GAP_MIN, sliding_window_agg
from trafficteach_spark.session import ensure_session_confs
from trafficteach_spark.functions.exprs import ns_long_to_ntz_us

WATERMARK = "2 hours"


def watermarked(events: DataFrame, horizon: str = WATERMARK) -> DataFrame:
    """The parity-critical NTZ->TIMESTAMP + withWatermark idiom, ONE
    definition for every streaming operator (sliding avg, sessionizer,
    dedup): the cast is value-identity ONLY under the pinned-UTC session
    tz, so three hand copies of it were three chances to drift
    (round-10 review finding). Callers cast their outputs back to NTZ."""
    return events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", horizon
    )


def _with_event_time(raw: DataFrame) -> DataFrame:
    """Physical rows (ts = int64 nanoseconds, the parquet layout) ->
    event-time rows; shared by every source so their output schemas are
    identical by construction.

    ``timestamp_micros`` builds an LTZ timestamp whose NTZ cast renders
    through the SESSION timezone — on a non-UTC session every event time
    would silently shift by the UTC offset (windows, watermarks, and
    batch-loader parity all wrong). The public parse helpers are usable
    directly over batch frames, so the UTC pin must happen HERE, not
    only in read_event_stream."""
    ensure_session_confs(raw.sparkSession)
    return raw.withColumn(
        "ts", ns_long_to_ntz_us("ts")
    )


def parse_kafka_events(records: DataFrame) -> DataFrame:
    """Kafka records -> typed event rows: each record's ``value`` bytes
    carry one JSON object with the physical schema's fields (ts as int64
    nanoseconds, exactly the parquet layout), so everything downstream of
    the source node is the same plan the file source feeds.

    Split out from :func:`read_event_stream` because it is the testable
    part without a broker: tests/test_streaming.py runs it over a batch
    frame of synthesized Kafka records and asserts row-for-row equality
    with the batch loader's output.
    """
    return _with_event_time(
        records.select(
            F.from_json(
                F.col("value").cast("string"), schemas.EVENTS_PHYSICAL
            ).alias("e")
        ).select("e.*")
    )


def parse_socket_lines(lines: DataFrame) -> DataFrame:
    """Socket-source lines -> typed event rows: each line carries the same
    one-JSON-object-per-event contract as the Kafka ``value`` bytes (ts as
    int64 nanoseconds), so everything downstream of the source node is the
    identical plan again. The socket source is the network path that CAN
    be integration-tested in this container (a plain TCP server stands in
    for the broker — tests/test_streaming_socket.py streams real bytes
    through it into the q20 window aggregation)."""
    return _with_event_time(
        lines.select(
            F.from_json(F.col("value"), schemas.EVENTS_PHYSICAL).alias("e")
        ).select("e.*")
    )


def read_event_stream(
    spark: SparkSession,
    events_path: str | None = None,
    source: str = "file",
    kafka_options: dict[str, str] | None = None,
    socket_options: dict[str, str] | None = None,
) -> DataFrame:
    """O35/O5: streaming source over the events table layout.

    ``source="file"``: ``events_path`` must be a DIRECTORY (the
    file-stream source tails directories; files "arrive" by landing in it
    — see :func:`stage_events_dir` for adapting a single-file fixture).
    ``maxFilesPerTrigger`` bounds micro-batch size the way the
    reference's 5-second batch duration did (REF: rtmroad [R]).

    ``source="kafka"``: consumes a topic via the Spark Kafka connector
    (``kafka_options`` needs at least ``kafka.bootstrap.servers`` plus a
    ``subscribe``/``assign``) and parses value bytes with
    :func:`parse_kafka_events` — same downstream plan as the file
    source. Requires the ``spark-sql-kafka`` package on the cluster; no
    broker exists in this container, so tests cover the value projection
    and the wiring error path rather than an end-to-end consume.

    ``source="socket"``: newline-delimited JSON events over a TCP
    connection (``socket_options`` needs ``host`` and ``port``) — the
    network stream path exercised end-to-end in tests via a local server.
    Not for production (no replay, no offsets); it exists as the
    integration seam between the file fixture and a real broker.
    """
    ensure_session_confs(spark)
    if source == "socket":
        opts = socket_options or {}
        if "host" not in opts or "port" not in opts:
            raise ValueError("socket source needs socket_options with 'host' and 'port'")
        raw = (
            spark.readStream.format("socket")
            .option("host", opts["host"])
            .option("port", int(opts["port"]))
            .load()
        )
        return parse_socket_lines(raw)
    if source == "kafka":
        opts = kafka_options or {}
        if "kafka.bootstrap.servers" not in opts:
            raise ValueError(
                "kafka source needs kafka_options with 'kafka.bootstrap.servers'"
                " (plus a 'subscribe'/'subscribePattern'/'assign' option)"
            )
        if not any(k in opts for k in ("subscribe", "subscribePattern", "assign")):
            raise ValueError(
                "kafka source needs a subscription option: one of"
                " 'subscribe', 'subscribePattern', or 'assign'"
            )
        raw = spark.readStream.format("kafka").options(**opts).load()
        return parse_kafka_events(raw)
    if source != "file":
        raise ValueError(
            f"unknown source {source!r}: expected 'file', 'kafka', or 'socket'"
        )
    if events_path is None:
        raise ValueError("file source needs events_path (a directory to tail)")
    # Same dual-encoding probe as the batch loader (sources/tables.py):
    # testdata has stored ts both as int64-ns and native TIMESTAMP across
    # driver versions. An empty landing directory (files arrive later)
    # can't be probed — default to the int64-ns layout, which is also the
    # Kafka JSON value contract.
    from trafficteach_spark.sources.tables import _events_ts_kind

    try:
        kind = _events_ts_kind(events_path)
    except FileNotFoundError:
        import warnings

        # If native-TIMESTAMP parquet lands later, a LongType schema would
        # read its ts column as nulls/garbage SILENTLY — warn loudly so the
        # operator knows the layout was assumed, not probed (round-4
        # advisory). Re-probing on first trigger isn't possible from here
        # (the schema is fixed at stream definition), so the remedy is to
        # restart the stream once files exist.
        warnings.warn(
            f"streaming source dir {events_path!r} is empty: assuming the "
            "int64-ns events layout; if native-TIMESTAMP files land here, "
            "restart the stream so the schema can be probed",
            stacklevel=2,
        )
        kind = "int64_ns"
    if kind == "timestamp":
        return (
            spark.readStream.schema(schemas.EVENTS)
            .option("maxFilesPerTrigger", 4)
            .parquet(events_path)
        )
    raw = (
        spark.readStream.schema(schemas.EVENTS_PHYSICAL)
        .option("maxFilesPerTrigger", 4)
        .parquet(events_path)
    )
    return _with_event_time(raw)


def stream_sliding_avg(events: DataFrame) -> DataFrame:
    """O36+O37: watermarked event-time sliding window, reusing the exact
    batch aggregation (q20).

    Watermarks only attach to TIMESTAMP (not TIMESTAMP_NTZ) columns; the
    session timezone is pinned to UTC (ensure_session_confs), so casting
    through TIMESTAMP and back is value-identity and the stream's output
    schema stays bit-identical to batch q20's.
    """
    marked = watermarked(events)
    return sliding_window_agg(marked).withColumns(
        {
            "window_start": F.col("window_start").cast("timestamp_ntz"),
            "window_end": F.col("window_end").cast("timestamp_ntz"),
        }
    )


def stage_events_dir(sf_dir: str, staging_dir: str) -> str:
    """Adapt the single-file fixture to the directory layout the file
    source tails: symlink ``events.parquet`` into ``staging_dir``. A real
    deployment already has a landing directory (or Kafka) — this exists
    only so the fixture can play one."""
    os.makedirs(staging_dir, exist_ok=True)
    src = os.path.join(sf_dir, "events.parquet")
    dst = os.path.join(staging_dir, "events-00000.parquet")
    # lexists, not exists: exists() follows the link and returns False
    # for a DANGLING symlink (fixture regenerated elsewhere), so a
    # restage would crash on FileExistsError instead of relinking
    # (round-6 review finding).
    if os.path.lexists(dst):
        if os.path.realpath(dst) == os.path.realpath(src):
            return staging_dir
        os.remove(dst)  # stale or dangling: point at the current fixture
    os.symlink(src, dst)
    return staging_dir


def start_demo(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    table_name: str = "stream_q20",
    available_now: bool = True,
) -> StreamingQuery:
    """Wire source -> window agg -> in-memory sink with checkpointing (O38).

    ``available_now=True`` processes every existing file then stops (the
    testable mode); ``False`` keeps the query live for a real tail. The
    memory sink in complete mode re-emits the full window table each
    micro-batch; a production job would writeStream to parquet/Kafka in
    update mode and let the watermark expire state.
    """
    staged = stage_events_dir(sf_dir, checkpoint_dir + "-in")
    events = read_event_stream(spark, staged)
    agg = stream_sliding_avg(events)
    writer = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(table_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_session_windows(events: DataFrame) -> DataFrame:
    """O39 streaming form: native ``session_window`` sessionization on
    the watermarked event-time stream, same SESSION_GAP_MIN gap and output
    shape as batch q22 (the NTZ casts mirror :func:`stream_sliding_avg`
    — watermarks attach only to TIMESTAMP, and the pinned-UTC session tz
    makes the round-trip a value identity).

    Append-mode semantics (the only mode session aggregation supports
    with a watermark): a session row emits once its window can no longer
    grow — i.e. when the watermark passes its end + gap. Sessions still
    open against the final watermark stay in state and do NOT emit; the
    parity test asserts exactly that subset relation against batch q22.
    """
    marked = watermarked(events)
    return (
        marked.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"),
            "user_id",
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
        )
    )


def stream_dedup_events(events: DataFrame) -> DataFrame:
    """Streaming exact dedup — the ingest-edge COMPANION of q85's batch
    window-dedup, not its twin: this stage keys on event_id alone
    (exactly-once for redelivered sends), while q85's backfill also
    collapses DISTINCT event_ids sharing a (user, type, bucket) cell —
    see q85's docstring for the precise keep-set difference.
    (At-least-once sources redeliver; this makes the downstream
    exactly-once on event_id): ``dropDuplicatesWithinWatermark`` keeps
    the first arrival of each event_id and ages its dedup state out
    once the watermark passes, so state is bounded by rate x watermark
    horizon instead of growing forever (the plain streaming
    ``dropDuplicates`` would leak state without a watermark — at 100 TB
    /day that difference is the job surviving the week).

    A duplicate arriving WITHIN the watermark horizon is always
    dropped; one arriving later than the horizon may be re-admitted —
    that is the documented trade (same contract as the engine's late-row
    handling), and the ingest SLA picks the horizon accordingly.

    Thin binding of :func:`trafficteach_spark.streaming.stateful.
    streaming_dedup` to this module's WATERMARK constant — ONE
    implementation (round-6 review deduplicated the two copies).
    """
    from trafficteach_spark.streaming.stateful import streaming_dedup

    return streaming_dedup(events, WATERMARK)
