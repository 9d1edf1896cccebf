"""Multimodal operators: documents x embeddings, opaque binary columns
(SURVEY.md §3 X5).

North-star LLM-pipeline block: the text⋈vector join every multimodal
dataset needs, plus the binary-payload plumbing (typed metadata, Arrow
batch transfer, ``mapInPandas`` feature extraction) that real image/audio
pipelines hang decode/resize/frame-sample stages on. The actual codecs are
NOT in this container, so the decode step is a clearly-marked stub
(:func:`decode_image`) and the pipeline runs a deterministic fake — the
Spark-side plumbing (schema, batching, UDF signature) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trafficteach_spark.registry import register
from trafficteach_spark.sources.tables import load_table


@register(
    "q34_multimodal_join",
    oracle="""
    SELECT e.label, d.lang,
           COUNT(*) AS n_docs,
           CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars,
           ROUND(AVG(CAST(d.n_chars AS DOUBLE)), 6) AS avg_chars,
           MIN(d.doc_id) AS min_doc_id
    FROM documents d
    JOIN embeddings e ON d.doc_id = e.vec_id
    GROUP BY e.label, d.lang
    """,
    tags=("llm", "X5"),
)
def q34_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal join (X5): text records ⋈ their embedding vectors on
    doc_id = vec_id, rolled up per (label, lang).

    The struct-bundling idiom (document + vector as one typed column) is
    what replaces the reference's concat-string records (SURVEY §2.1);
    the join key is the shared id, so at 100 TB both tables are bucketed
    by it and the join is shuffle-free. One equi-join + one aggregate.
    """
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    bundled = (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .withColumn(
            "record",
            F.struct("doc_id", "lang", "n_chars", "label", "embedding"),
        )
    )
    return (
        bundled.groupBy(F.col("record.label").alias("label"), F.col("record.lang").alias("lang"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("record.n_chars").cast("long").alias("sum_chars"),
            F.round(F.avg(F.col("record.n_chars").cast("double")), 6).alias("avg_chars"),
            F.min("record.doc_id").alias("min_doc_id"),
        )
    )



# The synthesized payload window shared by every binary-pipeline query
# (q40/q41/q42): the first PAYLOAD_CHARS characters of the text, encoded
# to UTF-8 bytes. Empty/NULL texts are excluded — there is nothing to
# decode, and a zero-length payload would make frame/thumbnail indexing
# undefined (the q42 worker would crash where its oracle answered).
PAYLOAD_CHARS = 32
_ORACLE_PAYLOAD = f"substr(text, 1, {PAYLOAD_CHARS})"
_ORACLE_DOCS_FILTER = "text IS NOT NULL AND length(text) > 0"


def _payloads(docs: DataFrame) -> DataFrame:
    """(doc_id, payload: binary) for non-empty documents."""
    return docs.where(
        F.col("text").isNotNull() & (F.length("text") > 0)
    ).select(
        "doc_id",
        F.encode(F.substring("text", 1, PAYLOAD_CHARS), "utf-8").alias("payload"),
    )


def decode_image(payload: bytes) -> object:
    """STUB — real image decode (PIL/libvips/ffmpeg) is not available in
    this container. Production replaces this with the actual codec; the
    surrounding pipeline (binary column, Arrow batches, typed metadata)
    is unchanged. Kept as an explicit failure so nothing silently treats
    fake features as real ones.
    """
    raise NotImplementedError(
        "image codecs unavailable in this environment; "
        "wire PIL/libvips here in production"
    )


_FEATURE_SCHEMA = (
    "doc_id long, width long, payload_len long, payload_md5 string"
)


def _make_extract_features():
    """Build the mapInPandas worker as a closure so cloudpickle ships it BY
    VALUE (a module-level function is pickled by reference and breaks when
    the harness driver's cwd doesn't put this package on the worker path).

    Production wires :func:`decode_image` into the feature dict here (the
    stub raises by design); the deterministic md5/length features below
    are what the oracle pins. ``payload_len`` counts BYTES
    (``octet_length`` on the oracle side) so the contract holds for
    non-ASCII text too; md5 likewise hashes the UTF-8 bytes on both
    engines.
    """

    def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            payloads = pdf["payload"]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pdf["width"],
                    "payload_len": payloads.map(len).astype("int64"),
                    "payload_md5": payloads.map(
                        lambda b: _hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return extract_features


@register(
    "q40_binary_pipeline",
    # octet_length(encode(...)) = UTF-8 byte count, matching Python's
    # len(bytes); DuckDB's md5(VARCHAR) also hashes the UTF-8 bytes — the
    # contract holds for non-ASCII text, not just the ASCII fixtures.
    oracle=f"""
    SELECT doc_id,
           16 + doc_id % 64 AS width,
           CAST(octet_length(encode({_ORACLE_PAYLOAD})) AS BIGINT) AS payload_len,
           md5({_ORACLE_PAYLOAD}) AS payload_md5
    FROM documents
    WHERE {_ORACLE_DOCS_FILTER}
    """,
    tags=("llm", "X5", "multimodal"),
)
def q40_binary_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline (X5): opaque payload bytes + typed metadata
    -> Arrow-batched ``mapInPandas`` feature extraction.

    The payload here is synthesized from the text column (the container
    has no media fixtures); everything downstream — binary Spark type,
    metadata columns, batch iterator shape, deterministic features — is
    exactly the production plumbing, so the oracle can check the Python
    path end-to-end (md5/length agree with DuckDB on the same bytes).
    Decode itself is stubbed: see :func:`decode_image`.
    """
    docs = load_table(spark, sf_dir, "documents")
    payloads = _payloads(docs).withColumn(
        "width", F.lit(16) + F.col("doc_id") % 64
    )
    return payloads.mapInPandas(
        _make_extract_features(), schema=_FEATURE_SCHEMA
    )


# Frame sampling geometry: n_frames varies per doc, every STRIDE-th frame
# is kept, each frame is FRAME_CHARS of the decoded payload (cyclic
# slicing so every frame index is well-defined).
_FRAME_STRIDE = 2
_FRAME_CHARS = 8
_FRAME_SCHEMA = "doc_id long, frame_idx long, n_frames long, frame_md5 string"


def _make_sample_frames(stride: int, frame_chars: int):
    """Closure (pickled by value — see _make_extract_features) for the
    one-to-many frame-sampling worker.

    Frame boundaries are CHARACTER offsets into the decoded payload (the
    decode step a real pipeline has anyway): DuckDB 1.0 cannot substring
    or md5 a BLOB, so a byte-offset contract would be unverifiable — and
    would silently diverge from the char-based SQL on non-ASCII text.
    md5 hashes each frame's UTF-8 bytes, which both engines agree on.
    """

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "n_frames": [], "frame_md5": []}
            for doc_id, payload, n_frames in zip(
                pdf["doc_id"], pdf["payload"], pdf["n_frames"]
            ):
                text = bytes(payload).decode("utf-8")
                for idx in range(0, int(n_frames), stride):
                    start = (idx * frame_chars) % len(text)
                    frame = (text + text)[start : start + frame_chars]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["n_frames"].append(n_frames)
                    out["frame_md5"].append(
                        _hashlib.md5(frame.encode("utf-8")).hexdigest()
                    )
            yield _pd.DataFrame(out)

    return sample_frames


@register(
    "q41_frame_sample",
    oracle=f"""
    WITH vids AS (
        SELECT doc_id,
               {_ORACLE_PAYLOAD} AS payload,
               4 + doc_id % 8 AS n_frames
        FROM documents
        WHERE {_ORACLE_DOCS_FILTER}
    )
    SELECT v.doc_id,
           f.f AS frame_idx,
           v.n_frames,
           md5(substr(payload || payload,
                      ((f.f * {_FRAME_CHARS}) % length(payload)) + 1,
                      {_FRAME_CHARS})) AS frame_md5
    FROM vids v
    CROSS JOIN range(0, 12) f(f)
    WHERE f.f < v.n_frames AND f.f % {_FRAME_STRIDE} = 0
    """,
    tags=("llm", "X5", "multimodal"),
)
def q41_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (X5): one-to-many ``mapInPandas`` over opaque video
    payloads — every {_FRAME_STRIDE}nd frame of an n_frames clip is
    extracted and fingerprinted.

    This is the UDTF-shaped binary pipeline (one input row -> many frame
    rows) that video/audio feature extraction needs; the "decode" is the
    same deterministic fake as q40 (real codecs absent — see
    :func:`decode_image`), but batching, fan-out and schema are the
    production plumbing. Spark parallelism: frames of one clip stay in
    one task (good locality); at 100 TB the payload column is the only
    heavy bytes moved, and the scan prunes metadata-only queries to the
    parquet footer columns.
    """
    docs = load_table(spark, sf_dir, "documents")
    vids = _payloads(docs).withColumn(
        "n_frames", (F.lit(4) + F.col("doc_id") % 8).cast("long")
    )
    return vids.mapInPandas(
        _make_sample_frames(_FRAME_STRIDE, _FRAME_CHARS), schema=_FRAME_SCHEMA
    )


# Resize geometry: every payload downsampled to a fixed TARGET_CHARS
# "thumbnail" by stride sampling (the 1-D analog of nearest-neighbor
# image downscaling).
_TARGET_CHARS = 8
_RESIZE_SCHEMA = (
    "doc_id long, orig_len long, thumb string, thumb_md5 string"
)


def _make_resize(target_chars: int):
    """Closure (pickled by value) for the resize worker: deterministic
    nearest-neighbor downsample of the decoded payload to a fixed size —
    the production slot for PIL's Image.resize; the sampling indices
    (floor(j * n / target)) are the standard nearest-neighbor grid, so
    swapping in a real codec changes the pixel math, not the plumbing."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            out = {"doc_id": [], "orig_len": [], "thumb": [], "thumb_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                text = bytes(payload).decode("utf-8")
                n = len(text)
                thumb = "".join(
                    text[(j * n) // target_chars] for j in range(target_chars)
                )
                out["doc_id"].append(doc_id)
                out["orig_len"].append(n)
                out["thumb"].append(thumb)
                out["thumb_md5"].append(
                    _hashlib.md5(thumb.encode("utf-8")).hexdigest()
                )
            yield _pd.DataFrame(out)

    return resize


@register(
    "q42_resize",
    oracle=f"""
    WITH p AS (
        SELECT doc_id,
               {_ORACLE_PAYLOAD} AS payload,
               length({_ORACLE_PAYLOAD}) AS n
        FROM documents
        WHERE {_ORACLE_DOCS_FILTER}
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS orig_len,
           string_agg(substr(payload, (j.j * n) // {_TARGET_CHARS} + 1, 1),
                      '' ORDER BY j.j) AS thumb,
           md5(string_agg(substr(payload, (j.j * n) // {_TARGET_CHARS} + 1, 1),
                          '' ORDER BY j.j)) AS thumb_md5
    FROM p CROSS JOIN range({_TARGET_CHARS}) j(j)
    GROUP BY doc_id, n
    """,
    tags=("llm", "X5", "multimodal"),
)
def q42_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize (X5): downsample every payload to a fixed-size thumbnail
    via nearest-neighbor stride sampling in an Arrow-batched
    ``mapInPandas`` — the third verb of the brief's multimodal list
    (decode/feature-extract = q40, frame-sample = q41, resize = here).

    Per-row, no shuffle; at 100 TB this is a pure map stage whose cost
    is the payload I/O, exactly like a real thumbnailing pass. Character
    semantics for the same reason as q41 (DuckDB cannot md5 BLOBs).
    """
    docs = load_table(spark, sf_dir, "documents")
    return _payloads(docs).mapInPandas(_make_resize(_TARGET_CHARS), schema=_RESIZE_SCHEMA)
