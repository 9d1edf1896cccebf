"""Cross-engine parity digest (harness coverage extension).

The driver's correctness gate checks the first 50 registry keys. The
engine registers 80+ queries, so the long tail past position 50 would
otherwise carry only local (``tools/parity.py``) evidence. This module
registers ONE driver-checkable query — ``q80_parity_digest`` — that runs
every demoted oracle-backed query and reduces each result to a
one-row fingerprint computed identically in Spark and DuckDB:

  qkey   — the constituent query key
  n      — COUNT(*)
  fp_int — sum over integer columns of the raw values
  fp_num — sum over double columns of ROUND(x*1000) as exact integers
  fp_str — sum over string columns of character lengths
  fp_ts  — sum over timestamp columns of epoch microseconds
           (+ date columns as days-since-epoch)

All fingerprints are integer sums, so they are order-independent and
exact (no FP accumulation ambiguity across engines); doubles enter only
through ROUND(x*1000) on values both engines computed identically (the
full per-row hash parity of every constituent is separately verified by
``tools/parity.py``, recorded per round in PARITY_LOCAL.md).

The declared schema map below is asserted against the live Spark schemas
in tests/test_registry.py, so a constituent query changing shape fails
fast instead of silently fingerprinting the wrong columns.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trafficteach_spark import registry

# key -> [(column, simpleString dtype)] for every demoted oracle-backed
# query (positions 51+ of the driver order; see registry.DRIVER_ORDER).
DIGEST_SCHEMAS: dict[str, list[tuple[str, str]]] = {
    "q40_binary_pipeline": [("doc_id", "bigint"), ("width", "bigint"), ("payload_len", "bigint"), ("payload_md5", "string")],
    "q41_frame_sample": [("doc_id", "bigint"), ("frame_idx", "bigint"), ("n_frames", "bigint"), ("frame_md5", "string")],
    "q42_resize": [("doc_id", "bigint"), ("orig_len", "bigint"), ("thumb", "string"), ("thumb_md5", "string")],
    "q51_asof_join": [("event_id", "bigint"), ("user_id", "bigint"), ("ts", "timestamp_ntz"), ("o_orderkey", "bigint"), ("o_orderdate", "timestamp_ntz")],
    "q52_percentiles": [("event_type", "string"), ("n", "bigint"), ("p50", "double"), ("p90", "double"), ("p99", "double")],
    "q53_rollup": [("event_type", "string"), ("hr", "int"), ("gid", "bigint"), ("n", "bigint"), ("sum_value", "double")],
    "q54_pivot": [("hr", "int"), ("n_click", "bigint"), ("n_error", "bigint"), ("n_purchase", "bigint"), ("n_signup", "bigint"), ("n_view", "bigint")],
    "q55_salted_distinct": [("event_type", "string"), ("n_distinct", "bigint")],
    "q56_vocab_topk": [("term", "string"), ("n", "bigint"), ("frac", "double"), ("vocab_rank", "int")],
    "q57_edit_distance": [("doc_a", "bigint"), ("doc_b", "bigint"), ("edit_dist", "int")],
    "q58_domain_mix": [("doc_id", "bigint"), ("source", "string"), ("sample_rank", "int")],
    "q59_label_centroids": [("label", "int"), ("n_vectors", "bigint"), ("centroid", "string")],
    "q60_histogram": [("event_type", "string"), ("bin_id", "int"), ("n", "bigint"), ("lo_seen", "double"), ("hi_seen", "double")],
    "q61_merge_upsert": [("o_orderkey", "bigint"), ("o_custkey", "bigint"), ("o_orderstatus", "string")],
    "q62_time_resample": [("event_type", "string"), ("hr", "timestamp"), ("n", "bigint"), ("sum_value", "double")],
    "q63_range_join": [("o_orderpriority", "string"), ("n_pairs", "bigint"), ("n_orders", "bigint"), ("sum_qty", "double")],
    "q64_cumulative": [("o_custkey", "bigint"), ("o_orderkey", "bigint"), ("seq", "bigint"), ("running_total", "double"), ("mov_avg3", "double")],
    "q65_cube": [("o_orderstatus", "string"), ("o_orderpriority", "string"), ("gid", "bigint"), ("n", "bigint"), ("sum_price", "double")],
    "q66_anomaly": [("event_type", "string"), ("hr", "timestamp"), ("n", "bigint"), ("z", "double")],
    "q67_basket_pairs": [("part_a", "bigint"), ("part_b", "bigint"), ("n_orders", "bigint")],
    "q68_attribution_join": [("user_id", "bigint"), ("view_id", "bigint"), ("view_ts", "timestamp_ntz"), ("purchase_id", "bigint"), ("purchase_ts", "timestamp_ntz"), ("purchase_value", "double")],
    "q69_unpivot": [("hr", "int"), ("event_type", "string"), ("n", "bigint")],
    "q70_trailing_range": [("o_custkey", "bigint"), ("o_orderkey", "bigint"), ("o_orderdate", "timestamp_ntz"), ("trailing_30d", "double"), ("n_30d", "bigint")],
    "q71_full_outer": [("d", "date"), ("n_orders", "bigint"), ("n_ships", "bigint"), ("presence", "string")],
    "q72_corr_stats": [("l_returnflag", "string"), ("n", "bigint"), ("qty_price_corr", "double"), ("qty_disc_covar", "double"), ("price_stddev", "double")],
    "q73_regex_extract": [("token", "string"), ("n", "bigint"), ("n_docs", "bigint")],
    "q74_rank_distribution": [("event_id", "bigint"), ("event_type", "string"), ("quartile", "int"), ("pct_rank", "double"), ("cume", "double")],
    "q75_bm25": [("doc_id", "bigint"), ("score", "double")],
    "q76_set_ops_bag": [("o_custkey", "bigint"), ("kind", "string"), ("n", "bigint")],
    "q78_id_gaps": [("event_type", "string"), ("gap_start", "bigint"), ("gap_end", "bigint"), ("n_missing", "bigint")],
    "q79_weighted_sample": [("o_orderkey", "bigint"), ("o_totalprice", "double"), ("o_orderpriority", "string")],
    "q81_hash_split": [("doc_id", "bigint"), ("split", "string"), ("n_chars", "bigint")],
    "q82_bpe_pairs": [("pair", "string"), ("n", "bigint")],
    "q83_feature_bins": [("l_returnflag", "string"), ("decile", "int"), ("n", "bigint"), ("lo", "double"), ("hi", "double"), ("avg_price", "double")],
    "q85_window_dedup": [("event_id", "bigint"), ("user_id", "bigint"), ("event_type", "string"), ("ts", "timestamp_ntz")],
    "q86_feature_normalize": [("l_orderkey", "bigint"), ("l_linenumber", "int"), ("l_returnflag", "string"), ("minmax", "double"), ("zscore", "double")],
    "q87_bigram_pmi": [("bigram", "string"), ("n", "bigint"), ("pmi", "double")],
    "q88_keep_best_per_cluster": [("canonical_id", "bigint"), ("best_doc_id", "bigint"), ("cluster_size", "bigint"), ("best_quality", "string"), ("best_n_tokens", "int")],
    "q89_asof_forward": [("o_orderkey", "bigint"), ("user_id", "bigint"), ("o_orderdate", "timestamp_ntz"), ("event_id", "bigint"), ("event_ts", "timestamp_ntz")],
    "q90_containment_dedup": [("doc_a", "bigint"), ("doc_b", "bigint"), ("containment", "double")],
}

_INT_TYPES = {"bigint", "int", "smallint", "tinyint"}


def _terms(cols: list[tuple[str, str]], engine: str) -> dict[str, list[str]]:
    """Per-fingerprint per-row term expressions for one engine.

    Every term is an exact BIGINT, so the enclosing SUM is
    order-independent and identical across engines.
    """
    spark = engine == "spark"
    q = (lambda c: f"`{c}`") if spark else (lambda c: f'"{c}"')
    out: dict[str, list[str]] = {"fp_int": [], "fp_num": [], "fp_str": [], "fp_ts": []}
    for name, dtype in cols:
        c = q(name)
        if dtype in _INT_TYPES:
            out["fp_int"].append(f"CAST(COALESCE({c}, 0) AS BIGINT)")
        elif dtype in ("double", "float"):
            # ROUND first (integral double), CAST second: DuckDB's
            # double->bigint cast rounds while Spark's truncates, so the
            # cast must only ever see an already-integral value.
            if spark:
                out["fp_num"].append(
                    f"CASE WHEN {c} IS NULL OR isnan({c}) THEN CAST(0 AS BIGINT)"
                    f" ELSE CAST(ROUND({c} * 1000, 0) AS BIGINT) END"
                )
            else:
                out["fp_num"].append(
                    f"CASE WHEN {c} IS NULL OR isnan({c}) THEN 0"
                    f" ELSE CAST(ROUND({c} * 1000) AS BIGINT) END"
                )
        elif dtype == "string":
            out["fp_str"].append(f"CAST(LENGTH(COALESCE({c}, '')) AS BIGINT)")
        elif dtype in ("timestamp", "timestamp_ntz"):
            # Millis, not micros: an epoch-micros SUM overflows BIGINT at
            # ~5k rows (1.7e15 each); millis keeps >100x headroom at sf0.1.
            if spark:
                out["fp_ts"].append(
                    f"COALESCE(unix_millis(CAST({c} AS TIMESTAMP)), 0)"
                )
            else:
                out["fp_ts"].append(f"COALESCE(epoch_ms({c}), 0)")
        elif dtype == "date":
            if spark:
                out["fp_ts"].append(
                    f"CAST(COALESCE(datediff({c}, DATE'1970-01-01'), 0) AS BIGINT)"
                )
            else:
                out["fp_ts"].append(
                    f"CAST(COALESCE({c} - DATE '1970-01-01', 0) AS BIGINT)"
                )
        else:  # pragma: no cover - new dtype must be handled explicitly
            raise ValueError(f"unhandled digest dtype {dtype!r} for {name!r}")
    return out


def _fp_aggs(cols: list[tuple[str, str]], engine: str) -> list[tuple[str, str]]:
    """(aggregate expression, alias) pairs for the four fingerprints."""
    terms = _terms(cols, engine)
    out = []
    for fp in ("fp_int", "fp_num", "fp_str", "fp_ts"):
        row = " + ".join(terms[fp]) if terms[fp] else "CAST(0 AS BIGINT)"
        out.append((f"CAST(COALESCE(SUM({row}), 0) AS BIGINT)", fp))
    return out


def digest_keys() -> list[str]:
    return list(DIGEST_SCHEMAS)


def build_oracle() -> str:
    subs = []
    for key, spec in registry.peek_specs().items():
        if key not in DIGEST_SCHEMAS:
            continue
        fps = ", ".join(
            f"{expr} AS {alias}" for expr, alias in _fp_aggs(DIGEST_SCHEMAS[key], "duckdb")
        )
        subs.append(
            f"SELECT '{key}' AS qkey, COUNT(*) AS n, {fps}\n"
            f"FROM (\n{spec.oracle}\n) __digest_{key}"
        )
    assert len(subs) == len(DIGEST_SCHEMAS), "digest key missing an oracle"
    return "\nUNION ALL\n".join(subs)


@registry.register("q80_parity_digest", oracle=build_oracle(), tags=("harness", "digest"))
def parity_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One fingerprint row per demoted query — the driver-facing rollup
    that keeps the 50-key correctness gate covering the whole registry.

    A global (group-less) aggregate per constituent so an empty result
    still yields its one n=0 row, exactly like the oracle's COUNT(*).
    """
    specs = registry.peek_specs()
    frames = []
    for key in DIGEST_SCHEMAS:
        df = specs[key].fn(spark, sf_dir)
        aggs = [F.count(F.lit(1)).cast("long").alias("n")] + [
            F.expr(expr).alias(alias)
            for expr, alias in _fp_aggs(DIGEST_SCHEMAS[key], "spark")
        ]
        frames.append(df.agg(*aggs).select(F.lit(key).alias("qkey"), "*"))
    return reduce(DataFrame.unionByName, frames)
