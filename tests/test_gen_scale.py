"""Replica-generator invariants (cheap, no Spark): the id strides must
exceed every source table's max id or copies collide and merge
different keys' histories — the bug that contaminated the first
scale-study run (BASELINE.md)."""

from __future__ import annotations

import duckdb

from tools.gen_scale import DOC_ID_STRIDE, EVENT_ID_STRIDE, USER_ID_STRIDE

SRC = "/root/testdata/sf0.1"


def _max(table: str, col: str) -> int:
    return duckdb.sql(
        f"SELECT MAX({col}) FROM read_parquet('{SRC}/{table}.parquet')"
    ).fetchone()[0]


def test_strides_exceed_source_id_ranges():
    assert EVENT_ID_STRIDE > _max("events", "event_id")
    assert USER_ID_STRIDE > _max("events", "user_id")
    assert DOC_ID_STRIDE > _max("documents", "doc_id")
    assert DOC_ID_STRIDE > _max("embeddings", "vec_id")


def test_scaled_documents_recompute_n_chars(tmp_path):
    """Copies i>0 remap the text (word -> word+i), so n_chars must be
    recomputed from the remapped text — a stale copy of the source column
    would skew every text-stats query over scaled fixtures without any
    parity signal (both engines would read the same wrong value)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "sf_x2")
    subprocess.run(
        [sys.executable, "tools/gen_scale.py", "2", out, "/root/testdata/sf0.001"],
        check=True,
        cwd=repo,
        timeout=420,
    )
    bad = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{out}/documents.parquet/*.parquet')"
        " WHERE n_chars <> length(text)"
    ).fetchone()[0]
    assert bad == 0


def test_tpch_strides_exceed_source_id_ranges():
    from tools.gen_scale import CUST_KEY_STRIDE, ORDER_KEY_STRIDE, PART_KEY_STRIDE

    assert ORDER_KEY_STRIDE > _max("orders", "o_orderkey")
    assert ORDER_KEY_STRIDE > _max("lineitem", "l_orderkey")
    assert CUST_KEY_STRIDE > _max("orders", "o_custkey")
    assert PART_KEY_STRIDE > _max("lineitem", "l_partkey")


def test_copy_shift_exceeds_source_date_span():
    """Time-disjointness invariant: the per-copy date shift must exceed
    the source's whole order-to-ship date span, or replica copies
    overlap in time and range-join pairs scale k^2 instead of k (the
    measured 4.00x-at-k=2 defect this constant exists to prevent)."""
    from tools.gen_scale import _COPY_SHIFT_DAYS

    span_days = duckdb.sql(
        f"""
        SELECT datediff('day',
            (SELECT MIN(o_orderdate) FROM read_parquet('{SRC}/orders.parquet')),
            (SELECT MAX(l_shipdate) FROM read_parquet('{SRC}/lineitem.parquet')))
        """
    ).fetchone()[0]
    assert _COPY_SHIFT_DAYS > span_days


def test_dim_strides_exceed_dim_table_maxima():
    """customer/part are now replicated too, so the strides must clear
    the DIM tables' own key maxima (which can exceed the fact-side
    maxima: customers with no orders, parts never ordered) or replica
    dim keys collide and merge different customers/parts."""
    from tools.gen_scale import CUST_KEY_STRIDE, PART_KEY_STRIDE

    assert CUST_KEY_STRIDE > _max("customer", "c_custkey")
    assert PART_KEY_STRIDE > _max("part", "p_partkey")


def test_hybrid_doc_mode_shares_stop_terms_and_remaps_content(tmp_path):
    """doc_mode=hybrid must keep the source's high-df terms (df*10 >
    n_docs) VERBATIM across copies — so their df scales with the corpus
    the way real Zipf stopwords do and a corpus-relative df cap keeps
    dropping them — while every content term is remapped per copy.
    Also: an unknown doc_mode must be rejected, not silently treated as
    'remap' (a typo would regenerate the pathological self-similar
    corpus hybrid exists to avoid)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "sf_hyb")
    subprocess.run(
        [sys.executable, "tools/gen_scale.py", "2", out,
         "/root/testdata/sf0.001", "documents", "hybrid"],
        check=True,
        cwd=repo,
        timeout=420,
    )
    src = "/root/testdata/sf0.001"
    n_src = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{src}/documents.parquet')"
        " WHERE text IS NOT NULL"
    ).fetchone()[0]
    stop = {
        r[0]
        for r in duckdb.sql(
            "SELECT term FROM (SELECT unnest(list_distinct(string_split(text, ' ')))"
            f" AS term, doc_id FROM read_parquet('{src}/documents.parquet')"
            " WHERE text IS NOT NULL)"
            f" GROUP BY term HAVING COUNT(*) * 10 > {n_src}"
        ).fetchall()
    }
    assert stop, "fixture must have at least one high-df term"
    # Copy-1 docs (doc_id >= stride): every token is either a shared stop
    # term (unsuffixed) or a remapped content term ending in '1'.
    from tools.gen_scale import DOC_ID_STRIDE

    toks = [
        r[0]
        for r in duckdb.sql(
            "SELECT DISTINCT unnest(string_split(text, ' ')) AS t"
            f" FROM read_parquet('{out}/documents.parquet/*.parquet')"
            f" WHERE doc_id >= {DOC_ID_STRIDE} AND text IS NOT NULL"
        ).fetchall()
    ]
    shared = [t for t in toks if t in stop]
    remapped = [t for t in toks if t.endswith("1") and t not in stop]
    stray = [t for t in toks if t not in stop and not t.endswith("1")]
    assert shared, "copy 1 must keep the stop terms verbatim"
    assert remapped, "copy 1 must remap the content vocabulary"
    assert stray == [], f"tokens neither shared-stop nor remapped: {stray[:5]}"

    proc = subprocess.run(
        [sys.executable, "tools/gen_scale.py", "2", str(tmp_path / "x"),
         "/root/testdata/sf0.001", "documents", "hybird"],
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert proc.returncode != 0
    assert "unknown doc_mode" in (proc.stderr + proc.stdout)
