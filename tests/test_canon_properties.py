"""Property tests (hypothesis) for the pure canonicalization layer the
parity hash depends on — if _canon is wrong, every hash comparison is
built on sand (SURVEY.md §6 layer 3)."""

from __future__ import annotations

import decimal
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from tools.parity import _canon


@given(st.floats(allow_nan=False, allow_infinity=False))
def test_canon_float_rounding_idempotent(x):
    # _canon compares floats at 9 decimals; a value and its 9-decimal
    # rounding must therefore canonicalize identically.
    assert _canon(x) == _canon(round(x, 9))


def test_canon_zero_signs_collapse():
    assert _canon(0.0) == _canon(-0.0) == "0.0"
    assert _canon(decimal.Decimal("0")) == _canon(decimal.Decimal("-0")) == "0.0"


@given(st.decimals(allow_nan=False, allow_infinity=False, places=6,
                   min_value=-10**12, max_value=10**12))
def test_canon_decimal_matches_equal_float(d):
    f = float(d)
    if math.isfinite(f) and abs(f) < 1e15:
        assert _canon(d) == _canon(f)


@given(st.integers(min_value=-2**63, max_value=2**63 - 1))
def test_canon_int_is_repr(n):
    assert _canon(n) == str(n)


def test_canon_nan_and_null():
    assert _canon(None) == "NULL"
    assert _canon(float("nan")) == "NaN"


# ----------------------------------------------------------- BPE ------
# Round-5 verdict item 4: pin the DISTRIBUTED BPE trainer + encoder
# against a pure-Python reference on random small corpora — same merge
# table, same encoded output — the same randomized-reference pattern as
# the EWMA and SCD2 chain tests.

def _bpe_reference(word_counts, n_merges, min_pair_count):
    """Pure-Python BPE with the engine's documented tie rule
    (count desc, then pair lexicographic asc): returns (merges, syms)."""
    from collections import Counter

    syms = {w: tuple(list(w) + ["</w>"]) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, n in word_counts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += n
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_pair_count:
            break
        merges.append((a, b, n))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = tuple(out)
    return merges, syms


_corpus_strategy = st.lists(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=5),
        min_size=1,
        max_size=8,
    ),
    min_size=2,
    max_size=8,
)


@settings(max_examples=8, deadline=None)
@given(docs_words=_corpus_strategy)
def test_bpe_train_encode_roundtrip_property(spark, docs_words):
    import shutil
    import tempfile
    from collections import Counter

    from trafficteach_spark import schemas
    from trafficteach_spark.registry import queries

    queries()  # ordered module load: corpus requires dedup registered first
    from trafficteach_spark.operators.llm.corpus import bpe_encode, bpe_train

    texts = [" ".join(words) for words in docs_words]
    tmp = tempfile.mkdtemp(prefix="bpe_prop_")
    try:
        rows = [
            (i, t, "en", "web", len(t)) for i, t in enumerate(texts)
        ]
        spark.createDataFrame(rows, schemas.DOCUMENTS).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/documents.parquet")

        merges, vocab = bpe_train(spark, tmp, n_merges=6, min_pair_count=2)

        wc = Counter(w for t in texts for w in t.lower().split())
        ref_merges, ref_syms = _bpe_reference(wc, n_merges=6, min_pair_count=2)
        # 1. identical merge table (order, pairs, counts)
        assert merges == ref_merges, (merges, ref_merges)
        # 2. identical final vocabulary segmentation
        got_syms = {r["w"]: tuple(r["syms"]) for r in vocab.collect()}
        assert got_syms == ref_syms

        # 3. encoder reproduces the training segmentation on the corpus,
        #    and concatenating a word's tokens round-trips the word
        docs_df = spark.createDataFrame(rows, schemas.DOCUMENTS)
        enc = {
            r["doc_id"]: r["tokens"]
            for r in bpe_encode(docs_df, "text", merges).collect()
        }
        for i, t in enumerate(texts):
            expect = [s for w in t.lower().split() for s in ref_syms[w]]
            assert enc[i] == expect, (i, enc[i], expect)
            assert "".join(enc[i]) == "".join(
                w + "</w>" for w in t.lower().split()
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
