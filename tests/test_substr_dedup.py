"""Exact substring dedup (``operators.substr_dedup``) semantics.

The operator family implements the ExactSubstr policy (Lee et al. 2022):
every substring of length ≥ k that occurs more than once keeps only its
corpus-order first occurrence.  The contract queries (``dup_spans``,
``substring_dedup``) hash-match full-algorithm DuckDB oracles; these
tests pin the semantic corners the fixture can't isolate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hidden_characters_detector_spark.operators import substr_dedup as sd
from hidden_characters_detector_spark.operators.text_ops import tokenize

K = 10
SF_DIR = "/root/testdata/sf0.001"
W = "abcdeZYXWVfghijPQRST"      # 20 chars, aperiodic at k=10
X = "0123456789XYZUVWQRST"
Y = "helloworldthisisatest"     # 21 chars
Z = "ENDINGPIECEDISTINCT9"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, X + Y),     # first occurrence of Y
        (2, Y + Z),     # repeated Y prefix
        (3, W + W),     # within-doc doubled block
        (4, "short"),   # shorter than k: never spanned
        (5, None),      # NULL text
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_spans_first_occurrence_kept(spark, corpus):
    spans = {(r.doc_id, r.span_start, r.span_end)
             for r in sd.duplicated_spans(corpus, k=K).collect()}
    # doc 1 holds every first occurrence -> no spans; doc 2's Y prefix is
    # the repeat; doc 3's second W block is the repeat (k-grams crossing
    # the W|W seam are unique, so the span starts exactly at |W|)
    assert spans == {(2, 0, len(Y)), (3, len(W), 2 * len(W))}


def test_remove_rebuilds_exactly(spark, corpus):
    got = {r.doc_id: r.text_dedup
           for r in sd.remove_duplicated_spans(corpus, k=K).collect()}
    assert got == {1: X + Y, 2: Z, 3: W, 4: "short", 5: ""}


def test_periodic_content_collapses_to_one_period(spark):
    """A doc of m repeats of an aperiodic block keeps exactly one block:
    every k-gram at pos >= |block| equals the one |block| earlier, so the
    span is [|block|, m*|block|) — the subtle ExactSubstr corner where
    'remove later occurrences' compounds transitively."""
    df = spark.createDataFrame([(1, W * 4)], "doc_id long, text string")
    got = sd.remove_duplicated_spans(df, k=K).collect()[0].text_dedup
    assert got == W


def test_partitioning_independence(spark, corpus):
    a = sorted(map(tuple, sd.duplicated_spans(corpus, k=K).collect()))
    b = sorted(map(tuple, sd.duplicated_spans(
        corpus.repartition(7), k=K).collect()))
    assert a == b and a  # non-vacuous


def test_token_table_parity(spark, corpus):
    """Span detection over the token table (input_hint shape) equals the
    text path — the tokens ARE the codepoints, so the rolling hashes and
    therefore the spans are identical."""
    pos = sd.token_position_hashes(tokenize(corpus), k=K)
    a = sorted(map(tuple, sd.duplicated_spans(corpus, k=K).collect()))
    b = sorted(map(tuple,
                   sd.duplicated_spans(corpus, k=K,
                                       positions=pos).collect()))
    assert a == b


def test_caller_spans_overlapping_and_out_of_range(spark):
    """remove_duplicated_spans must stay consistent under caller-supplied
    spans that overlap or overrun the document — the kept-count comes
    from the paint mask, not from summed span lengths."""
    df = spark.createDataFrame([(1, "abcdefghij")],
                               "doc_id long, text string")
    spans = spark.createDataFrame(
        [(1, 2, 6), (1, 4, 8), (1, 9, 99)],
        "doc_id long, span_start long, span_end long")
    got = sd.remove_duplicated_spans(df, k=K, spans=spans) \
        .collect()[0].text_dedup
    assert got == "abi"  # removes [2,8) ∪ [9,10)


def test_no_spans_passes_all_columns_through(spark):
    df = spark.createDataFrame([(1, "unique-one", "m1"),
                                (2, "unique-two", "m2")],
                               "doc_id long, text string, meta string")
    out = sd.remove_duplicated_spans(df, k=K).orderBy("doc_id").collect()
    assert [(r.doc_id, r.text, r.meta, r.text_dedup) for r in out] == [
        (1, "unique-one", "m1", "unique-one"),
        (2, "unique-two", "m2", "unique-two")]


def test_cross_doc_first_occurrence_is_doc_order(spark):
    """The keeper is the smallest (doc_id, pos) — swap ingestion order /
    partitioning and the SAME doc keeps the span."""
    blk = "QWERTYUIOPASDFGHJKLZ"
    rows = [(9, "zz" + blk), (2, blk + "yy")]
    for perm in (rows, rows[::-1]):
        df = spark.createDataFrame(perm, "doc_id long, text string")
        spans = {(r.doc_id, r.span_start, r.span_end)
                 for r in sd.duplicated_spans(df, k=K).collect()}
        assert spans == {(9, 2, 2 + len(blk))}


def test_remove_derives_spans_excluding_nothing_extra(spark, corpus):
    """Explicit spans arg == default derivation."""
    spans = sd.duplicated_spans(corpus, k=K)
    a = {r.doc_id: r.text_dedup for r in
         sd.remove_duplicated_spans(corpus, k=K, spans=spans).collect()}
    b = {r.doc_id: r.text_dedup for r in
         sd.remove_duplicated_spans(corpus, k=K).collect()}
    assert a == b


def test_winnow_select_matches_bruteforce():
    """The O(n log w) sparse-table kernel == a literal per-window
    rightmost-argmin reference, across doc boundaries, hash ties, and
    values equal to the sentinel (2^64−1).  No Spark needed."""
    import numpy as np

    def ref(docs, w):
        out, base = [], 0
        for hs in docs:
            sel, n = set(), len(hs)
            for i in range(n):
                win = hs[i:min(i + w, n)]
                mn = min(win)
                sel.add(base + i
                        + max(q for q in range(len(win)) if win[q] == mn))
            out.extend(sorted(sel))
            base += n
        return out

    rng = np.random.default_rng(7)
    for trial in range(200):
        docs = []
        for _ in range(int(rng.integers(1, 6))):
            n = int(rng.integers(0, 25))
            vals = rng.integers(0, 6, size=n).astype(np.uint64)
            vals[rng.random(n) < 0.1] = np.uint64(0xFFFFFFFFFFFFFFFF)
            docs.append(list(vals))
        w = int(rng.integers(2, 9))
        flat = np.array([v for d in docs for v in d], dtype=np.uint64)
        off = np.concatenate(
            [[0], np.cumsum([len(d) for d in docs])]).astype(np.int64)
        got_flat, got_row = sd._winnow_select(flat, off, w)
        assert list(got_flat) == ref(docs, w), (trial, docs, w)
        for fi, r in zip(got_flat, got_row):
            assert off[r] <= fi < off[r + 1]


def test_winnow_one_is_exact_path(spark, corpus):
    """``winnow=1`` must be byte-identical to the default exact path."""
    a = sorted(map(tuple, sd.duplicated_spans(corpus, k=K).collect()))
    b = sorted(map(tuple,
                   sd.duplicated_spans(corpus, k=K, winnow=1).collect()))
    assert a == b


def test_winnow_recall_guarantee(spark):
    """Every duplicated substring of length >= winnow + k - 1 must be
    detected (the winnowing guarantee): identical content selects
    identical relative fingerprints, so the repeat shares a duplicated
    selected position.  The span must sit inside the repeat and the
    first occurrence must stay unspanned."""
    w = 6
    blk = "The winnowing guarantee needs length fifty plus!"  # 48 >= w+K-1
    rows = [(1, "aaaaaaaNOISEPREFIXzzz" + blk),
            (2, blk + "QQdistinctSUFFIX0123")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = sd.duplicated_spans(df, k=K, winnow=w).collect()
    assert spans and all(r.doc_id == 2 for r in spans)
    assert all(0 <= r.span_start and r.span_end <= len(blk) for r in spans)


def test_winnow_density_bound(spark):
    """Selected fingerprints ~ 2n/(w+1): at w=8 the verdict shuffle must
    carry well under half the exact path's rows on real text."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    exact = sd.position_hashes(docs, k=K).count()
    winnowed = sd.position_hashes(docs, k=K, winnow=8).count()
    assert 0 < winnowed < 0.5 * exact


def test_winnow_partitioning_independence(spark, corpus):
    a = sorted(map(tuple,
                   sd.duplicated_spans(corpus, k=K, winnow=4).collect()))
    b = sorted(map(tuple, sd.duplicated_spans(
        corpus.repartition(7), k=K, winnow=4).collect()))
    assert a == b


def test_winnow_spans_subset_of_exact(spark):
    """Winnowed spans only ever cover chars the exact path also covers
    (selection is a subset of positions, marks are a subset of marks —
    and touching winnowed covers imply touching exact covers, so each
    winnowed span nests inside ONE exact span)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text").limit(200)
    exact = {}
    for r in sd.duplicated_spans(docs, k=K).collect():
        exact.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    for r in sd.duplicated_spans(docs, k=K, winnow=8).collect():
        assert any(s <= r.span_start and r.span_end <= e
                   for s, e in exact.get(r.doc_id, [])), r


def test_span_bounds_inside_documents(spark, corpus):
    joined = (sd.duplicated_spans(corpus, k=K)
              .join(corpus.select("doc_id",
                                  F.length("text").alias("_len")),
                    "doc_id"))
    bad = joined.where((F.col("span_start") < 0)
                       | (F.col("span_end") > F.col("_len"))
                       | (F.col("span_end") - F.col("span_start") < K))
    assert bad.count() == 0


def test_mark_strategies_identical(spark, corpus):
    """mark="window" (default) and mark="join" (skew-proof) are two
    physical strategies for the same verdict — identical spans."""
    a = sorted(map(tuple, sd.duplicated_spans(corpus, k=K).collect()))
    b = sorted(map(tuple, sd.duplicated_spans(corpus, k=K,
                                              mark="join").collect()))
    assert a == b
    with __import__("pytest").raises(ValueError, match="mark"):
        sd.duplicated_spans(corpus, k=K, mark="sort")
