"""Benchmark-decontamination semantics and plan shapes."""

from __future__ import annotations

import numpy as np

from hidden_characters_detector_spark.operators import decontam

# a 30-char phrase planted in both train and eval (>= one full 20-gram)
PHRASE = "the quick brown fox jumps over"


def _rand_text(seed, n=120):
    rng = np.random.default_rng(seed)
    return "".join(chr(ord("a") + int(x)) for x in rng.integers(0, 26, n))


def _fixtures(spark):
    train = spark.createDataFrame(
        [("t0", f"intro {PHRASE} outro " + _rand_text(0)),   # contaminated
         ("t1", _rand_text(1)),                              # clean
         ("t2", _rand_text(2) + PHRASE),                     # contaminated
         ("t3", "short")],                                   # < k, no signal
        "doc_id string, text string")
    evl = spark.createDataFrame(
        [("e0", f"Q: {PHRASE}? A: yes"),
         ("e1", _rand_text(99))],
        "doc_id string, text string")
    return train, evl


def test_contamination_report_flags_shared_kgrams(spark):
    train, evl = _fixtures(spark)
    got = {r["doc_id"]: r["n_hits"] for r in
           decontam.contamination_report(train, evl, k=20).collect()}
    assert set(got) == {"t0", "t2"}         # clean/short docs emit no row
    # the planted 30-char phrase shares its 11 internal 20-grams; t0 also
    # shares the boundary gram (phrase preceded by a space on BOTH sides)
    assert got["t0"] == 12
    assert got["t2"] == 11


def test_decontaminate_drops_contaminated_keeps_schema(spark):
    train, evl = _fixtures(spark)
    out = decontam.decontaminate(train, evl, k=20)
    assert out.columns == train.columns
    assert {r["doc_id"] for r in out.collect()} == {"t1", "t3"}


def test_min_hits_threshold(spark):
    train, evl = _fixtures(spark)
    out = decontam.decontaminate(train, evl, k=20, min_hits=12)
    # t2's 11 shared 20-grams < 12: it survives; t0's 12 do not
    assert {r["doc_id"] for r in out.collect()} == {"t1", "t2", "t3"}


def test_doc_shingle_hashes_distinct_per_doc(spark):
    df = spark.createDataFrame(
        [("a", "xyxyxyxyxyxyxyxyxyxyxyxyxy")],   # repeating 2-period text
        "doc_id string, text string")
    rows = decontam.doc_shingle_hashes(df, k=20).collect()
    # 7 window starts but only 2 distinct shingles ("xyxy..." / "yxyx...")
    assert len(rows) == 2
    assert len({r["shingle_hash"] for r in rows}) == 2


def test_contamination_report_shuffle_path_matches_broadcast(spark):
    """broadcast_eval=False (the huge-eval escape hatch) must produce the
    identical report through the shuffle semi-join plan."""
    train, evl = _fixtures(spark)
    a = sorted(map(tuple,
                   decontam.contamination_report(train, evl, k=20)
                   .collect()))
    b = sorted(map(tuple,
                   decontam.contamination_report(
                       train, evl, k=20, broadcast_eval=False).collect()))
    assert a == b


def test_token_path_matches_text_path(spark):
    """The token-table shingle path (and the broadcast streaming gate
    built on it) must flag exactly the docs the text-path report flags —
    tokens ARE codepoints, so the hashes coincide for equal content."""
    from hidden_characters_detector_spark.operators.text_ops import tokenize

    train, evl = _fixtures(spark)
    bc = decontam.build_eval_filter(spark, tokenize(evl), k=20)
    flagged = decontam.mark_contaminated(tokenize(train), bc, k=20)
    got = {r["doc_id"] for r in flagged.collect() if r["contaminated"]}
    expect = {r["doc_id"] for r in
              decontam.contamination_report(train, evl, k=20).collect()}
    assert got == expect == {"t0", "t2"}
    # and per-doc hit counts coincide between the two relational paths
    a = sorted(map(tuple, decontam.contamination_report(
        train, evl, k=20).collect()))
    th = decontam.token_shingle_hashes(tokenize(train), k=20)
    eh = decontam.token_shingle_hashes(tokenize(evl), k=20) \
        .select("shingle_hash").distinct()
    from pyspark.sql import functions as F
    b = sorted(map(tuple, th.join(eh, "shingle_hash", "left_semi")
                   .groupBy("doc_id")
                   .agg(F.count("*").cast("long").alias("n_hits"))
                   .collect()))
    assert a == b


def test_decontaminate_plan_fused_probe_no_cartesian(spark):
    """r6: the broadcast path fuses the membership probe into the
    train-side shingle kernel — ONE MapInArrow emitting (id, n_hits) for
    hit docs only; the per-(doc, shingle) fan-out never crosses the Arrow
    boundary or a join, the hit count partial-aggregates before its
    exchange, and no exchange carries the text column."""
    train, evl = _fixtures(spark)
    plan = (decontam.contamination_report(train, evl, k=20)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert plan.count("MapInArrow") == 1       # the fused kernel probe
    assert "partial_sum" in plan               # map-side partial agg
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "text#" not in ln, ln
    # the huge-eval escape hatch keeps the relational semi-join shape
    rel = (decontam.contamination_report(train, evl, k=20,
                                         broadcast_eval=False)
           ._jdf.queryExecution().executedPlan().toString())
    assert "LeftSemi" in rel and "CartesianProduct" not in rel


def test_eval_contamination_per_item(spark):
    """Eval-side audit: e0's planted phrase leaks its 11 internal
    20-grams plus the space-boundary gram (present in t0) from TWO train
    docs; clean and sub-k eval items emit explicit zero rows."""
    train, evl = _fixtures(spark)
    evl = evl.union(spark.createDataFrame([("e2", "tiny")],
                                          "doc_id string, text string"))
    got = {r["doc_id"]: r for r in
           decontam.eval_contamination(train, evl, k=20).collect()}
    assert set(got) == {"e0", "e1", "e2"}
    e0 = got["e0"]
    assert e0["n_shingles"] == 22           # 41-char item, all distinct
    assert e0["n_leaked"] == 12
    assert e0["n_train_docs"] == 2          # t0 and t2
    assert e0["leak_frac"] == round(12 / 22, 6)
    e1 = got["e1"]
    assert e1["n_shingles"] > 0
    assert (e1["n_leaked"], e1["n_train_docs"], e1["leak_frac"]) \
        == (0, 0, 0.0)
    e2 = got["e2"]                          # shorter than k: no signal
    assert (e2["n_shingles"], e2["n_leaked"], e2["n_train_docs"],
            e2["leak_frac"]) == (0, 0, 0, 0.0)
