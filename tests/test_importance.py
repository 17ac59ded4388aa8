"""DSIR importance-resampling semantics, determinism and plan shape
(``operators/importance.py``).

Value-level cross-engine parity (the full arithmetic replica) is covered
by the ``dsir_weights`` / ``dsir_sample`` contract rows in
``tests/test_driver_contract.py``; these tests pin what the oracle cannot
see: hand-computed weights, partitioning independence, the
Gumbel-sampling bias toward target-like docs, and the broadcast /
TakeOrdered plan shape.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hidden_characters_detector_spark.operators import importance


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def _model(spark, counts):
    return spark.createDataFrame(
        [(w, int(c)) for w, c in counts.items()], "word string, cnt long")


# ------------------------------------------------------ log2_ratio_weights

def test_weights_hand_computed(spark):
    """One doc, two words: tgt has 'foo' 8/16, raw has 'foo' 1/16 and
    'bar' OOV both sides → per-word ratios are exact powers of two."""
    docs = _docs(spark, [("d1", "foo bar")])
    tgt = _model(spark, {"foo": 8})
    raw = _model(spark, {"foo": 1})
    out = importance.log2_ratio_weights(
        docs, tgt, raw, target_total=16, raw_total=16).collect()[0]
    # foo: (log2 8 − log2 16) − (log2 1 − log2 16) = 3
    # bar: OOV both sides, same totals → 0
    assert out["n_words"] == 2
    assert out["log2_ratio_sum"] == 3.0
    assert out["log2_ratio_per_word"] == 1.5


def test_weights_totals_differ_and_empty_doc(spark):
    docs = _docs(spark, [("d1", "foo"), ("d2", None), ("d3", "  ")])
    tgt = _model(spark, {"foo": 4})
    raw = _model(spark, {"foo": 4})
    got = {r["doc_id"]: r for r in importance.log2_ratio_weights(
        docs, tgt, raw, target_total=8, raw_total=32).collect()}
    # foo: (log2 4 − log2 8) − (log2 4 − log2 32) = −1 + 3 = 2
    assert got["d1"]["log2_ratio_sum"] == 2.0
    for d in ("d2", "d3"):
        assert got[d]["n_words"] == 0
        assert got[d]["log2_ratio_sum"] == 0.0
        assert got[d]["log2_ratio_per_word"] == 0.0


def test_weights_partitioning_independent(spark):
    docs = _docs(spark, [(f"d{i}", f"alpha beta w{i % 7}")
                         for i in range(40)])
    tgt = _model(spark, {"alpha": 10, "w3": 5})
    raw = _model(spark, {"alpha": 10, "beta": 20})
    a = importance.log2_ratio_weights(docs, tgt, raw)
    b = importance.log2_ratio_weights(docs.repartition(13), tgt, raw)
    assert sorted(map(tuple, a.collect())) == \
        sorted(map(tuple, b.collect()))


# ------------------------------------------------------------- dsir_sample

def test_sample_prefers_target_like_docs(spark):
    """20 target-like docs (weight ≫ 0) vs 20 raw-like (weight ≪ 0):
    with a weight gap of many nats the Gumbel noise (stddev ~1.3) cannot
    flip the ranking, so the k=20 sample must be exactly the target-like
    half — and a second call is identical (deterministic noise)."""
    rows = [(f"t{i}", "target " * 30) for i in range(20)] + \
           [(f"r{i}", "raw " * 30) for i in range(20)]
    docs = _docs(spark, rows)
    tgt = _model(spark, {"target": 64, "raw": 1})
    raw = _model(spark, {"target": 1, "raw": 64})
    out = importance.dsir_sample(docs, tgt, raw, k=20,
                                 target_total=65, raw_total=65)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == sorted(f"t{i}" for i in range(20))
    again = sorted(r["doc_id"] for r in importance.dsir_sample(
        docs, tgt, raw, k=20, target_total=65, raw_total=65).collect())
    assert again == ids


def test_gumbel_key_matches_formula(spark):
    """The sampling key is exactly ln(w)·log2_ratio + Gumbel(hash u):
    recompute one doc's key in Python from the same md5 arithmetic."""
    import hashlib
    docs = _docs(spark, [("d1", "foo foo")])
    tgt = _model(spark, {"foo": 8})
    raw = _model(spark, {"foo": 1})
    row = importance.dsir_sample(docs, tgt, raw, k=1,
                                 target_total=16, raw_total=16,
                                 salt="dsir").collect()[0]
    u = int(hashlib.md5(b"d1|dsir").hexdigest()[:8], 16) / 2**32 \
        + 1.0 / 2**33
    expect = round(row["log2_ratio_sum"] * math.log(2.0)
                   - math.log(-math.log(u)), 6)
    assert row["sample_key"] == expect


# -------------------------------------------------------------- plan shape

def test_weights_plan_broadcasts_models_single_wide_shuffle(spark):
    docs = _docs(spark, [(f"d{i}", "alpha beta") for i in range(10)])
    tgt = _model(spark, {"alpha": 10})
    raw = _model(spark, {"beta": 20})
    df = importance.log2_ratio_weights(docs, tgt, raw,
                                       target_total=10, raw_total=20)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    exchanges = [ln for ln in plan.splitlines()
                 if "Exchange hashpartitioning" in ln]
    assert len(exchanges) == 1          # the doc-keyed reduce only
    assert "doc_id" in exchanges[0]


def test_sample_plan_is_take_ordered(spark):
    docs = _docs(spark, [(f"d{i}", "alpha") for i in range(10)])
    tgt = _model(spark, {"alpha": 10})
    raw = _model(spark, {"alpha": 10})
    df = importance.dsir_sample(docs, tgt, raw, k=3,
                                target_total=10, raw_total=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan        # per-partition top-k, no full sort
