"""Bloom-filter membership: build/probe semantics, path equality, plans."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hidden_characters_detector_spark.operators import bloom

M, K = 1 << 13, 5


def _keys_df(spark, n=400, prefix="key"):
    return spark.range(n).selectExpr(f"concat('{prefix}', id) AS text",
                                     "id AS doc_id")


def test_no_false_negatives(spark):
    """Every key the filter was built over probes positive — the Bloom
    contract, on both probe paths."""
    df = _keys_df(spark)
    bits = bloom.bloom_build(df, "text", m=M, k=K)
    for probe in (bloom.bloom_might_contain, bloom.bloom_might_contain_py):
        out = probe(df, bits, "text", m=M, k=K)
        assert out.where(~F.col("might_contain")).count() == 0


def test_jvm_and_python_paths_agree(spark):
    """The plan-literal codegen probe and the broadcast Arrow probe are
    the same function."""
    hist = _keys_df(spark, 300)
    other = _keys_df(spark, 500, prefix="other")
    bits = bloom.bloom_build(hist, "text", m=M, k=K)
    a = {r.doc_id: r.might_contain for r in bloom.bloom_might_contain(
        other, bits, "text", m=M, k=K).collect()}
    b = {r.doc_id: r.might_contain for r in bloom.bloom_might_contain_py(
        other, bits, "text", m=M, k=K).collect()}
    assert a == b


def test_matches_relational_ground_truth(spark):
    """Bitset membership == 'all k positions appear in the history's
    distinct position set' (the relational formulation the SQL oracle
    uses)."""
    hist = _keys_df(spark, 250)
    probe = _keys_df(spark, 400, prefix="p")  # disjoint keys: FPs only
    bits = bloom.bloom_build(hist, "text", m=M, k=K)
    got = {r.doc_id: r.might_contain for r in bloom.bloom_might_contain(
        probe, bits, "text", m=M, k=K).collect()}

    hist_pos = set(p for r in hist.select(
        bloom.bloom_positions("text", m=M, k=K).alias("ps")).collect()
        for p in r.ps)
    want = {r.doc_id: all(p in hist_pos for p in r.ps)
            for r in probe.select("doc_id", bloom.bloom_positions(
                "text", m=M, k=K).alias("ps")).collect()}
    assert got == want


def test_false_positive_rate_bounded(spark):
    """FP rate on disjoint keys stays within 5x the textbook estimate
    (1 - e^{-kn/m})^k — deterministic given the salt, so this is a real
    regression gate, not a flaky statistical one."""
    n = 800
    hist = _keys_df(spark, n)
    probe = _keys_df(spark, 2000, prefix="absent")
    bits = bloom.bloom_build(hist, "text", m=M, k=K)
    fp = bloom.bloom_might_contain(probe, bits, "text", m=M, k=K) \
        .where("might_contain").count()
    expected = (1 - np.exp(-K * n / M)) ** K
    assert fp / 2000 <= max(5 * expected, 0.01)


def test_build_partitioning_independent(spark):
    """The bitset bytes are identical under any input partitioning —
    the OR-of-partials build is order- and layout-insensitive."""
    df = _keys_df(spark, 300)
    a = bloom.bloom_build(df.repartition(7), "text", m=M, k=K)
    b = bloom.bloom_build(df.repartition(2), "text", m=M, k=K)
    assert a == b


def test_null_key_hashes_as_empty_string(spark):
    """NULL keys follow the engine's NULL-as-empty convention: a NULL
    probe equals probing ''."""
    hist = spark.createDataFrame([("",)], "text string")
    bits = bloom.bloom_build(hist, "text", m=M, k=K)
    probe = spark.createDataFrame([(None,), ("x",)], "text string")
    rows = {r.text: r.might_contain for r in bloom.bloom_might_contain(
        probe, bits, "text", m=M, k=K).collect()}
    assert rows[None] is True  # '' is in the filter


def test_non_multiple_of_8_m(spark):
    """m that isn't byte-aligned still round-trips (packbits pads)."""
    df = _keys_df(spark, 50)
    bits = bloom.bloom_build(df, "text", m=1001, k=3)
    assert len(bits) == (1001 + 7) // 8
    out = bloom.bloom_might_contain(df, bits, "text", m=1001, k=3)
    assert out.where(~F.col("might_contain")).count() == 0


def test_validation(spark):
    df = _keys_df(spark, 10)
    with pytest.raises(ValueError):
        bloom.bloom_positions("text", m=0, k=3)
    with pytest.raises(ValueError):
        bloom.bloom_positions("text", m=64, k=0)
    with pytest.raises(ValueError):
        bloom.bloom_might_contain(df, b"\x00" * 3, "text", m=64, k=3)


def test_probe_plan_is_pure_projection(spark):
    """Scale shape: the JVM probe adds NO exchange and NO Python eval —
    it must survive as a map-side projection at any corpus size."""
    df = _keys_df(spark, 100)
    bits = bloom.bloom_build(df, "text", m=M, k=K)
    plan = bloom.bloom_might_contain(df, bits, "text", m=M, k=K) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow"):
        assert marker not in plan


def test_build_plan_has_no_shuffle(spark):
    """The build's position explode + partial-bitset pass is narrow:
    one scan, no exchange before the per-partition bitsets."""
    df = _keys_df(spark, 100)
    pos_df = df.select(F.explode(
        bloom.bloom_positions("text", m=M, k=K)).alias("pos"))
    plan = pos_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_build_layered_or_identical_and_partition_safe(spark):
    """Driver-ingress bound (r6): when the scan has more partitions than
    ``max_partials``, the partials are OR-merged in a second map stage
    before the collect; the bits are identical to the flat merge (OR is
    associative/commutative) at ANY partition count."""
    df = _keys_df(spark, 300)
    flat = bloom.bloom_build(df.repartition(3), "text", m=M, k=K)
    layered = bloom.bloom_build(df.repartition(40), "text", m=M, k=K,
                                max_partials=4)
    assert layered == flat
    # and the default threshold leaves small builds on the flat path
    assert bloom.bloom_build(df.repartition(2), "text", m=M, k=K) == flat
