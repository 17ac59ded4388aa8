"""Spark operator tests: clean_detect / detect_events / token_table."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hidden_characters_detector_spark.functions.kernel import (
    DetectorConfig, FULL_CLEAN)
from hidden_characters_detector_spark.operators.clean import (
    clean_detect, detect_events)
from hidden_characters_detector_spark.sources import synth

SF_DIR = "/root/testdata/sf0.001"

TEXTS = [
    "Hello​world",
    "﻿bom lead\nsecond",
    "A B and “quotes”",
    "plain",
    "",
    "a‥b Аpple",
    "multi\nline‍\ntext\n",
]


@pytest.fixture(scope="module")
def tok_df(spark):
    rows = [(f"d{i}", [ord(c) for c in t], len(t), "web")
            for i, t in enumerate(TEXTS)]
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string")


def test_clean_detect_matches_oracle(spark, oracle, tok_df):
    out = {r["doc_id"]: r for r in clean_detect(tok_df, FULL_CLEAN).collect()}
    for i, t in enumerate(TEXTS):
        exp = oracle.run(t)
        r = out[f"d{i}"]
        assert r["tokens_clean"] == exp["tokens_clean"], t
        assert r["n_tok_clean"] == len(exp["tokens_clean"])
        assert r["n_detected"] == exp["n_detected"], t
        assert r["n_processed"] == exp["n_processed"], t
        assert r["had_marker"] == exp["had_marker"], t
        assert r["source"] == "web"  # passthrough preserved


def test_detect_events_rows(spark, tok_df):
    ev = detect_events(tok_df, FULL_CLEAN)
    rows = ev.collect()
    # d0: one ZWSP removal
    d0 = [r for r in rows if r["doc_id"] == "d0"]
    assert len(d0) == 1
    assert d0[0]["token"] == 0x200B
    assert d0[0]["marker_type"] == "Hidden"
    assert d0[0]["action"] == "Removed"
    assert d0[0]["replacement"] == []
    assert d0[0]["line_no"] == 1 and d0[0]["idx"] == 5
    # d1: leading BOM processed
    d1 = [r for r in rows if r["doc_id"] == "d1"]
    assert d1[0]["action"] == "Processed (BOM)"
    # d5: expansion replacement 0x2025 -> [.. ] and homoglyph A
    d5 = {r["token"]: r for r in rows if r["doc_id"] == "d5"}
    assert d5[0x2025]["action"] == "Replaced"
    assert d5[0x2025]["replacement"] == [0x2E, 0x2E]
    assert d5[0x0410]["replacement"] == [ord("A")]
    # multiline line numbering: d6 ZWJ on line 2
    d6 = [r for r in rows if r["doc_id"] == "d6"]
    assert d6[0]["line_no"] == 2 and d6[0]["idx"] == 4


def test_detect_events_detect_only_mode(spark, tok_df):
    ev = detect_events(tok_df, DetectorConfig(clean=False)).collect()
    # leading BOM suppressed in detect-only mode (ref :677)
    assert not [r for r in ev if r["doc_id"] == "d1" and r["idx"] == 0
                and r["line_no"] == 1]
    assert all(r["action"] == "Detected" for r in ev)
    # detect-only replacement is null, not empty (ref :532 default None)
    assert all(r["replacement"] is None for r in ev)


def test_token_table_deterministic_and_shaped(spark):
    df1 = synth.token_table(spark, SF_DIR).orderBy("doc_id")
    df2 = synth.token_table(spark, SF_DIR).repartition(7)
    assert df1.schema.simpleString() == (
        "struct<doc_id:string,tokens:array<int>,n_tok:int,"
        "source:string,event_time:timestamp>")
    a = {r["doc_id"]: r["tokens"] for r in df1.collect()}
    b = {r["doc_id"]: r["tokens"] for r in df2.collect()}
    assert a == b  # partitioning-independent determinism
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(a) == docs
    srcs = dict(synth.token_table(spark, SF_DIR)
                .groupBy("source").count().collect()
                and [(r["source"], r["count"]) for r in
                     synth.token_table(spark, SF_DIR)
                     .groupBy("source").count().collect()])
    assert set(srcs) <= set(synth.SOURCES)
    assert max(srcs.values()) > 2 * min(srcs.values())  # genuinely skewed


def test_token_table_roundtrip_cleaning_restores_text(spark, oracle):
    """Injected markers cleaned == oracle cleaning of the injected text."""
    tok = synth.token_table(spark, SF_DIR).limit(40)
    cleaned = {r["doc_id"]: r for r in clean_detect(tok, FULL_CLEAN).collect()}
    raw = {r["doc_id"]: r["tokens"] for r in tok.collect()}
    checked = had = 0
    for doc_id, toks in raw.items():
        text = "".join(map(chr, toks))
        exp = oracle.run(text)
        got = cleaned[doc_id]
        assert got["tokens_clean"] == exp["tokens_clean"], doc_id
        assert got["n_detected"] == exp["n_detected"], doc_id
        checked += 1
        had += bool(got["had_marker"])
    assert checked == 40 and had > 10  # injection actually injected
