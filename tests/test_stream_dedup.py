"""Ingestion dedup: dropDuplicatesWithinWatermark over the token stream."""

from __future__ import annotations

import datetime as dt
import os
import time

from hidden_characters_detector_spark.streaming import pipeline

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
ZWSP, A = 0x200B, ord("a")


def _mins(m):
    return T0 + dt.timedelta(minutes=m)


def _row(doc, toks, source, ts):
    return (doc, [int(t) for t in toks], len(toks), source, ts)


def _write(spark, rows, path, mtime):
    from conftest import write_stream_file

    write_stream_file(spark, rows, path, mtime)


def test_dedup_stream_drops_redeliveries(spark, tmp_path):
    """At-least-once upstreams re-deliver: the same doc_id arriving again
    (same batch or a later one within the watermark window) is dropped;
    distinct docs pass; state is watermark-evicted, not kept forever."""
    src = str(tmp_path / "in")
    os.makedirs(src)
    now = time.time()
    # batch 1: a0 twice IN the same file (duplicate within a batch) + b0
    _write(spark, [_row("a0", [A, ZWSP], "web", _mins(0)),
                   _row("a0", [A, ZWSP], "web", _mins(0)),
                   _row("b0", [A], "web", _mins(1))],
           os.path.join(src, "f1"), now - 300)
    # batch 2: a0 re-delivered across batches + genuinely new c0
    _write(spark, [_row("a0", [A, ZWSP], "web", _mins(0)),
                   _row("c0", [ZWSP], "web", _mins(2))],
           os.path.join(src, "f2"), now - 200)

    tok = pipeline.read_token_stream(spark, src, max_files_per_trigger=1)
    deduped = pipeline.dedup_stream(tok)
    q = (deduped.writeStream.format("memory").queryName("ded")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("select doc_id from ded").collect()
    ids = sorted(r["doc_id"] for r in rows)
    assert ids == ["a0", "b0", "c0"]


def test_dedup_stream_state_evicts_after_watermark(spark, tmp_path):
    """A re-delivery AFTER the watermark has passed the first sighting's
    window is treated as new (state was evicted) — the documented bound:
    dedup protection lasts exactly the re-delivery window, state does not
    grow with the stream."""
    src = str(tmp_path / "in")
    os.makedirs(src)
    now = time.time()
    _write(spark, [_row("a0", [A], "web", _mins(0))],
           os.path.join(src, "f1"), now - 300)
    # advance the watermark far past min 0 + 10min delay (watermark from
    # batch N-1 applies at batch N, so use two advancing files)
    _write(spark, [_row("adv1", [A], "web", _mins(60))],
           os.path.join(src, "f2"), now - 250)
    _write(spark, [_row("adv2", [A], "web", _mins(61))],
           os.path.join(src, "f3"), now - 200)
    # a0 re-delivered long after eviction -> passes as new
    _write(spark, [_row("a0", [A], "web", _mins(62))],
           os.path.join(src, "f4"), now - 100)

    tok = pipeline.read_token_stream(spark, src, max_files_per_trigger=1)
    deduped = pipeline.dedup_stream(tok, watermark="10 minutes")
    q = (deduped.writeStream.format("memory").queryName("ded2")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    ids = sorted(r["doc_id"] for r in
                 spark.sql("select doc_id from ded2").collect())
    assert ids == ["a0", "a0", "adv1", "adv2"]
