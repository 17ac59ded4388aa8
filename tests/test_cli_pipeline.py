"""End-to-end CLI test: the spark-submit entry point with the CEP surface
switched on (``--anomalies --density events``) over a staged token stream.

This is the production-reachability test the stateful operators were
missing: ``marker_rate_anomalies`` (applyInPandasWithState EWMA, semantic
spec in ``test_streaming.test_marker_rate_anomalies``) and the salted
stateful windowed density must be runnable from ``scripts/run_pipeline.py``
itself, not only from pytest harnesses.
"""

from __future__ import annotations

import datetime as dt
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
ZWSP, A = 0x200B, ord("a")


def _write_file(spark, rows, path, mtime):
    from conftest import write_stream_file

    write_stream_file(spark, rows, path, mtime)


def _run_cli(src, out, ck, *extra):
    env = dict(os.environ, SPARK_GRAFT_SHUFFLE="2")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_pipeline.py"),
         "--input", src, "--output", out, "--checkpoint", ck,
         "--master", "local[2]", "--max-files-per-trigger", "1", *extra],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)


def test_cli_checkpoint_resume_exactly_once(spark, tmp_path):
    """Production resume contract at the CLI level: a second invocation
    over the same checkpoint processes ONLY newly-arrived files, and the
    sink holds every sequence exactly once across both runs (with the
    anomaly CEP state also resuming — batch counts continue, not reset)."""
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    now = time.time()

    def mins(m):
        return T0 + dt.timedelta(minutes=m)

    _write_file(spark, [(f"a{j}", [A, ZWSP], 2, "web", mins(0))
                        for j in range(3)],
                os.path.join(src, "f0"), now - 300)
    p1 = _run_cli(src, out, ck, "--anomalies", "--anomaly-min-batches", "1")
    assert p1.returncode == 0, p1.stderr[-4000:]

    # new file arrives; resume from the same checkpoint
    _write_file(spark, [("b0", [A, ZWSP, ZWSP], 3, "web", mins(20))],
                os.path.join(src, "f1"), now - 100)
    p2 = _run_cli(src, out, ck, "--anomalies", "--anomaly-min-batches", "1")
    assert p2.returncode == 0, p2.stderr[-4000:]

    from hidden_characters_detector_spark.sinks.exactly_once import read_sink

    sink = read_sink(spark, os.path.join(out, "cleaned"))
    ids = sorted(r["doc_id"] for r in sink.collect())
    assert ids == ["a0", "a1", "a2", "b0"]          # exactly once, no dupes
    anom = {r["n_batches_seen"]: r for r in
            read_sink(spark, os.path.join(out, "anomalies")).collect()}
    # CEP state resumed: run 2's batch is the SECOND batch this source has
    # seen (EWMA carried across the restart), not a fresh batch 1
    assert set(anom) == {1, 2}
    assert anom[2]["rate"] == 2.0                   # 2 markers / 1 seq


def test_cli_anomalies_and_event_density(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    now = time.time()

    def mins(m):
        return T0 + dt.timedelta(minutes=m)

    # batch 1 (4 seqs, rate 1.0) -> batch 2 burst (rate 4.0 > 1.8x EWMA ->
    # anomaly) -> batch 3 normal.  Event times stride 20 min so the drain
    # advances the 10-min watermark and the event-density append sink
    # closes at least window [0,1) (watermark from batch N-1 applies at N).
    _write_file(spark, [(f"n{j}", [A, ZWSP], 2, "web", mins(0))
                        for j in range(4)],
                os.path.join(src, "f0"), now - 300)
    _write_file(spark, [("burst", [ZWSP] * 4, 4, "web", mins(20))],
                os.path.join(src, "f1"), now - 200)
    _write_file(spark, [("tail", [A, ZWSP], 2, "web", mins(40))],
                os.path.join(src, "f2"), now - 100)

    env = dict(os.environ, SPARK_GRAFT_SHUFFLE="2")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_pipeline.py"),
         "--input", src, "--output", out, "--checkpoint", ck,
         "--master", "local[2]", "--max-files-per-trigger", "1",
         "--anomalies", "--anomaly-threshold", "1.8",
         "--anomaly-alpha", "0.5", "--anomaly-min-batches", "1",
         "--density", "events"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]
    # (the listener-derived rows= count can miss the final progress event
    # at shutdown — the durable sink below is the authoritative check)
    assert "PIPELINE DONE" in proc.stdout
    assert "ANOMALY CEP rows=3 flagged=1" in proc.stdout

    from hidden_characters_detector_spark.sinks.exactly_once import read_sink

    assert read_sink(spark, os.path.join(out, "cleaned")).count() == 6

    anom = {(r["source"], r["n_batches_seen"]): r for r in
            read_sink(spark, os.path.join(out, "anomalies")).collect()}
    assert len(anom) == 3                      # one row per (source, batch)
    assert anom[("web", 2)]["is_anomaly"]      # the burst batch flagged
    assert not anom[("web", 1)]["is_anomaly"]
    assert not anom[("web", 3)]["is_anomaly"]
    assert anom[("web", 2)]["rate"] == 4.0

    # stateful event-density appended at least the closed [0,1) window
    dens = spark.read.parquet(os.path.join(out, "density_events"))
    rows = {r["window_start"]: r["n_detections"] for r in dens.collect()}
    assert rows.get(T0) == 4                   # 4 ZWSP detections @ min 0

    # and the default counter-derived density (main sink) is complete
    from hidden_characters_detector_spark.streaming import pipeline

    total = pipeline.read_density(spark, out).agg(
        {"n_detections": "sum"}).collect()[0][0]
    assert total == 9                          # 4 + 4 + 1 markers


def test_cli_dict_stream_join(spark, tmp_path):
    """--dict-stream runs the stateful stream-stream interval join from the
    CLI itself (semantic spec: test_streaming.test_confusable_dict_join):
    detection events join only dictionary versions whose validity window
    covers the event time, and the joined rows land in <output>/dict_join."""
    from hidden_characters_detector_spark.sources import confusable_dict

    src = str(tmp_path / "in")
    dc = str(tmp_path / "dict")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    now = time.time()
    QUOTE = 0x2018  # cp % 3 == 2 -> valid_from T0+10min

    # staggered dict updates: batch b becomes valid at T0 + b*5min
    confusable_dict.write_dict_batches(spark, dc, T0, n_batches=3)
    _write_file(spark, [
        ("dj", [QUOTE, ZWSP, A], 3, "web", T0 + dt.timedelta(minutes=12)),
        ("dearly", [QUOTE], 1, "web", T0 - dt.timedelta(minutes=90)),
    ], os.path.join(src, "f1"), now - 300)
    # a later file so the drain advances past the first batch
    _write_file(spark, [("dpush", [A], 1, "web",
                         T0 + dt.timedelta(minutes=50))],
                os.path.join(src, "f2"), now - 200)

    p = _run_cli(src, out, ck, "--dict-stream", dc,
                 "--dict-validity", "1 hour")
    assert p.returncode == 0, p.stderr[-4000:]
    assert "DICT JOIN rows=" in p.stdout

    joined = spark.read.parquet(os.path.join(out, "dict_join"))
    rows = joined.collect()
    matched = {(r["doc_id"], r["token"]) for r in rows}
    # event at T0+12min is inside both rules' validity windows
    assert ("dj", QUOTE) in matched
    assert ("dj", ZWSP) in matched
    # event 90 min BEFORE any valid_from never matches
    assert not any(r["doc_id"] == "dearly" for r in rows)
    # the dictionary payload rides along
    qrow = [r for r in rows
            if r["doc_id"] == "dj" and r["token"] == QUOTE][0]
    assert qrow["replacement"] == [ord("'")]


def test_cli_decontam_gate(spark, tmp_path):
    """--decontam-eval drops token-k-gram-leaked rows at ingestion from
    the CLI itself (the broadcast gate built from an eval parquet)."""
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    evl = str(tmp_path / "eval")
    os.makedirs(src)
    now = time.time()

    def mins(m):
        return T0 + dt.timedelta(minutes=m)

    clean_toks = [ord(c) for c in "abcdefghijklmnopqrstuvwxyz012345"]
    leak_toks = [ord(c) for c in "THE LEAKED BENCHMARK QUESTION TEXT 99"]
    _write_file(spark, [("g0", clean_toks, len(clean_toks), "web", mins(0)),
                        ("leak", leak_toks, len(leak_toks), "web", mins(1))],
                os.path.join(src, "f0"), now - 300)
    spark.createDataFrame([("e0", leak_toks[3:27])],
                          "doc_id string, tokens array<int>") \
        .write.parquet(evl)

    p = _run_cli(src, out, ck, "--decontam-eval", evl)
    assert p.returncode == 0, p.stderr[-4000:]

    from hidden_characters_detector_spark.sinks.exactly_once import read_sink

    sink = read_sink(spark, os.path.join(out, "cleaned"))
    assert sorted(r["doc_id"] for r in sink.collect()) == ["g0"]


def test_cli_no_quarantine_passes_bad_rows_through(spark, tmp_path):
    """--no-quarantine disables the gate: semantically null rows flow
    through the kernel (null tokens treated as empty) into the clean sink
    and no quarantine directory is created."""
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    now = time.time()
    _write_file(spark, [("g0", [A, ZWSP], 2, "web",
                         T0 + dt.timedelta(minutes=1)),
                        ("b_tok", None, 0, "web",
                         T0 + dt.timedelta(minutes=1))],
                os.path.join(src, "f0"), now - 300)
    p = _run_cli(src, out, ck, "--no-quarantine")
    assert p.returncode == 0, p.stderr[-4000:]
    assert "QUARANTINE" not in p.stdout
    assert not os.path.isdir(os.path.join(out, "quarantine"))

    from hidden_characters_detector_spark.sinks.exactly_once import read_sink

    sink = {r["doc_id"]: r for r in
            read_sink(spark, os.path.join(out, "cleaned")).collect()}
    assert set(sink) == {"g0", "b_tok"}
    assert sink["b_tok"]["tokens_clean"] == []   # null -> empty, cleaned
