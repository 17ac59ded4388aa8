"""End-to-end CLI test for the batch curation pipeline
(``scripts/run_curation.py``): watermark clean → quality/lang →
repetition → line dedup → exact dedup → decontamination → split +
epoch-sharded write, composed from the gated operators and runnable via
spark-submit."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FOOTER = "copyright footer shared by every document in this corpus"


def _body1(i):
    # every >=20-char window contains the doc digit, so decontamination
    # k-grams can only match the one doc the eval text came from
    return (f"the fox{i} and the owl{i} of the wood{i} is to fly{i} "
            f"in the dark{i} for the prey{i}")


def _body2(i):
    return (f"a big cat{i} sat on the mat{i} and the dog{i} ran to "
            f"the van{i} in the sun{i} by the bay{i}")


def _doc(i):
    return "\n".join([_body1(i), _body2(i), FOOTER])


def test_cli_curation_end_to_end(spark, tmp_path):
    src = str(tmp_path / "docs")
    evl = str(tmp_path / "eval")
    out = str(tmp_path / "curated")
    rows = [(i, _doc(i)) for i in range(7)]
    # doc 0 carries a hidden watermark the clean stage must strip
    rows[0] = (0, rows[0][1].replace("fox0", "f​ox0"))
    rows.append((7, _doc(6)))               # exact duplicate of doc 6
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(src)
    # eval set: doc 5's first line verbatim (a real leaked benchmark item)
    spark.createDataFrame([(100, _body1(5))], "doc_id long, text string") \
        .write.parquet(evl)

    env = dict(os.environ, SPARK_GRAFT_SHUFFLE="2")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_curation.py"),
         "--input", src, "--output", out, "--eval", evl,
         "--master", "local[2]", "--train-frac", "0.8",
         "--epoch", "1", "--shards", "2"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-4000:]
    line = [ln for ln in res.stdout.splitlines()
            if ln.startswith("CURATION ")][0]
    counts = json.loads(line[len("CURATION "):])
    assert counts["input"] == 8
    assert counts["quality_lang"] == 8       # all docs pass the heuristics
    assert counts["repetition"] == 8
    assert counts["line_dedup"] == 8         # rebuild keeps every doc row
    assert counts["exact_dedup"] == 7        # the doc-6 clone dropped
    assert counts["decontaminate"] == 6      # leaked doc 5 dropped
    assert counts["written"] == 6

    got = spark.read.parquet(out)
    by_id = {r["doc_id"]: r for r in got.collect()}
    assert set(by_id) == {0, 1, 2, 3, 4, 6}
    for r in by_id.values():
        assert "​" not in r["text"]     # watermark stripped
        assert FOOTER not in r["text"]       # boilerplate line removed
        assert r["split"] in ("train", "test")
        assert r["shard"] in (0, 1)
    # epoch order is deterministic: shuffle_key is a pure id function
    assert by_id[3]["shuffle_key"] is not None
    # partitioned layout on disk
    assert any(d.startswith("shard=") for d in os.listdir(out))

    # second run: --mix-alpha + --near-dedup + unigram band-pass.  The
    # stage report must keep EVERY stage count (a local-variable
    # shadowing bug once replaced it with per-source counts), the
    # near-dup twin of doc 3 forms a group whose LONGER member wins the
    # election (exactly one of {3, twin} survives), the wide bits band
    # drops nothing, and the budget caps the written rows
    src2 = str(tmp_path / "docs2")
    # near-dup twin of doc 3: one extra SHORT line (appending to the
    # footer line would exempt it from cross-doc line dedup and push the
    # post-dedup Jaccard below the 0.85 verify threshold)
    rows2 = rows + [(8, _doc(3) + "\ntail9")]  # J ~0.94 after line dedup
    spark.createDataFrame(rows2, "doc_id long, text string") \
        .write.parquet(src2)
    out2 = str(tmp_path / "curated_mixed")
    res2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_curation.py"),
         "--input", src2, "--output", out2, "--eval", evl,
         "--master", "local[2]", "--mix-alpha", "0.5",
         "--mix-budget", "4", "--near-dedup",
         "--bits-min", "1", "--bits-max", "30", "--lm-order", "2"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert res2.returncode == 0, res2.stderr[-4000:]
    line2 = [ln for ln in res2.stdout.splitlines()
             if ln.startswith("CURATION ")][0]
    counts2 = json.loads(line2[len("CURATION "):])
    for key in ("input", "quality_lang", "repetition", "bigram_lm",
                "line_dedup", "exact_dedup", "near_dedup", "decontaminate",
                "temperature_mix", "written"):
        assert key in counts2, counts2
    assert counts2["input"] == 9
    assert counts2["bigram_lm"] == 9           # wide band drops nothing
    assert counts2["exact_dedup"] == 8         # doc-6 clone dropped
    assert counts2["near_dedup"] == 7          # one of {3, twin} dropped
    assert counts2["decontaminate"] == 6       # leaked doc 5 dropped
    assert counts2["written"] == counts2["temperature_mix"] <= 6

    # third run: --dsir-target/--dsir-k — the stage keeps exactly k docs
    # (the Gumbel-top-k draw; WHICH k is the weights' business, the CLI
    # contract is the count and a clean write)
    out3 = str(tmp_path / "curated_dsir")
    res3 = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_curation.py"),
         "--input", src, "--output", out3,
         "--dsir-target", evl, "--dsir-k", "3",
         "--master", "local[2]"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert res3.returncode == 0, res3.stderr[-4000:]
    line3 = [ln for ln in res3.stdout.splitlines()
             if ln.startswith("CURATION ")][0]
    counts3 = json.loads(line3[len("CURATION "):])
    assert counts3["exact_dedup"] == 7
    assert counts3["dsir_resample"] == 3
    assert counts3["written"] == 3
    assert spark.read.parquet(out3).count() == 3


def test_cli_curation_substring_dedup(spark, tmp_path):
    """Isolated --substr-k run: the later copy of a cross-document
    repeated substring is cut (the corpus-order first survives), rows
    are rewritten, never dropped."""
    blk = "this exact block of text is long enough to repeat verbatim"
    # flanks fully distinct between docs 1 and 3: the maximal duplicated
    # span is exactly " {blk} " (shared flank words would widen it)
    rows = [
        (1, f"primero unico1{blk}2fin uno"),
        (2, "unrelated second document with its own words only"),
        (3, f"segundo distinto3{blk}4cola dos"),
    ]
    src = str(tmp_path / "docs")
    out = str(tmp_path / "curated")
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(src)
    env = dict(os.environ, SPARK_GRAFT_SHUFFLE="2")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_curation.py"),
         "--input", src, "--output", out, "--master", "local[2]",
         "--quality-min", "0", "--no-repetition-filter",
         "--no-line-dedup", "--no-exact-dedup", "--substr-k", "25"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-4000:]
    line = [ln for ln in res.stdout.splitlines()
            if ln.startswith("CURATION ")][0]
    counts = json.loads(line[len("CURATION "):])
    assert counts["substr_dedup"] == 3      # rewrites, never drops
    assert counts["written"] == 3
    by_id = {r["doc_id"]: r["text"]
             for r in spark.read.parquet(out).collect()}
    assert blk in by_id[1]                   # first occurrence kept
    assert by_id[2] == rows[1][1]            # untouched
    assert blk not in by_id[3]               # later copy cut
    assert "segundo distinto3" in by_id[3]   # unique flanks survive
    assert "4cola dos" in by_id[3]

    # winnowed run (--substr-winnow 8): the repeat is 59 >= 8+25-1 chars,
    # so detection is guaranteed; extents underestimate, so doc 3 must
    # shrink (part of blk cut) while first occurrence and bystander
    # survive verbatim
    out2 = str(tmp_path / "curated_winnow")
    res2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_curation.py"),
         "--input", src, "--output", out2, "--master", "local[2]",
         "--quality-min", "0", "--no-repetition-filter",
         "--no-line-dedup", "--no-exact-dedup", "--substr-k", "25",
         "--substr-winnow", "8"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert res2.returncode == 0, res2.stderr[-4000:]
    by_id2 = {r["doc_id"]: r["text"]
              for r in spark.read.parquet(out2).collect()}
    assert by_id2[1] == rows[0][1]           # first occurrence verbatim
    assert by_id2[2] == rows[1][1]           # untouched
    assert len(by_id2[3]) < len(rows[2][1])  # repeat detected and cut
    assert "segundo distinto3" in by_id2[3]  # unique flanks survive


def test_cli_curation_history_and_blocks(spark, tmp_path):
    """--history drops docs whose cleaned text is already in the previous
    snapshot (Bloom membership: the overlap doc must go — no false
    negatives); --blocks writes cross-boundary token blocks instead of
    documents (full blocks except the corpus tail; --epoch rejected)."""
    src = str(tmp_path / "docs")
    histdir = str(tmp_path / "history")
    out = str(tmp_path / "curated_hist")
    rows = [(i, _doc(i)) for i in range(6)]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(src)
    # history = doc 2's CURATED text: after the clean + line-dedup stages
    # doc 2 loses the shared footer, so the history fixture must hold the
    # post-curation form (build it by running the pipeline once on doc 2
    # alone would drag in min_docs effects; instead disable line dedup so
    # the curated text == raw text and history can be the raw doc)
    spark.createDataFrame([(100, _doc(2))], "doc_id long, text string") \
        .write.parquet(histdir)

    env = dict(os.environ, SPARK_GRAFT_SHUFFLE="2")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_curation.py"),
         "--input", src, "--output", out, "--history", histdir,
         "--no-line-dedup", "--master", "local[2]"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-4000:]
    line = [ln for ln in res.stdout.splitlines()
            if ln.startswith("CURATION ")][0]
    counts = json.loads(line[len("CURATION "):])
    assert counts["input"] == 6
    assert counts["history_dedup"] == 5       # doc 2 is in the snapshot
    assert counts["written"] == 5
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {0, 1, 3, 4, 5}

    # blocks mode: every block full except the tail; token stream length
    # equals the sum of curated doc lengths
    outb = str(tmp_path / "blocks")
    resb = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_curation.py"),
         "--input", src, "--output", outb, "--no-line-dedup",
         "--blocks", "64", "--master", "local[2]"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert resb.returncode == 0, resb.stderr[-4000:]
    blocks = spark.read.parquet(outb).orderBy("block_id").collect()
    sizes = [r["n_tokens"] for r in blocks]
    assert all(s == 64 for s in sizes[:-1]) and 0 < sizes[-1] <= 64
    total = sum(sizes)
    lineb = [ln for ln in resb.stdout.splitlines()
             if ln.startswith("CURATION ")][0]
    countsb = json.loads(lineb[len("CURATION "):])
    assert countsb["written"] == len(blocks)

    # --blocks with --epoch is a configuration error, not a silent drop
    rese = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_curation.py"),
         "--input", src, "--output", str(tmp_path / "never"),
         "--blocks", "64", "--epoch", "1", "--master", "local[2]"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert rese.returncode != 0
    assert "incompatible" in (rese.stderr + rese.stdout)
    assert total > 0
