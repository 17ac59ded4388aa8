"""Cross-document line dedup semantics and plan shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from hidden_characters_detector_spark.operators import line_dedup

BOILER = "(c) 2024 Example Corp - all rights reserved"


def _corpus(spark, n_docs=12):
    """n docs; every doc carries the same footer; docs 0-5 share a header;
    each doc has one unique body line; empty separator lines everywhere."""
    rows = []
    for i in range(n_docs):
        parts = []
        if i < 6:
            parts.append("Shared Header Line")
        parts += [f"unique body of document {i}", "", f"  tail {i}  ",
                  BOILER]
        rows.append((f"d{i}", "\n".join(parts)))
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_dedup_lines_drops_cross_doc_boilerplate(spark):
    docs = _corpus(spark)
    out = {r["doc_id"]: r for r in
           line_dedup.dedup_lines(docs, min_docs=5).collect()}
    assert len(out) == 12
    # the footer (12 docs) and the header (6 docs) are boilerplate; the
    # unique body and tail lines survive; empty lines are exempt
    for i in range(12):
        r = out[f"d{i}"]
        got = r["text_dedup"].split("\n")
        assert got == [f"unique body of document {i}", "", f"  tail {i}  "]
        expected_total = 5 if i < 6 else 4
        assert r["n_lines"] == expected_total
        assert r["n_lines_dropped"] == (2 if i < 6 else 1)
        assert r["n_lines_kept"] == 3


def test_dedup_lines_matching_is_normalized_rebuild_is_verbatim(spark):
    """Lines differing only by surrounding whitespace count as ONE line
    for frequency; surviving lines keep their original whitespace."""
    rows = [(f"d{i}", f"  padded boiler  \nkeep {i}") for i in range(4)]
    rows.append(("d4", "padded boiler\nkeep 4"))   # trimmed variant
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r["text_dedup"] for r in
           line_dedup.dedup_lines(docs, min_docs=5).collect()}
    assert out == {f"d{i}": f"keep {i}" for i in range(5)}


def test_dedup_lines_exempts_short_lines_and_keeps_empty_docs(spark):
    """min_chars exempts short lines from counting/dropping; a doc whose
    every line is boilerplate survives with empty text."""
    rows = [(f"d{i}", f"--\n{BOILER}") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r for r in
           line_dedup.dedup_lines(docs, min_docs=3, min_chars=5).collect()}
    assert len(out) == 6
    for r in out.values():
        assert r["text_dedup"] == "--"      # short line exempt
        assert r["n_lines_dropped"] == 1    # the boilerplate
        assert r["n_lines_kept"] == 1


def test_dedup_lines_paragraph_mode(spark):
    """sep_pattern=r'\\n{2,}' dedups blank-line-separated PARAGRAPHS:
    a multi-line paragraph repeated across docs drops as one unit, and
    3+-newline runs normalize to one blank separator on rebuild."""
    para = "promo paragraph line one\npromo line two"
    rows = [(f"d{i}", f"unique intro {i}\n\n{para}\n\n\nunique tail {i}")
            for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r for r in
           line_dedup.dedup_lines(docs, min_docs=5,
                                  sep_pattern=r"\n{2,}",
                                  join_sep="\n\n").collect()}
    for i in range(6):
        r = out[f"d{i}"]
        assert r["text_dedup"] == f"unique intro {i}\n\nunique tail {i}"
        assert r["n_lines"] == 3 and r["n_lines_dropped"] == 1
    # line mode over the same corpus would NOT drop (each physical line
    # of the paragraph alone is still boilerplate here, but the intro /
    # tail survive either way) — just assert paragraph atomicity: the
    # two promo lines vanished together
    assert all("promo" not in out[f"d{i}"]["text_dedup"] for i in range(6))


def test_dedup_lines_within_keeps_first_occurrence(spark):
    """Within-doc dedup: first occurrence (with its original whitespace)
    survives, later normalized repeats drop, blank separators are exempt
    even when repeated, NULL text behaves as empty."""
    rows = [
        ("d0", "menu\nbody one\n\nmenu\nbody two\n\n  menu  "),
        ("d1", "only\nlines\nhere"),
        ("d2", None),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r for r in
           line_dedup.dedup_lines_within(docs).collect()}
    assert out["d0"]["text_dedup"] == "menu\nbody one\n\nbody two\n"
    assert out["d0"]["n_lines"] == 7
    assert out["d0"]["n_lines_dropped"] == 2      # 'menu' and '  menu  '
    assert out["d1"]["text_dedup"] == "only\nlines\nhere"
    assert out["d1"]["n_lines_dropped"] == 0
    assert out["d2"]["text_dedup"] == ""
    # zero-shuffle plan: pure projection
    plan = (line_dedup.dedup_lines_within(docs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_dedup_lines_null_text_keeps_membership(spark):
    """A NULL-text row (common in raw web dumps) must survive as the
    empty document, not vanish from the rebuilt corpus (split(NULL)
    would otherwise posexplode to zero rows)."""
    rows = [("d0", "keep me"), ("d1", None)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r for r in
           line_dedup.dedup_lines(docs, min_docs=5).collect()}
    assert set(out) == {"d0", "d1"}
    assert out["d1"]["text_dedup"] == ""
    assert out["d1"]["n_lines"] == 1
    assert out["d1"]["n_lines_dropped"] == 0


def test_frequent_lines_census(spark):
    docs = _corpus(spark)
    freq = line_dedup.frequent_lines(docs, min_docs=5, with_sample=True)
    got = {r["sample_line"]: r["n_docs"] for r in freq.collect()}
    assert got == {BOILER: 12, "Shared Header Line": 6}


def test_dedup_lines_partitioning_independent(spark):
    docs = _corpus(spark, n_docs=30)
    a = sorted(map(tuple, line_dedup.dedup_lines(docs).collect()))
    b = sorted(map(tuple,
                   line_dedup.dedup_lines(docs.repartition(7)).collect()))
    assert a == b


def test_dedup_lines_shuffle_join_path_matches_broadcast(spark):
    """broadcast_frequent=False (the huge-frequent-set escape hatch) must
    produce identical output through the shuffle-join plan."""
    docs = _corpus(spark)
    a = sorted(map(tuple, line_dedup.dedup_lines(docs).collect()))
    b = sorted(map(tuple, line_dedup.dedup_lines(
        docs, broadcast_frequent=False).collect()))
    assert a == b


def test_line_dedup_plan_shapes(spark):
    """Scale contract: (1) the frequency count gets map-side partial
    aggregation before its exchange; (2) no exchange in the counting
    branch carries the line text — only the 8-byte hash + id; (3) the
    frequent-set membership probe is a broadcast join, so the exploded
    side doesn't shuffle for it."""
    docs = _corpus(spark)
    freq_plan = (line_dedup.frequent_lines(docs, min_docs=5)
                 ._jdf.queryExecution().executedPlan().toString())
    assert "partial_count" in freq_plan
    for ln in freq_plan.splitlines():
        if "Exchange" in ln:
            assert "line#" not in ln and "text#" not in ln, ln
            assert "line_hash" in ln

    full_plan = (line_dedup.dedup_lines(docs, min_docs=5)
                 ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in full_plan
    # the rebuild partial-aggregates map-side too (partial_collect_list):
    # dropped lines are filtered BEFORE the doc_id exchange, which ships
    # only the per-doc aggregation buffers — no raw line column on ANY
    # shuffle anywhere in the operator
    assert "partial_collect_list" in full_plan
    for ln in full_plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "line#" not in ln and "text#" not in ln, ln
    rebuild = [ln for ln in full_plan.splitlines()
               if "Exchange hashpartitioning(doc_id" in ln]
    assert len(rebuild) == 1
