"""Sequence packing / chunking semantics and plan shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from hidden_characters_detector_spark.operators import packing


def test_pack_documents_running_total_rule(spark):
    """Docs accumulate into packs by exclusive-cumsum // budget within a
    bucket; a doc crossing the boundary stays in the pack where it
    started; an oversized doc owns the packs its span covers (the next doc
    starts a later pack)."""
    docs = spark.createDataFrame(
        [(0, 900), (16, 900), (32, 900),   # bucket 0: cum 900/1800/2700
         (48, 5000), (64, 10)],            # oversized doc then a tail doc
        "doc_id long, n_tok long")
    rows = {r["doc_id"]: r for r in
            packing.pack_documents(docs, budget=2048, buckets=16)
            .collect()}
    assert all(r["bucket"] == 0 for r in rows.values())
    assert rows[0]["pack_id"] == 0 and rows[0]["pack_offset"] == 0
    assert rows[16]["pack_id"] == 0 and rows[16]["pack_offset"] == 900
    # starts at 1800 < 2048 -> stays in pack 0 (overflow allowed)
    assert rows[32]["pack_id"] == 0 and rows[32]["pack_offset"] == 1800
    # starts at 2700 -> pack 1; spans to 7700
    assert rows[48]["pack_id"] == 1
    # next doc starts at 7700 -> pack 3 (the oversized doc owned 1..3)
    assert rows[64]["pack_id"] == 3


def test_pack_documents_partitioning_independent(spark):
    docs = spark.range(0, 500).selectExpr(
        "id AS doc_id", "(id % 37) * 100 + 50 AS n_tok")
    a = sorted(map(tuple, packing.pack_documents(docs).collect()))
    b = sorted(map(tuple,
                   packing.pack_documents(docs.repartition(7)).collect()))
    assert a == b


def test_chunk_tokens_windows_and_tail(spark):
    df = spark.createDataFrame(
        [("d1", list(range(10))),     # 10 toks, chunk 4, overlap 1 ->
                                      # starts 0,3,6 (stride 3; window 6
                                      # reaches the end, no redundant tail)
         ("d2", [1, 2]),              # shorter than chunk -> one chunk
         ("d3", [])],                 # empty -> no chunks
        "doc_id string, tokens array<int>")
    out = packing.chunk_tokens(df, chunk=4, overlap=1)
    rows = sorted((r["doc_id"], r["chunk_start"], list(r["chunk_tokens"]))
                  for r in out.collect())
    assert rows == [
        ("d1", 0, [0, 1, 2, 3]),
        ("d1", 3, [3, 4, 5, 6]),
        ("d1", 6, [6, 7, 8, 9]),
        ("d2", 0, [1, 2]),
    ]
    # every token is covered; consecutive windows overlap by `overlap`
    d1 = [r for r in rows if r[0] == "d1"]
    covered = sorted({t for _, _, ck in d1 for t in ck})
    assert covered == list(range(10))


def test_chunk_tokens_rejects_bad_overlap(spark):
    df = spark.createDataFrame([("d", [1])],
                               "doc_id string, tokens array<int>")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="overlap"):
        packing.chunk_tokens(df, chunk=4, overlap=4)


def test_packing_plan_shapes(spark):
    """pack: exactly one exchange (on the bucket key) feeding the window
    sort; chunk: a pure projection+generate — NO exchange anywhere."""
    docs = spark.range(0, 100).selectExpr("id AS doc_id",
                                          "100 AS n_tok")
    pplan = packing.pack_documents(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert pplan.count("Exchange hashpartitioning") == 1
    assert "bucket" in pplan

    tok = spark.range(0, 100).selectExpr(
        "cast(id as string) AS doc_id",
        "sequence(0, cast(id % 300 as int)) AS tokens")
    cplan = packing.chunk_tokens(tok)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in cplan
    assert "Generate" in cplan  # the posexplode


def test_pack_documents_auto_buckets_bounds_per_task_rows(spark):
    """Default bucket count self-sizes to the corpus: per-bucket doc count
    (= per-task sort size) stays ~target at n AND 10n rows — the r4 defect
    was a fixed default of 16 buckets, i.e. 16 ever-growing sort tasks."""
    from hidden_characters_detector_spark.operators.packing import (
        auto_buckets)

    assert auto_buckets(500) == 1
    assert auto_buckets(10**9) == 10**4          # 100k docs per task
    assert auto_buckets(10**12) == 1 << 20       # clamped

    target = 250
    for n in (1_000, 10_000):
        docs = spark.range(0, n).selectExpr("id AS doc_id", "10 AS n_tok")
        out = packing.pack_documents(docs, target_docs_per_bucket=target)
        per = out.groupBy("bucket").count().collect()
        assert len(per) == auto_buckets(n, target_docs_per_bucket=target)
        assert max(r["count"] for r in per) <= 2 * target


def test_padding_waste_hand_computed(spark):
    """Bucket assignment, padded slots, waste fraction, and overflow
    truncation vs hand arithmetic; plan is a pure projection + tiny agg."""
    docs = spark.createDataFrame([(10,), (64,), (65,), (300,), (600,)],
                                 "n_tok long")
    out = {r["bucket"]: r for r in packing.padding_waste(
        docs, buckets=(64, 128, 256, 512)).collect()}
    assert set(out) == {64, 128, 512}
    b64 = out[64]
    assert (b64["n_docs"], b64["n_tokens"], b64["n_padded_slots"],
            b64["n_tokens_truncated"]) == (2, 74, 128, 0)
    assert b64["waste_frac"] == round(1 - 74 / 128, 6)
    b512 = out[512]
    assert (b512["n_docs"], b512["n_tokens"], b512["n_padded_slots"],
            b512["n_tokens_truncated"]) == (2, 900, 1024, 88)
    assert b512["waste_frac"] == round(1 - 812 / 1024, 6)
    plan = (packing.padding_waste(docs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "partial_count" in plan       # map-side combine before the
    assert "Generate" not in plan        # tiny-group shuffle; no explode

    # NULL length counts as the empty doc (no phantom kept tokens from
    # null-skipping least(): truncation can never go negative)
    nd = spark.createDataFrame([(None,), (10,)], "n_tok long")
    rows = {r["bucket"]: r for r in packing.padding_waste(
        nd, buckets=(64,)).collect()}
    assert rows[64]["n_docs"] == 2
    assert rows[64]["n_tokens"] == 10
    assert rows[64]["n_tokens_truncated"] == 0
    assert rows[64]["waste_frac"] == round(1 - 10 / 128, 6)


def test_pack_summary_conserves_tokens(spark):
    docs = spark.range(0, 300).selectExpr(
        "id AS doc_id", "(id % 53) * 77 + 10 AS n_tok")
    summ = packing.pack_summary(docs)
    total = summ.agg(F.sum("n_tokens"), F.sum("n_docs")).collect()[0]
    expect = docs.agg(F.sum("n_tok"), F.count("*")).collect()[0]
    assert (total[0], total[1]) == (expect[0], expect[1])


def test_pack_documents_string_ids_stay_parallel(spark):
    """String ids must hash-bucket, not cast-to-long (which yields NULL
    and collapses the dataset into one window partition)."""
    docs = spark.range(0, 200).selectExpr(
        "concat('doc_', id) AS doc_id", "(id % 11) * 100 + 10 AS n_tok")
    out = packing.pack_documents(docs, buckets=8)
    got = out.select("bucket").distinct().collect()
    buckets = {r["bucket"] for r in got}
    assert None not in buckets
    assert len(buckets) > 1          # genuinely spread across buckets
    # still deterministic / partitioning-independent
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, packing.pack_documents(
        docs.repartition(5), buckets=8).collect()))
    assert a == b


def test_chunk_and_pack_invariants_bulk(spark):
    """Spec invariants over a diverse seeded corpus (one Spark round trip,
    invariants checked in plain Python): chunk windows cover every token
    exactly with `overlap`-token overlaps and no redundant tail; pack
    offsets advance by doc size within a bucket and every pack starts at
    pack_id * budget of the running span."""
    import numpy as np

    rng = np.random.default_rng(7)
    lens = [int(x) for x in
            np.concatenate([rng.integers(0, 5, 40),       # tiny + empty
                            rng.integers(5, 130, 80),     # sub-chunk
                            rng.integers(130, 900, 80)])]  # multi-chunk
    docs = spark.createDataFrame(
        [(i, list(range(n))) for i, n in enumerate(lens)],
        "doc_id long, tokens array<int>")
    chunk, overlap = 128, 32
    stride = chunk - overlap
    out = packing.chunk_tokens(docs, chunk=chunk, overlap=overlap)
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_start"], list(r["chunk_tokens"])))
    for i, n in enumerate(lens):
        chunks = sorted(by_doc.get(i, []))
        if n == 0:
            assert chunks == []
            continue
        assert [c[0] for c in chunks] == list(range(len(chunks)))
        assert all(c[1] == c[0] * stride for c in chunks)
        covered = sorted({t for _, _, ck in chunks for t in ck})
        assert covered == list(range(n))            # full coverage
        assert all(len(ck) <= chunk for _, _, ck in chunks)
        if len(chunks) > 1:
            # no redundant tail: the second-to-last window must NOT
            # already reach the end
            assert chunks[-2][1] + chunk < n

    sizes = docs.selectExpr("doc_id", "size(tokens) AS n_tok")
    packed = packing.pack_documents(sizes, budget=256, buckets=4)
    rows = sorted(map(tuple, packed.select(
        "bucket", "doc_id", "n_tok", "pack_id", "pack_offset").collect()))
    by_bucket: dict[int, list] = {}
    for b, d, n, p, off in rows:
        by_bucket.setdefault(b, []).append((d, n, p, off))
    for b, ds in by_bucket.items():
        ds.sort()
        run = 0
        for d, n, p, off in ds:
            assert off == run % 256
            assert p == run // 256                  # running-total rule
            run += n


# ---------------------------------------------------------------------------
# pack_blocks: cross-boundary block packing (GPT-style loader shape)
# ---------------------------------------------------------------------------
def _docs_with_tokens(spark, sizes, gap=1):
    """Docs with ids 0, gap, 2*gap, ... and recognizable token payloads
    (doc i's tokens are i*1000, i*1000+1, ...)."""
    rows = [(i * gap, list(range(i * 1000, i * 1000 + s)))
            for i, s in enumerate(sizes)]
    return spark.createDataFrame(rows, "doc_id long, tokens array<long>")


def test_global_exclusive_cumsum_matches_serial(spark):
    """The two-level (bucketed) cumsum equals the serial definition even
    when ids_per_bucket forces many buckets and ids are sparse."""
    sizes = [5, 0, 7, 3, 11, 2, 9, 1]
    docs = _docs_with_tokens(spark, sizes, gap=13).withColumn(
        "n", F.size("tokens").cast("long"))
    out = {r.doc_id: r.offset for r in packing.global_exclusive_cumsum(
        docs.repartition(5), "doc_id", "n", ids_per_bucket=3).collect()}
    run = 0
    for i, s in enumerate(sizes):
        assert out[i * 13] == run
        run += s


def test_pack_blocks_coverage_and_boundaries(spark):
    """Concatenating blocks in block order reproduces the doc-order token
    stream exactly; every block is full except the corpus tail; docs
    crossing a boundary split between blocks."""
    sizes = [3, 10, 1, 8, 4]  # total 26, block 8 -> blocks of 8,8,8,2
    docs = _docs_with_tokens(spark, sizes)
    blocks = sorted(packing.pack_blocks(docs, block=8).collect(),
                    key=lambda r: r.block_id)
    assert [b.block_id for b in blocks] == [0, 1, 2, 3]
    assert [b.n_tokens for b in blocks] == [8, 8, 8, 2]
    stream = [t for b in blocks for t in b.tokens]
    want = [t for i, s in enumerate(sizes)
            for t in range(i * 1000, i * 1000 + s)]
    assert stream == want
    # doc 1 (10 tokens at offset 3) crosses the 8-boundary: it must be
    # credited to blocks 0 and 1
    assert blocks[0].last_doc == 1 and blocks[1].first_doc == 1
    assert blocks[0].n_docs == 2  # docs 0 and 1


def test_pack_blocks_skips_empty_docs(spark):
    docs = spark.createDataFrame(
        [(0, [1, 2]), (1, []), (2, [3, 4, 5])],
        "doc_id long, tokens array<long>")
    blocks = sorted(packing.pack_blocks(docs, block=4).collect(),
                    key=lambda r: r.block_id)
    assert [list(b.tokens) for b in blocks] == [[1, 2, 3, 4], [5]]
    assert blocks[0].n_docs == 2  # the empty doc contributes nothing


def test_pack_blocks_partitioning_independent(spark):
    sizes = [7, 2, 9, 5, 1, 12, 4]
    docs = _docs_with_tokens(spark, sizes)
    a = sorted(map(lambda r: (r.block_id, list(r.tokens), r.n_docs),
                   packing.pack_blocks(docs, block=6).collect()))
    b = sorted(map(lambda r: (r.block_id, list(r.tokens), r.n_docs),
                   packing.pack_blocks(docs.repartition(4), block=6,
                                       ids_per_bucket=2).collect()))
    assert a == b


def test_pack_blocks_no_global_token_sort(spark):
    """Scale shape: every Window in the plan is bucket-partitioned —
    the only unpartitioned window runs over the #buckets-row totals,
    never over token-bearing rows — and the token payload crosses the
    block-regroup exchange, not a global range sort."""
    docs = _docs_with_tokens(spark, [5] * 20)
    plan = packing.pack_blocks(docs, block=8)._jdf.queryExecution() \
        .executedPlan().toString()
    import re
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            # unpartitioned window lines carry no partition spec before
            # the ORDER BY; the token-side window must name __bucket
            if "__btotal" in line:
                continue  # the tiny bucket-totals fold
            assert "__bucket" in line, line
    assert not re.search(r"Sort \[.*tokens", plan)


def test_pack_blocks_attach_shuffle_matches_broadcast(spark):
    """attach="shuffle" (the beyond-broadcast-scale offset re-attach, r6)
    produces identical blocks to the default broadcast join."""
    docs = _docs_with_tokens(spark, [5, 0, 3, 8, 2, 7])
    a = sorted(map(tuple, packing.pack_blocks(docs, block=6).collect()))
    b = sorted(map(tuple, packing.pack_blocks(docs, block=6,
                                              attach="shuffle").collect()))
    assert a == b
