#!/usr/bin/env python3
"""Benchmark harness: headline engine queries at $SPARK_GRAFT_SF_DIR.

Prints exactly one JSON line:
``{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...},
"sf": ..., "rows": ..., "seq_per_sec": ...}``

The corpus is the deterministic synthetic token table (input_hint shape)
scaled to ~600k sequences via partition-local replication of the sf
documents corpus (FIXTURES.md bench tier).  Queries cover the engine's hot
paths: full clean, event emission + grouped agg, salted windowed density,
and the end-to-end flagship pipeline.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# glibc tuning for this sandbox's pathologically slow page faults: without
# it, every task re-faults its freed-and-trimmed heap (10-30x slowdowns with
# huge variance).  Static thresholds keep worker heaps resident.  Must be set
# before the JVM/worker processes spawn; local-mode Python workers inherit
# this environment.
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(256 << 20))
os.environ.setdefault("MALLOC_TOP_PAD_", str(128 << 20))
os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# default 8: this VM's lazily-backed memory throttles >8 concurrent Spark
# workers (see BENCH/BASELINE.md environment notes); explicit env overrides
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
WARMUP_ROUNDS = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "2"))
TARGET_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "600000"))


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (SparkSession.builder.master(f"local[{cpus}]")
            .appName("hcd-spark-bench")
            # shuffle partitions capped at 16: post-shuffle intermediates
            # here are tiny, and on this VM every concurrent reducer task
            # pays the fault-handler floor — at local[32] with 64 shuffle
            # partitions the multi-stage queries (dedup_e2e, pack_chunk)
            # run 2-6x slower than with 16 (measured: pack_chunk 6.1 s ->
            # 1.0 s, dedup_e2e 10.6-15.8 s -> 6.5-7.5 s); scan-side
            # parallelism is unaffected (input partitioning drives it)
            .config("spark.sql.shuffle.partitions",
                    str(min(2 * cpus, 16)))
            .config("spark.default.parallelism", str(2 * cpus))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.driver.memory", "12g")
            .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
            .config("spark.python.worker.reuse", "true")
            .config("spark.python.worker.idleTimeoutSeconds", "3600")
            .config("spark.ui.enabled", "false")
            .getOrCreate())


def corpus(spark, cpus: int):
    import duckdb

    from hidden_characters_detector_spark.sources import synth

    n_docs = duckdb.sql(
        f"select count(*) from read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    replicate = max(1, TARGET_ROWS // n_docs)
    tok = synth.token_table(spark, SF_DIR, replicate=replicate,
                            partitions=2 * cpus)
    return tok, n_docs * replicate


def bench_queries(spark, tok):
    """name -> (callable returning a small collected result)."""
    from pyspark.sql import functions as F

    from hidden_characters_detector_spark.functions.kernel import FULL_CLEAN
    from hidden_characters_detector_spark.operators.clean import (
        clean_detect, detect_events)

    def q_clean_full():
        return clean_detect(tok, FULL_CLEAN).agg(
            F.count("*"), F.sum("n_detected"), F.sum("n_tok_clean"),
            F.sum(F.col("had_marker").cast("long"))).collect()

    def q_events_by_type():
        # keep=[] prunes the per-event passthrough fan-out entirely;
        # event_cols prunes the unused event payload (idx/description/
        # replacement) at the operator boundary — mapInArrow blocks
        # Catalyst pruning, so projection must be explicit
        return (detect_events(tok, FULL_CLEAN, keep=[],
                              event_cols=["token", "marker_type", "action"])
                .groupBy("marker_type", "action")
                .agg(F.count("*"), F.sum("token")).collect())

    def q_density_windows():
        # salted two-phase agg over skewed `source` (north_rule skew
        # handling), pre-aggregated map-side from per-sequence counters
        cleaned = clean_detect(tok, FULL_CLEAN)
        salted = (cleaned.groupBy(
            F.window("event_time", "1 minute"), "source",
            F.pmod(F.hash("doc_id"), F.lit(16)).alias("salt"))
            .agg(F.sum("n_detected").alias("c"),
                 F.approx_count_distinct("doc_id").alias("d")))
        return (salted.groupBy("window", "source")
                .agg(F.sum("c").alias("n_detections"),
                     F.sum("d").alias("docs_est"))
                .orderBy(F.desc("n_detections")).limit(10).collect())

    def q_clean_roundtrip():
        # clean -> filter changed -> length stats (sink-shaped projection)
        c = clean_detect(tok, FULL_CLEAN)
        return (c.where("had_marker")
                .select("source", (F.col("n_tok") - F.col("n_tok_clean"))
                        .alias("removed"))
                .groupBy("source").agg(F.count("*"), F.sum("removed"))
                .collect())

    return {
        "clean_full": q_clean_full,
        "events_by_type": q_events_by_type,
        "density_windows": q_density_windows,
        "clean_roundtrip": q_clean_roundtrip,
    }


def bench_dedup(spark, cpus: int):
    """Dedup hot path: vectorized minhash signatures + banded LSH pairs
    over a replicated text corpus (replica tag appended so replicas are
    near- but not exact duplicates of their base doc)."""
    from pyspark.sql import functions as F

    from hidden_characters_detector_spark.operators import dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    reps = spark.range(0, 30, 1, numPartitions=2 * cpus)
    corpus = (reps.crossJoin(F.broadcast(docs))
              .selectExpr("concat(doc_id, '_', id) AS doc_id",
                          "concat(id, '_', text) AS text"))

    def q_dedup_minhash():
        # signature stage only: the per-token vectorized kernel cost
        sig = dedup.minhash_signatures(corpus)
        # min/count, not sum: minhash values are ~2^61, a 60k-row sum
        # overflows long under ANSI mode
        return sig.agg(F.count("*"),
                       F.min(F.element_at("minhash", 1))).collect()

    docs_raw = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text").localCheckpoint()

    def q_dedup_e2e():
        # FULL near-dup pipeline on the raw corpus (natural template
        # clusters): signatures -> banded LSH self-join -> exact-Jaccard
        # verify -> connected components -> canonical keeper.  bands=8
        # (r=8) is the precision-oriented production banding for a 0.85
        # threshold: measured on this corpus it emits 721 candidates vs
        # 241k at the recall-oriented default (bands=16, r=4) with
        # IDENTICAL verified output (255 pairs) — the verify stage is the
        # shuffle+kernel cost at scale, so candidate precision is the knob.
        out = dedup.dedup_groups(docs_raw, jaccard_threshold=0.85,
                                 bands=8)
        res = out.agg(F.count("*"),
                      F.sum(F.col("is_canonical").cast("long"))).collect()
        out.unpersist()
        return res

    return {"dedup_minhash": q_dedup_minhash, "dedup_e2e": q_dedup_e2e}


def bench_curation(spark, cpus: int):
    """Curation sweep additions: cross-document line dedup (C4 boilerplate
    removal) and benchmark decontamination over a replicated multiline
    corpus — replicas share planted header/footer lines (real dropping
    work) and the eval set is substrings of base docs (real k-gram hits)."""
    from pyspark.sql import functions as F

    from hidden_characters_detector_spark.operators import (decontam,
                                                            line_dedup)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    reps = spark.range(0, 30, 1, numPartitions=2 * cpus)
    corpus = (reps.crossJoin(F.broadcast(docs))
              .selectExpr(
                  "concat(doc_id, '_', id) AS doc_id",
                  "concat('shared header v', doc_id % 4, char(10), "
                  "replace(text, ' the ', char(10)), char(10), "
                  "'shared corpus footer') AS text")
              .localCheckpoint())
    evl = docs.where("doc_id % 7 = 0") \
        .selectExpr("doc_id", "substr(text, 11) AS text")

    def q_line_dedup():
        out = line_dedup.dedup_lines(corpus, min_docs=50)
        return out.agg(F.count("*"), F.sum("n_lines_dropped"),
                       F.sum("n_lines_kept")).collect()

    def q_decontam():
        out = decontam.contamination_report(corpus, evl, k=20)
        return out.agg(F.count("*"), F.sum("n_hits")).collect()

    docs_src = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text", "source").localCheckpoint()
    n_src = docs_src.select("source").distinct().count()

    def q_tfidf():
        # per-source characteristic terms over the RAW corpus (real
        # source labels; the replicated corpus' identical replicas add
        # no tf-idf work): explode -> two vocab-bounded partial aggs ->
        # idf join -> top-k.  n_sources passed to skip the count job.
        from hidden_characters_detector_spark.operators import text_analysis
        out = text_analysis.tfidf_terms(docs_src, top=20,
                                        n_sources=n_src)
        return out.agg(F.count("*"), F.sum("tfidf")).collect()

    def q_substr_dedup():
        # ExactSubstr span removal over the RAW corpus (natural template
        # dups only — the replicated corpus is a 97%-duplicate
        # pathological case measured separately in BENCH/BASELINE.md):
        # position hashing + the Θ(n) hash-keyed verdict shuffle +
        # island merge + interval-paint rebuild
        from hidden_characters_detector_spark.operators import substr_dedup
        out = substr_dedup.remove_duplicated_spans(docs, k=40)
        return out.agg(F.count("*"),
                       F.sum(F.length("text_dedup"))).collect()

    return {"line_dedup": q_line_dedup, "decontam": q_decontam,
            "tfidf": q_tfidf, "substr_dedup": q_substr_dedup}


def bench_ann(spark, cpus: int):
    """Batch IVF ANN: k-means coarse quantizer over the embeddings table,
    then every 10th vector as a query — probe assignment, cluster-equi
    candidate join, per-query top-10 (the realistic query-table-vs-index
    similarity-search shape)."""
    from pyspark.sql import functions as F

    from hidden_characters_detector_spark.operators import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet") \
        .select("vec_id", "embedding").localCheckpoint()
    n_emb = emb.count()

    def q_ann_ivf_batch():
        queries = emb.where("vec_id % 10 = 0").selectExpr(
            "vec_id AS query_id", "embedding")
        out = similarity.ivf_batch_topk(emb, queries, k=10, nprobe=3,
                                        iters=2, n_vectors=n_emb)
        return out.agg(F.count("*"), F.sum("rank")).collect()

    return {"ann_ivf_batch": q_ann_ivf_batch}


def bench_packing(spark, tok):
    """Training-sequence shaping over the 600k-row token table: sliding
    chunk explode (zero-shuffle JVM path) + bucketed sequence packing
    (one shuffle + per-bucket sort)."""
    from pyspark.sql import functions as F

    from hidden_characters_detector_spark.operators import packing

    def q_pack_chunk():
        chunks = packing.chunk_tokens(tok, chunk=128, overlap=32)
        a = chunks.agg(F.count("*"), F.sum("n_chunk_tokens")).collect()
        packs = packing.pack_summary(tok.select("doc_id", "n_tok"),
                                     budget=2048, buckets=64)
        b = packs.agg(F.count("*"), F.sum("n_tokens"),
                      F.avg("n_docs")).collect()
        return a + b

    def q_block_pack():
        # cross-boundary block packing: the whole 600k-doc token stream
        # (~180M tokens) re-cut into 2048-token blocks — bucketed cumsum
        # on the narrow projection + ONE token-bearing exchange.
        # token_table ids are 'doc<N>' strings; strip the prefix for the
        # integer order key pack_blocks requires
        blocks = packing.pack_blocks(
            tok.selectExpr("CAST(substr(doc_id, 4) AS LONG) AS doc_id",
                           "tokens"),
            block=2048)
        return blocks.agg(F.count("*"), F.sum("n_tokens"),
                          F.max("n_docs")).collect()

    return {"pack_chunk": q_pack_chunk, "block_pack": q_block_pack}


def bench_bloom(spark, cpus: int):
    """Cross-snapshot Bloom membership: build the m-bit filter over a
    150k-doc replicated corpus (per-partition bitsets OR'd on the
    driver), then probe every doc through the broadcast Arrow path —
    the two passes a 100 TB history-dedup actually pays."""
    from pyspark.sql import functions as F

    from hidden_characters_detector_spark.operators import bloom

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    reps = spark.range(0, 30, 1, numPartitions=2 * cpus)
    corpus = (reps.crossJoin(F.broadcast(docs))
              .selectExpr("concat(doc_id, '_', id) AS doc_id",
                          "concat(id, '_', text) AS text")
              .localCheckpoint())

    def q_bloom_e2e():
        m, k = 1 << 21, 5  # ~14 bits/key at 150k keys -> FP ~1e-2
        bits = bloom.bloom_build(corpus, "text", m=m, k=k)
        out = bloom.bloom_might_contain_py(corpus, bits, "text", m=m, k=k)
        return out.agg(F.count("*"),
                       F.sum(F.col("might_contain").cast("long"))).collect()

    return {"bloom_e2e": q_bloom_e2e}


def main() -> None:
    spark = build_spark(CPUS)
    try:
        tok, nrows = corpus(spark, CPUS)
        tok = tok.localCheckpoint()  # materialize once; bench the engine,
        # not the synthetic generator
        qs = bench_queries(spark, tok)
        qs.update(bench_dedup(spark, CPUS))
        qs.update(bench_packing(spark, tok))
        qs.update(bench_curation(spark, CPUS))
        qs.update(bench_bloom(spark, CPUS))
        qs.update(bench_ann(spark, CPUS))
        for _ in range(WARMUP_ROUNDS):  # fault worker heaps, off the clock
            for fn in qs.values():
                fn()
        # best-of-N per query: this VM's page-fault latency varies by 2-4x
        # between runs minutes apart (host-side weather — memory is free,
        # nothing else runs), so a single timing is mostly noise; the best
        # of 3 is the steady-state engine cost, same protocol as
        # scripts/scaling_bench.py's best-N median
        timings: dict[str, float] = {}
        for name, fn in qs.items():
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        total = round(sum(timings.values()), 3)
        # headline throughput over the FIXED four token-table queries only:
        # r4's nrows*len(all queries)/total silently redefined the metric
        # every time a query was added (a new 6 s dedup query read as a
        # phantom 21% regression) — pinning the query set keeps
        # BENCH_r{N}.json comparable across rounds
        token_qs = ("clean_full", "events_by_type", "density_windows",
                    "clean_roundtrip")
        token_total = sum(timings[q] for q in token_qs)
        out = {
            "metric": "headline engine queries wall time (clean + events + "
                      "windowed density) on synthetic token table",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
            "rows": nrows,
            "cpus": CPUS,
            "seq_per_sec": round(nrows * len(token_qs) / token_total)
            if token_total else None,
            "seq_per_sec_queries": list(token_qs),
        }
        print(json.dumps(out))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
