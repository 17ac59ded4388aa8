"""Sequence packing and chunking for LLM training-data pipelines.

Two shapes every tokenized-corpus pipeline needs before training:

* :func:`pack_documents` — group whole documents into training sequences of
  ~``budget`` tokens ("sequence packing": small docs share a sequence so
  padding isn't wasted).  True greedy bin packing is a serial fold, so it
  is made distributed by bucketing: documents hash into ``buckets``
  independent streams, and WITHIN a bucket the assignment is a
  deterministic running-total rule — a doc belongs to the pack numbered
  ``floor(exclusive_cumsum / budget)`` over docs ordered by id.  A doc
  whose span crosses a boundary stays in the pack where it started
  (packs overflow by at most one doc; an oversized doc owns its packs'
  span) — the usual approximation, stated as a spec so an external oracle
  can replicate it bit-for-bit.  Cost shape at 100 TB: ONE shuffle on the
  bucket key + a per-bucket sort — no driver-side loop, no global sort,
  bucket count chosen so each bucket's doc list fits a task.

* :func:`chunk_tokens` — split each document's token array into fixed
  windows of ``chunk`` tokens advancing by ``chunk - overlap`` (sliding
  context windows).  Pure per-row JVM higher-order functions (sequence →
  explode → slice): no Python, no shuffle, embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def auto_buckets(n_rows: int, *, target_docs_per_bucket: int = 100_000,
                 min_buckets: int = 1, max_buckets: int = 1 << 20) -> int:
    """Bucket count sized to the corpus: each bucket is ONE window
    partition (one task sorting that bucket's doc list), so a fixed bucket
    count degenerates at scale — 16 buckets over 10^9 docs is 16 tasks
    sorting ~60M docs each.  ``ceil(n / target)`` keeps per-task sort size
    ~``target_docs_per_bucket`` at any corpus size (same
    fixed-parameter-vs-corpus-size fix as ``similarity.auto_nbits``)."""
    import math

    return max(min_buckets, min(max_buckets,
                                math.ceil(n_rows / target_docs_per_bucket)))


def pack_documents(df: DataFrame, id_col: str = "doc_id",
                   size_col: str = "n_tok", *, budget: int = 2048,
                   buckets: int | None = None, n_rows: int | None = None,
                   target_docs_per_bucket: int = 100_000) -> DataFrame:
    """Assign each document to a (bucket, pack_id) training sequence.

    Deterministic and partitioning-independent: the bucket is a pure
    function of the id — ``id mod buckets`` for numeric ids (portable to
    the SQL oracle), a Murmur3 hash bucket for string ids (NOT
    SQL-portable, but correct and parallel; casting a string id to long
    would yield NULL and silently collapse the whole dataset into ONE
    window partition).  The in-bucket order is the id; the pack is the
    running-total rule above.  ``id_col`` must be UNIQUE (the usual doc-id
    contract): the running total uses an explicit ROWS frame, so tied ids
    within a bucket would make pack assignment depend on their arbitrary
    relative order.  Adds ``bucket``, ``pack_id``, and ``pack_offset``
    (the doc's token offset inside its pack's running span).

    ``buckets`` defaults to :func:`auto_buckets` over the corpus size so
    each bucket's doc list stays task-sized as the corpus scales; pass
    ``n_rows`` when the count is already known (table statistics / Iceberg
    snapshot summary) to skip the count job, or pin ``buckets`` explicitly
    for reproducible pack numbering across corpus versions.
    """
    from pyspark.sql.types import NumericType

    if buckets is None:
        if n_rows is None:
            n_rows = df.count()
        buckets = auto_buckets(
            n_rows, target_docs_per_bucket=target_docs_per_bucket)
    if isinstance(df.schema[id_col].dataType, NumericType):
        b = F.pmod(F.col(id_col).cast("long"), F.lit(buckets))
    else:
        b = F.pmod(F.hash(id_col), F.lit(buckets))
    out = df.withColumn("bucket", b)
    # explicit ROWS frame: the default RANGE frame would sum ALL peer rows
    # of a tied id into the "exclusive" cumsum (identical for unique ids,
    # divergent + nondeterministic for ties)
    w = (Window.partitionBy("bucket").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    excl = (F.coalesce(F.sum(size_col).over(w), F.lit(0))
            - F.col(size_col)).cast("long")
    return (out
            .withColumn("pack_id",
                        F.floor(excl / F.lit(budget)).cast("long"))
            .withColumn("pack_offset",
                        (excl - F.floor(excl / F.lit(budget))
                         * F.lit(budget)).cast("long")))


def pack_summary(df: DataFrame, id_col: str = "doc_id",
                 size_col: str = "n_tok", *, budget: int = 2048,
                 buckets: int | None = None,
                 n_rows: int | None = None) -> DataFrame:
    """Per-pack census: how many docs and tokens each training sequence
    holds (the fill-rate profile that tells you whether the budget/bucket
    choice wastes padding)."""
    packed = pack_documents(df, id_col, size_col, budget=budget,
                            buckets=buckets, n_rows=n_rows)
    return (packed.groupBy("bucket", "pack_id")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum(size_col).cast("long").alias("n_tokens"),
                 F.min(id_col).alias("first_doc"),
                 F.max(id_col).alias("last_doc")))


def padding_waste(df: DataFrame, size_col: str = "n_tok", *,
                  buckets: tuple[int, ...] = (128, 256, 512, 1024, 2048)
                  ) -> DataFrame:
    """Length-bucketed padding census — the profiling number behind
    length-grouped batching: each doc pads up to the smallest bucket ≥ its
    length (docs longer than the largest bucket truncate to it), and per
    bucket the census reports docs, real tokens, padded slots, the wasted
    fraction, and truncated tokens.  A high ``waste_frac`` in a bucket
    says the bucket ladder (or the packing budget) is wrong for the
    corpus's length distribution.

    Pure codegen CASE-chain bucket assignment + one partial-aggregated
    groupBy over ≤ ``len(buckets)`` groups — no meaningful shuffle at any
    corpus size.
    """
    bs = sorted(set(int(b) for b in buckets))
    if not bs or bs[0] <= 0:
        raise ValueError("buckets must be positive")
    # NULL length counts as the empty document (this round's NULL-as-empty
    # convention): without the coalesce, a NULL falls through the CASE to
    # the LARGEST bucket and null-skipping least() credits it with a full
    # bucket of kept tokens — negative truncation, understated waste
    c = F.coalesce(F.col(size_col).cast("long"), F.lit(0).cast("long"))
    b = F.when(c <= bs[0], bs[0])
    for x in bs[1:]:
        b = b.when(c <= x, x)
    b = b.otherwise(bs[-1])
    kept = F.least(c, F.lit(bs[-1]))
    rows = df.select(b.cast("long").alias("bucket"),
                     c.cast("long").alias("n"),
                     kept.cast("long").alias("kept"))
    agg = rows.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n").cast("long").alias("n_tokens"),
        F.sum("kept").cast("long").alias("n_tokens_kept"))
    slots = F.col("n_docs") * F.col("bucket")
    return agg.select(
        "bucket", "n_docs", "n_tokens",
        slots.alias("n_padded_slots"),
        F.round(F.lit(1.0) - F.col("n_tokens_kept")
                / slots.cast("double"), 6).alias("waste_frac"),
        (F.col("n_tokens") - F.col("n_tokens_kept"))
        .alias("n_tokens_truncated"))


def chunk_tokens(df: DataFrame, tokens_col: str = "tokens",
                 id_col: str = "doc_id", *, chunk: int = 512,
                 overlap: int = 64) -> DataFrame:
    """Explode each doc's token array into sliding windows: starts at
    0, stride ``chunk - overlap``, window length ``chunk`` (the final
    window is shorter).  A start is emitted only while it points at
    unseen tokens (start < n for the first window; start chosen so the
    previous window didn't already cover the tail).  Empty docs emit no
    chunks.  Output: one row per (doc, chunk_idx) with the chunk slice.
    """
    if overlap >= chunk:
        raise ValueError("overlap must be < chunk")
    stride = chunk - overlap
    n = F.size(tokens_col)
    # last start: the largest k*stride that still begins before the end of
    # unseen territory — ceil((n - chunk) / stride) capped below at 0
    last = F.greatest(
        F.ceil((n - F.lit(chunk)) / F.lit(stride)).cast("long"), F.lit(0))
    starts = F.when(n > 0, F.sequence(
        F.lit(0).cast("long"), (last * F.lit(stride)).cast("long"),
        F.lit(stride).cast("long"))
    ).otherwise(F.array().cast("array<long>"))
    # posexplode alongside the array column: one projection, no self-join
    out = df.select(
        id_col, F.col(tokens_col).alias("_tok"),
        F.posexplode(starts).alias("chunk_idx", "chunk_start"))
    sl = F.slice(F.col("_tok"), F.col("chunk_start").cast("int") + 1,
                 chunk)
    return (out.select(id_col,
                       F.col("chunk_idx").cast("long").alias("chunk_idx"),
                       "chunk_start", sl.alias("chunk_tokens"))
            .withColumn("n_chunk_tokens",
                        F.size("chunk_tokens").cast("long")))
