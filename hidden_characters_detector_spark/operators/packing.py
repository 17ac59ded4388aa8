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

* :func:`pack_blocks` — the third shape, and the one GPT-style
  pretraining loaders actually consume: concatenate EVERY document's
  tokens in a deterministic global order and cut the stream into
  fixed-size blocks that cross document boundaries (no padding at all;
  only the final block is short).  The global token offset comes from a
  two-level cumsum — contiguous id-range buckets keep the within-bucket
  running total parallel while the bucket-level prefix is a tiny
  #buckets-row fold — so no single task ever sorts the corpus; each doc
  then emits one row per block its span touches (``n_docs +
  n_tokens/block`` rows, NOT per-token explosion) and blocks reassemble
  with ONE shuffle on the block id.
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


def global_exclusive_cumsum(df: DataFrame, order_col: str = "doc_id",
                            size_col: str = "n_tok", *,
                            ids_per_bucket: int = 1 << 20,
                            out_col: str = "offset",
                            attach: str = "broadcast") -> DataFrame:
    """Exclusive running total of ``size_col`` over the global
    ``order_col`` order, WITHOUT a global single-partition window —
    computed over the NARROW ``(order_col, size_col)`` projection only,
    then re-attached to ``df``, so wide payload columns (token arrays)
    never ride the cumsum's exchanges or sorts.

    ``order_col`` must be a unique non-negative integer id.  The id space
    splits into contiguous ranges (``id div ids_per_bucket``), so every
    id in bucket *i* precedes every id in bucket *i+1*: the global cumsum
    decomposes into (a) a per-bucket running total — an ordinary
    partitioned window, parallel across buckets — plus (b) the sum of all
    earlier buckets' totals — a bucket-level exclusive cumsum over
    ``#buckets`` rows, evaluated in one tiny single-partition window (at
    10^12 ids and the default bucket width that is ~10^6 rows of two
    longs — driver-trivial, data-independent).  The distributed
    prefix-sum shape, expressed declaratively so Catalyst/AQE own the
    physical plan.

    ``attach`` controls how the computed offset rejoins the payload:
    ``"broadcast"`` (default) broadcasts the ``(id, offset)`` relation —
    16 bytes/doc, right up to ~10^8 docs — so the payload side is never
    shuffled or sorted here at all; ``"shuffle"`` uses a shuffled-hash
    join on the id (one payload exchange, NO payload sort — the narrow
    side is the build side) for corpora whose id set outgrows a
    broadcast.  Either way the payload no longer flows through the
    window operator, which previously hash-partitioned and SORTED the
    full rows per bucket (with the default bucket width and < 2^20 ids
    that meant the whole payload sorted in ONE task).
    """
    if attach not in ("broadcast", "shuffle"):
        raise ValueError(f"attach must be 'broadcast' or 'shuffle', "
                         f"got {attach!r}")
    b = (F.col(order_col).cast("long") / F.lit(ids_per_bucket)) \
        .cast("long").alias("__bucket")
    sizes = df.select(order_col, size_col).withColumn("__bucket", b)
    wi = (Window.partitionBy("__bucket").orderBy(order_col)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    within = (F.coalesce(F.sum(size_col).over(wi), F.lit(0))
              - F.col(size_col)).cast("long")
    totals = sizes.groupBy("__bucket").agg(
        F.sum(size_col).cast("long").alias("__btotal"))
    wb = (Window.orderBy("__bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    prefix = totals.select(
        "__bucket",
        (F.coalesce(F.sum("__btotal").over(wb), F.lit(0))
         - F.col("__btotal")).cast("long").alias("__bprefix"))
    offsets = (sizes.join(F.broadcast(prefix), "__bucket")
               .select(order_col,
                       (F.col("__bprefix") + within).alias(out_col)))
    if attach == "broadcast":
        offsets = F.broadcast(offsets)
    else:
        offsets = offsets.hint("shuffle_hash")
    return df.join(offsets, order_col).select(*df.columns, out_col)


def pack_blocks(df: DataFrame, tokens_col: str = "tokens",
                id_col: str = "doc_id", *, block: int = 2048,
                ids_per_bucket: int = 1 << 20,
                attach: str = "broadcast") -> DataFrame:
    """Concatenate all documents' tokens in ascending ``id_col`` order
    and cut the stream into consecutive ``block``-token blocks that CROSS
    document boundaries (zero padding; only the last block of the corpus
    is short).  To shuffle the training order first, renumber ids by an
    epoch key (``sampling.epoch_shuffle``) upstream — the id order IS the
    concatenation order.

    Deterministic and partitioning-independent: a doc whose span is
    ``[offset, offset + n)`` contributes ``tokens[a:b]`` to every block
    whose ``[block_id*block, (block_id+1)*block)`` range it overlaps.
    Empty docs contribute nothing.  Output: one row per block —
    ``block_id``, the assembled ``tokens``, ``n_tokens``, ``n_docs``,
    ``first_doc``, ``last_doc``.

    Scale shape: offsets via :func:`global_exclusive_cumsum` on the
    narrow (id, size) projection ONLY — the token payload never flows
    through the cumsum's window exchange/sort; the per-doc offset is
    re-attached by a broadcast (default) or shuffled-hash join
    (``attach``, see :func:`global_exclusive_cumsum`); each doc explodes
    to one row per TOUCHED block (``n_docs + n_tokens/block`` rows,
    never per-token); token payload crosses exactly ONE exchange (the
    block regroup), and within a block the fragments reassemble by an
    ``array_sort`` on the carried offset — no second sort pass.
    """
    if block <= 0:
        raise ValueError("block must be positive")
    n = F.size(tokens_col).cast("long")
    base = df.select(id_col, tokens_col).where(n > 0) \
        .withColumn("__n", n)
    off = global_exclusive_cumsum(base, id_col, "__n",
                                  ids_per_bucket=ids_per_bucket,
                                  out_col="__off", attach=attach)
    first_b = (F.col("__off") / F.lit(block)).cast("long")
    last_b = ((F.col("__off") + F.col("__n") - 1) / F.lit(block)) \
        .cast("long")
    spans = off.select(
        id_col, tokens_col, "__n", "__off",
        F.explode(F.sequence(first_b, last_b)).alias("block_id"))
    lo = F.greatest(F.col("block_id") * block - F.col("__off"), F.lit(0))
    hi = F.least((F.col("block_id") + 1) * block,
                 F.col("__off") + F.col("__n")) - F.col("__off")
    frags = spans.select(
        "block_id", F.col(id_col).alias("__doc"), "__off",
        F.slice(tokens_col, (lo + 1).cast("int"),
                (hi - lo).cast("int")).alias("__frag"))
    assembled = (frags.groupBy("block_id")
                 .agg(F.count("*").cast("long").alias("n_docs"),
                      F.min("__doc").alias("first_doc"),
                      F.max("__doc").alias("last_doc"),
                      F.flatten(F.transform(
                          F.array_sort(F.collect_list(
                              F.struct("__off", "__frag"))),
                          lambda s: s["__frag"])).alias(tokens_col)))
    return assembled.select(
        "block_id", tokens_col,
        F.size(tokens_col).cast("long").alias("n_tokens"),
        "n_docs", "first_doc", "last_doc")


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
    # n_chunk_tokens in CLOSED FORM (every start satisfies start < n, so
    # the slice length is min(chunk, n - start)) rather than
    # size(chunk_tokens): consumers that aggregate only the counts then
    # never materialize the sliced arrays at all — Catalyst prunes the
    # whole slice projection
    n_chunk = F.least(F.lit(chunk).cast("long"),
                      F.size("_tok").cast("long") - F.col("chunk_start"))
    return out.select(id_col,
                      F.col("chunk_idx").cast("long").alias("chunk_idx"),
                      "chunk_start", sl.alias("chunk_tokens"),
                      n_chunk.cast("long").alias("n_chunk_tokens"))
