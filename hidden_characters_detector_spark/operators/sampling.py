"""Deterministic sampling / splitting for training-data pipelines.

Train/test splits and per-stratum downsampling at 100 TB must be pure
functions of the row id — ``df.sample()`` is seed+partitioning dependent,
so re-running after a repartition (or on a different cluster size) would
move rows across splits.  These operators hash the id to a uniform unit
value with PORTABLE SQL arithmetic (md5 hex digits decoded positionally),
so results are stable under any partitioning, reproducible across engines
(the driver's DuckDB oracle evaluates the identical expression), and need
no shuffle at all — a sampling decision is a stateless projection that
whole-stage codegen fuses into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_unit(id_col: str | Column, salt: int | str) -> Column:
    """Uniform [0, 1) value from the first 8 hex digits of
    ``md5(id || '|' || salt)`` — exact in float64 (integer / 2^32).

    The hex prefix parses as ONE base conversion rather than a per-digit
    CASE-chain fold: the fold computes the identical number, but it
    embeds the md5 subtree in every conditional branch and codegen's
    subexpression elimination skips branches, so the digest was
    re-hashed 8x per row (measured 6x slower in the same-shaped bloom
    kernel).  The DuckDB oracles keep the digit-fold arithmetic
    (``__spark_entry__._o_hash_unit``); the values are equal by
    definition."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    hx = F.md5(F.concat(col.cast("string"), F.lit(f"|{salt}")))
    # 8 hex digits exceed int32 (ANSI overflow) — parse through BIGINT
    v = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
    return v.cast("double") / F.lit(4294967296.0)


def train_test_split(df: DataFrame, id_col: str = "doc_id", *,
                     train_frac: float = 0.8,
                     salt: int | str = 42) -> DataFrame:
    """Add ``split: string`` ('train'/'test') — deterministic per id."""
    u = hash_unit(id_col, salt)
    return df.withColumn(
        "split", F.when(u < F.lit(train_frac), F.lit("train"))
        .otherwise(F.lit("test")))


def temperature_fractions(counts: dict[str, int], *, alpha: float = 0.5,
                          total_budget: int) -> dict[str, float]:
    """Per-source keep fractions for temperature-based mixing: source
    probability ∝ ``n_s^alpha`` (the multilingual-pretraining upsampling
    rule — alpha<1 flattens the head, lifts the tail), scaled so the
    expected kept total is ``total_budget`` and clamped at 1.0 (a tail
    source can't be sampled above its size; the realized total then runs
    slightly under budget, the standard behavior).  Deterministic:
    iteration is over sorted sources so the float sum is reproducible.
    """
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    keys = sorted(counts)
    weights = {s: float(counts[s]) ** alpha for s in keys}
    z = sum(weights[s] for s in keys)
    return {s: min(1.0, total_budget * weights[s] / z / counts[s])
            for s in keys}


def temperature_mix(df: DataFrame, counts: dict[str, int], *,
                    alpha: float = 0.5, total_budget: int,
                    strata_col: str = "source", id_col: str = "doc_id",
                    salt: int | str = 44) -> DataFrame:
    """Rebalance a multi-source corpus by sampling temperature: keep each
    row with its source's :func:`temperature_fractions` probability,
    decided by the deterministic id hash — zero shuffle, partitioning-
    independent, reproducible (plain :func:`stratified_sample` under
    computed fractions).  ``counts`` comes from table statistics or one
    ``groupBy(strata_col).count()`` — pass it in rather than recomputing
    so the projection stays a single codegen pass."""
    fracs = temperature_fractions(counts, alpha=alpha,
                                  total_budget=total_budget)
    return stratified_sample(df, fracs, strata_col=strata_col,
                             id_col=id_col, salt=salt)


def epoch_shuffle(df: DataFrame, epoch: int, id_col: str = "doc_id", *,
                  n_shards: int | None = None,
                  salt: str = "epoch") -> DataFrame:
    """Deterministic training-order generation: a fresh, reproducible
    global permutation of the corpus for each ``epoch``.

    The sort key is ``hash_unit(id, salt+epoch)`` — a pure zero-state
    function of the row id, so the permutation is identical on any
    cluster size, any partitioning, and any re-run (unlike
    ``df.orderBy(rand(seed))``, whose ``rand`` is partition-indexed and
    moves rows when the input partitioning changes).  Each epoch's salt
    yields an independent permutation.

    Adds ``shuffle_key`` (the [0,1) sort key) and, when ``n_shards`` is
    given, ``shard = floor(shuffle_key * n_shards)`` — because the key is
    uniform, shards are balanced in expectation, and writing the output
    partitioned by ``shard`` with files sorted by key IS the epoch's read
    order.  Returns the frame globally ordered by ``(shuffle_key, id)``:
    one range-partitioned sort — Spark samples the key distribution and
    sorts each range locally, the same plan shape as any terabyte ORDER
    BY write.  Consumers that only need shard assignment (not a total
    order) can drop the ``orderBy`` cost by calling :func:`hash_unit`
    directly — the projection itself is shuffle-free codegen.
    """
    u = hash_unit(id_col, f"{salt}{epoch}")
    out = df.withColumn("shuffle_key", u)
    if n_shards is not None:
        out = out.withColumn(
            "shard",
            F.floor(F.col("shuffle_key") * F.lit(n_shards)).cast("long"))
    return out.orderBy("shuffle_key", id_col)


def stratified_sample(df: DataFrame, fractions: dict[str, float], *,
                      strata_col: str = "source", id_col: str = "doc_id",
                      default_frac: float = 0.0,
                      salt: int | str = 43) -> DataFrame:
    """Keep a per-stratum deterministic Bernoulli sample: row kept iff
    ``hash_unit(id) < fractions[stratum]`` (strata not listed use
    ``default_frac``).  The rebalancing step of a curation pipeline —
    e.g. downsample over-represented sources — with zero shuffle and
    partition-independent output."""
    frac = F.lit(float(default_frac))
    for stratum, p in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == stratum,
                      F.lit(float(p))).otherwise(frac)
    return df.where(hash_unit(id_col, salt) < frac)
