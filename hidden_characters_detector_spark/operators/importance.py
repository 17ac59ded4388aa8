"""DSIR-style importance resampling (Xie et al. 2023, "Data Selection
for Language Models via Importance Resampling").

Select raw-corpus documents whose word distribution looks like a TARGET
domain: score each document by the log-likelihood ratio of its words
under a target unigram model vs a raw-corpus unigram model, then draw a
fixed-size sample with the Gumbel-top-k trick (sampling without
replacement with probability ∝ the importance weight).  This is the
domain-upweighting step of a pretraining data pipeline — the
distribution-matching complement of the threshold filters
(``text_analysis.unigram_logprob`` cuts absolute quality tails; this
RANKS by target-domain resemblance).

The unigram bag-of-words feature here is the zero-dependency floor of
the paper's hashed-ngram features, matching the engine's other text
models (``text_analysis.word_counts`` supplies both models, and the
word definition is shared corpus-wide).

Scale shape (design for 100 TB):

* Both models are vocabulary heads (≤ millions of rows) — BROADCAST
  against the exploded words, so the corpus side never shuffles for
  the lookups; the per-doc reduce is the plan's only wide shuffle
  (the ``explode_outer`` sentinel-row pattern of ``unigram_logprob``
  keeps empty docs without a second doc-keyed spine join).
* The Gumbel key is a pure function of ``(doc_id, salt)``
  (``sampling.hash_unit`` — partitioning-independent, reproducible),
  and the top-k is a per-partition top-k + driver merge
  (``TakeOrdered``), NOT a global sort.

Cross-engine determinism (same protocol as ``unigram_logprob``): each
word's log2 ratio is rounded to 6 decimals and summed as DECIMAL —
exact and accumulation-order independent; the ratio is a function of
the (target count, raw count) pair alone, so only ~|models| distinct
values could straddle a rounding boundary.

Reference seed: none — the reference has no sampling surface (its unit
of work is a line, ``/root/reference/hidden-characters-detector.py:740``);
this operator is part of the LLM-training-data brief.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import hash_unit

_LN2 = math.log(2.0)


def log2_ratio_weights(df: DataFrame, target_model: DataFrame,
                       raw_model: DataFrame, *,
                       target_total: int | None = None,
                       raw_total: int | None = None,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Per-document DSIR importance weight in log2:
    ``log2_ratio_sum = Σ_w [log2 p_target(w) − log2 p_raw(w)]`` over the
    document's words, with ``p(w) = cnt / total`` and the same
    ``1 / total`` out-of-vocabulary floor both models apply in
    ``unigram_logprob``.  Positive ⇒ the doc looks more like the target
    domain than like the raw corpus.

    ``target_model`` / ``raw_model``: ``(word, cnt)`` rows (typically
    ``text_analysis.word_counts`` heads over an in-domain sample and
    the raw corpus).  ``*_total``: the TRUE corpus word totals,
    defaulting to each model's own mass (correct only for un-truncated
    models — pass the real totals for top-k heads).

    Output per input row: ``(id_col, n_words, log2_ratio_sum,
    log2_ratio_per_word)``; an empty/NULL doc scores ``0, 0.0, 0.0``
    (no evidence either way).
    """
    if target_total is None:
        target_total = target_model.agg(F.sum("cnt")).collect()[0][0] or 1
    if raw_total is None:
        raw_total = raw_model.agg(F.sum("cnt")).collect()[0][0] or 1
    c = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(F.lower(c), r"[^a-z0-9]+"),
                     lambda w: w != "")
    exploded = df.select(id_col, F.explode_outer(words).alias("word"))
    joined = (exploded
              .join(F.broadcast(target_model.select(
                  "word", F.col("cnt").alias("_tc"))), "word", "left")
              .join(F.broadcast(raw_model.select(
                  "word", F.col("cnt").alias("_rc"))), "word", "left"))
    # log2 p_t(w) − log2 p_r(w)
    #   = [log2 tc − log2 T] − [log2 rc − log2 R]; the integer-count
    # log2 formulation mirrors unigram_logprob's determinism protocol
    ratio = ((F.log2(F.coalesce(F.col("_tc"), F.lit(1)).cast("double"))
              - F.log2(F.lit(float(target_total))))
             - (F.log2(F.coalesce(F.col("_rc"), F.lit(1)).cast("double"))
                - F.log2(F.lit(float(raw_total)))))
    is_word = F.col("word").isNotNull()
    per_doc = (joined.groupBy(id_col).agg(
        F.sum(is_word.cast("long")).alias("n_words"),
        F.sum(F.when(is_word,
                     F.round(ratio, 6).cast("decimal(18,6)")))
        .cast("double").alias("_sum")))
    s = F.coalesce(F.col("_sum"), F.lit(0.0))
    return per_doc.select(
        id_col, "n_words",
        F.round(s, 6).alias("log2_ratio_sum"),
        F.when(F.col("n_words") > 0,
               F.round(s / F.col("n_words"), 6))
        .otherwise(F.lit(0.0)).alias("log2_ratio_per_word"))


def gumbel_key(id_col, logw_col, *, salt: int | str = "dsir"):
    """Gumbel-top-k sampling key: ``ln(w) + Gumbel(0,1)`` with the noise
    derived deterministically from the id (``-ln(-ln(u))`` over the
    md5 unit hash, offset by 2⁻³³ so ``u = 0`` is unreachable — the
    offset keeps the sum exactly representable: ``(2v+1)/2³³`` with
    ``2v+1 < 2⁵³``).  Ranking by this key without replacement samples
    each doc with probability ∝ its importance weight ``w`` (the Gumbel
    trick); the weight arrives as log2, so ``ln w = log2_ratio · ln 2``.
    Pure function of ``(id, salt)`` — partitioning-independent and
    replicated verbatim by the DuckDB oracle."""
    u = hash_unit(id_col, salt) + F.lit(1.0 / 8589934592.0)
    return (F.col(logw_col) * F.lit(_LN2)) - F.log(-F.log(u))


def dsir_sample(df: DataFrame, target_model: DataFrame,
                raw_model: DataFrame, *, k: int,
                target_total: int | None = None,
                raw_total: int | None = None,
                text_col: str = "text", id_col: str = "doc_id",
                salt: int | str = "dsir") -> DataFrame:
    """Gumbel-top-k importance resample: the ``k`` documents with the
    largest ``gumbel_key`` over :func:`log2_ratio_weights` — a
    without-replacement draw with probability ∝ the importance weight,
    reproducible under any partitioning.  Returns ``(id_col, n_words,
    log2_ratio_sum, log2_ratio_per_word, sample_key)`` for the selected
    docs; the top-k plans as per-partition heaps + a driver merge
    (``TakeOrdered``), never a full sort shuffle."""
    w = log2_ratio_weights(df, target_model, raw_model,
                           target_total=target_total,
                           raw_total=raw_total,
                           text_col=text_col, id_col=id_col)
    key = gumbel_key(id_col, "log2_ratio_sum", salt=salt)
    return (w.withColumn("sample_key", F.round(key, 6))
            .orderBy(F.col("sample_key").desc(), F.col(id_col))
            .limit(k))
