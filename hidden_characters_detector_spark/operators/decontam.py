"""Benchmark decontamination for training-data pipelines.

A training corpus that contains verbatim chunks of an evaluation benchmark
inflates eval scores; the standard guard (GPT-3 appendix C, PaLM §6, and
the open reproductions) flags every training document sharing any
``k``-gram with the eval set and drops or audits it.  Character
``k``-grams (k≈20) rather than word tokens: tokenizer-independent and
robust to whitespace/punctuation drift, the same shingle definition the
near-dup operators use (``dedup._flat_shingle_hashes`` — one vectorized
rolling-hash pass per Arrow batch, no per-doc Python).

Scale shape (100 TB framing):

* each side reduces to DISTINCT ``(doc_id, shingle_hash)`` rows inside the
  Arrow kernel (segment-wise dedup, no Spark shuffle for the per-doc
  distinct);
* the eval side is a benchmark — thousands of documents, millions of
  shingles at most — so its distinct hash set is BROADCAST and the train
  side's membership probe (a left-semi join) never shuffles;
* the per-doc hit count is a partial-aggregated groupBy on ``doc_id``
  carrying two longs;
* the final drop is a left-anti join of train against the (small)
  contaminated-id list.

No all-pairs comparison anywhere: cost is one kernel pass per side plus
one broadcast probe.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _flat_shingle_hashes, _unique_per_doc


def doc_shingle_hashes(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", *, k: int = 20) -> DataFrame:
    """One row per (doc, DISTINCT char-``k``-gram rolling hash).

    The whole fan-out happens inside the Arrow kernel: flat rolling hash
    over the batch, segment-wise distinct, then a gather of the ids — the
    emitted relation is already deduplicated per document, so downstream
    joins need no ``dropDuplicates`` shuffle.  Docs shorter than ``k``
    emit nothing (no signal).  Hashes are the uint64 rolling values
    reinterpreted as int64 — an internal join key, never a contract value.
    """
    slim = df.select(id_col, text_col)
    id_type = slim.schema[id_col].dataType.simpleString()
    ddl = f"{id_col} {id_type}, shingle_hash bigint"

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            h, off = _flat_shingle_hashes(batch.column(text_col), k)
            uh, uoff = _unique_per_doc(h, off)
            lens = np.diff(uoff)
            idx = np.repeat(np.arange(lens.shape[0], dtype=np.int64), lens)
            ids = batch.column(id_col).take(pa.array(idx, type=pa.int64()))
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(uh.astype(np.int64), type=pa.int64())],
                names=[id_col, "shingle_hash"])

    return slim.mapInArrow(run, ddl)


def contamination_report(train: DataFrame, eval_df: DataFrame, *,
                         text_col: str = "text", id_col: str = "doc_id",
                         k: int = 20,
                         broadcast_eval: bool = True) -> DataFrame:
    """Per-contaminated-doc audit: ``(id_col, n_hits)`` where ``n_hits``
    is the number of DISTINCT ``k``-gram hashes the training document
    shares with the eval set.  Clean documents emit no row.

    ``broadcast_eval`` (default) broadcasts the eval set's distinct hash
    set — correct whenever the eval side is benchmark-sized; pass
    ``False`` to let the probe become a shuffle semi-join for an
    unusually large eval corpus.
    """
    th = doc_shingle_hashes(train, text_col, id_col, k=k)
    eh = (doc_shingle_hashes(eval_df, text_col, id_col, k=k)
          .select("shingle_hash").dropDuplicates())
    if broadcast_eval:
        eh = F.broadcast(eh)
    return (th.join(eh, "shingle_hash", "left_semi")
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_hits")))


def decontaminate(train: DataFrame, eval_df: DataFrame, *,
                  text_col: str = "text", id_col: str = "doc_id",
                  k: int = 20, min_hits: int = 1,
                  broadcast_eval: bool = True) -> DataFrame:
    """Drop every training document sharing ≥ ``min_hits`` distinct
    ``k``-grams with the eval set; returns the surviving train rows with
    their original schema.  ``min_hits > 1`` tolerates incidental single
    collisions (common short boilerplate) while still catching quoted
    benchmark items."""
    bad = (contamination_report(train, eval_df, text_col=text_col,
                                id_col=id_col, k=k,
                                broadcast_eval=broadcast_eval)
           .where(F.col("n_hits") >= min_hits)
           .select(id_col))
    return train.join(bad, id_col, "left_anti")
