"""Bad-records quarantine for the typed token source.

The engine-scale analog of the reference's unreadable-input handling: the
reference sniffs binary files and skips decode failures, counting them in
ScanStats instead of failing the scan
(``/root/reference/hidden-characters-detector.py:604-631``).  A typed
parquet/Iceberg source cannot contain undecodable bytes, but at 100 TB it
WILL contain schema-valid-yet-semantically-null rows — null/empty
``doc_id``, null ``tokens``, null ``event_time``, or an ``n_tok`` that
contradicts the array.  Failing the job on them is wrong (one bad upstream
writer poisons a petabyte backfill) and silently cleaning them is worse
(the row count delta is unexplained); the pipeline routes them to a
quarantine sink with a reason column and a telemetry count.

Everything here is a pure codegen projection (``CASE WHEN`` chains) — no
shuffle, no Python, partitioning-independent — so the validity gate costs
one pass over columns the scan already reads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUARANTINE_REASON_COL = "quarantine_reason"


def quarantine_reason(*, id_col: str = "doc_id",
                      tokens_col: str | None = "tokens",
                      time_col: str | None = "event_time",
                      n_tok_col: str | None = "n_tok") -> Column:
    """NULL for a valid row, else the FIRST failed rule (rule order is part
    of the contract — the DuckDB oracle mirrors the same CASE chain):

    1. ``null_doc_id``   — id null or empty (joins/dedup/lineage all key
       on it);
    2. ``null_tokens``   — tokens column null (empty array is a VALID empty
       document; null means the writer lost the payload);
    3. ``null_event_time`` — event-time null (watermarks/windows undefined);
    4. ``null_n_tok``      — declared length null (the ``!=`` comparison of
       rule 5 would evaluate to NULL and silently pass a row whose declared
       length was lost — the same semantically-null family the gate exists
       to catch, so it gets an explicit arm);
    5. ``n_tok_mismatch``  — declared length contradicts the array (payload
       corruption signal).

    Pass ``None`` for a column that the table doesn't carry to skip its
    rule.
    """
    c = F.when(F.col(id_col).isNull()
               | (F.col(id_col).cast("string") == ""),
               F.lit("null_doc_id"))
    if tokens_col is not None:
        c = c.when(F.col(tokens_col).isNull(), F.lit("null_tokens"))
    if time_col is not None:
        c = c.when(F.col(time_col).isNull(), F.lit("null_event_time"))
    if n_tok_col is not None and tokens_col is not None:
        c = c.when(F.col(n_tok_col).isNull(), F.lit("null_n_tok"))
        c = c.when(F.col(n_tok_col) != F.size(tokens_col),
                   F.lit("n_tok_mismatch"))
    return c


def with_quarantine_reason(df: DataFrame, **rule_cols) -> DataFrame:
    """Append :data:`QUARANTINE_REASON_COL` (NULL = valid)."""
    return df.withColumn(QUARANTINE_REASON_COL,
                         quarantine_reason(**rule_cols))


def split_quarantine(df: DataFrame, **rule_cols
                     ) -> tuple[DataFrame, DataFrame]:
    """(good, bad): good drops the reason column (schema unchanged for the
    downstream pipeline); bad keeps every original column plus the reason,
    preserving the record verbatim for reprocessing."""
    marked = with_quarantine_reason(df, **rule_cols)
    reason = F.col(QUARANTINE_REASON_COL)
    return (marked.where(reason.isNull()).drop(QUARANTINE_REASON_COL),
            marked.where(reason.isNotNull()))
