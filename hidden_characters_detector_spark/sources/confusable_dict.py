"""Slowly-updating confusable-dictionary stream (north_star join dimension).

The reference's static module-level dicts (``TYPOGRAPHIC_REPLACEMENTS``,
``/root/reference/hidden-characters-detector.py:255-406``) become a stream of
rows ``(marker_cp, replacement, marker_type, valid_from)`` whose
``valid_from`` is staggered across batches, exercising the stateful
stream-stream join (SURVEY.md §2.3).  Deterministic: batch membership is
``marker_cp % n_batches``.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession

from .. import markers

DICT_SCHEMA = ("marker_cp int, replacement array<int>, marker_type string, "
               "valid_from timestamp")


def base_rules() -> list[tuple[int, list[int], str]]:
    """Every dictionary rule as (marker_cp, replacement, marker_type):
    hidden removals, live typographic replacements, and the IVS range
    endpoints (ref tables :255-406)."""
    rules: list[tuple[int, list[int], str]] = []
    for cp in sorted(markers.HIDDEN_CODEPOINTS):
        rules.append((cp, [], "Hidden"))
    for cp, out in sorted(markers.LIVE_REPLACEMENTS.items()):
        rules.append((cp, list(out), "Typographic"))
    for cp in (markers.IVS_LO, markers.IVS_HI):
        rules.append((cp, [], "IdeographicVS"))
    return rules


def dict_rows(base_ts: dt.datetime, n_batches: int = 3,
              stagger: dt.timedelta = dt.timedelta(minutes=5)
              ) -> list[list[tuple]]:
    """All marker rules, split into ``n_batches`` staggered update batches."""
    batches: list[list[tuple]] = [[] for _ in range(n_batches)]
    for cp, repl, mt in base_rules():
        b = cp % n_batches
        batches[b].append((cp, repl, mt, base_ts + b * stagger))
    return batches


def write_dict_batches(spark: SparkSession, out_dir: str,
                       base_ts: dt.datetime, n_batches: int = 3) -> None:
    """Materialize the staggered batches as separate stream-source files
    (plain files, not subdirs — the file stream source does not recurse)."""
    os.makedirs(out_dir, exist_ok=True)
    for i, rows in enumerate(dict_rows(base_ts, n_batches)):
        df = spark.createDataFrame(rows, DICT_SCHEMA).coalesce(1)
        stage = os.path.join(out_dir, f"__stage_{i}")
        df.write.mode("overwrite").parquet(stage)
        part = next(f for f in os.listdir(stage)
                    if f.endswith(".parquet") and not f.startswith("_"))
        os.replace(os.path.join(stage, part),
                   os.path.join(out_dir, f"dict_batch_{i}.parquet"))


def read_dict_stream(spark: SparkSession, path: str) -> DataFrame:
    return (spark.readStream.schema(DICT_SCHEMA).format("parquet")
            .option("maxFilesPerTrigger", 1).load(path))


def static_dict(spark: SparkSession, base_ts: dt.datetime) -> DataFrame:
    """Batch-mode dictionary (for broadcast-join parity tests)."""
    rows = [r for b in dict_rows(base_ts) for r in b]
    return spark.createDataFrame(rows, DICT_SCHEMA)


def versioned_offsets(cp: int) -> list[tuple[int, int]]:
    """(version, valid_from minute-offset) per rule — the slowly-changing
    dimension schedule shared verbatim with the DuckDB oracle:

    * version 0: retired 2 h before base — with a 1 h validity its window
      closed 1 h before any event, so it must NEVER match (exercises the
      interval join's upper bound);
    * version 1: live from base + (cp % 3) * 5 min (per-rule stagger);
    * version 2: the mid-stream update, 15 min after version 1 — events in
      the first 15 min of a rule's life match ONLY version 1, later events
      match both in-validity versions (an interval join, not a dedup).
    """
    v1 = (cp % 3) * 5
    return [(0, -120), (1, v1), (2, v1 + 15)]


def repl_str(repl: list[int], version: int) -> str:
    """The version-tagged payload string carried through the dict joins:
    replacement codepoints comma-joined + ``#vN``.  ONE definition — the
    Spark dict builder and the oracle's VALUES literal both call this, so
    the payload format cannot drift between engine and oracle."""
    return ",".join(str(c) for c in repl) + f"#v{version}"


def versioned_dict(spark: SparkSession,
                   base_iso: str = "2024-01-01 00:00:00") -> DataFrame:
    """Batch versioned dictionary: every rule at three ``valid_from``
    versions (:func:`versioned_offsets`), with ``repl_str`` — the
    replacement codepoints comma-joined plus a ``#vN`` tag — as the
    hash-comparable payload proving which version an event joined to.
    ``valid_from`` is derived IN SQL from the base literal so the session
    timezone governs it end-to-end (a Python ``datetime`` would take
    PySpark's OS-local conversion path and skew the join on non-UTC
    hosts)."""
    from pyspark.sql import functions as F

    rows = []
    for cp, repl, mt in base_rules():
        for v, off in versioned_offsets(cp):
            rows.append((cp, repl, repl_str(repl, v), mt, off, v))
    df = spark.createDataFrame(
        rows, "marker_cp int, replacement array<int>, repl_str string, "
              "marker_type string, off_min int, version int")
    return df.withColumn(
        "valid_from",
        F.expr(f"timestamp'{base_iso}' "
               "+ make_interval(0, 0, 0, 0, 0, off_min, 0)")).drop("off_min")
