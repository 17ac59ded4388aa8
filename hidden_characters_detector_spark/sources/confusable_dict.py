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


def dict_rows(base_ts: dt.datetime, n_batches: int = 3,
              stagger: dt.timedelta = dt.timedelta(minutes=5)
              ) -> list[list[tuple]]:
    """All marker rules, split into ``n_batches`` staggered update batches."""
    rules: list[tuple[int, list[int], str]] = []
    for cp in sorted(markers.HIDDEN_CODEPOINTS):
        rules.append((cp, [], "Hidden"))
    for cp, out in sorted(markers.LIVE_REPLACEMENTS.items()):
        rules.append((cp, list(out), "Typographic"))
    for cp in (markers.IVS_LO, markers.IVS_HI):
        rules.append((cp, [], "IdeographicVS"))
    batches: list[list[tuple]] = [[] for _ in range(n_batches)]
    for cp, repl, mt in rules:
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
