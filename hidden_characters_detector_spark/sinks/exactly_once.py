"""Exactly-once sink without Iceberg jars: idempotent foreachBatch parquet.

The reference's sink is a temp file + atomic ``os.replace`` + confirm
(``/root/reference/hidden-characters-detector.py:720-757, :911-923``) — a
single-node exactly-once commit.  The engine-scale equivalent is an Iceberg
``writeStream`` (snapshot commits); this sandbox has no Iceberg jars
(SURVEY.md §4.2), so this module provides the documented fallback with the
same contract:

* every micro-batch writes to its own ``batch_id=N`` partition directory
  with ``mode=overwrite`` — re-running a batch after a crash/restart
  *replaces* its partition instead of duplicating it (idempotent);
* the write carries per-partition lineage columns; a JSON manifest per batch
  records row counts for audit (S11 report-file analog);
* Structured Streaming's checkpoint WAL guarantees each batch id is
  replayed with identical content, so overwrite-by-batch-id == exactly-once.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def exactly_once_parquet_sink(df: DataFrame, out_dir: str,
                              checkpoint_dir: str, *,
                              trigger_available_now: bool = True,
                              query_name: str = "hcd-sink") -> StreamingQuery:
    """Start a writeStream with the idempotent overwrite-by-batch-id sink."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = (batch_df
               .withColumn("batch_id", F.lit(batch_id))
               .withColumn("sink_partition_id", F.spark_partition_id()))
        path = os.path.join(out_dir, f"batch_id={batch_id}")
        out.write.mode("overwrite").parquet(path)
        n = batch_df.count()
        manifest = os.path.join(out_dir, f"_manifest_batch_{batch_id}.json")
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id, "rows": n}, f)
        os.replace(tmp, manifest)  # atomic, like the reference's commit

    writer = (df.writeStream.foreachBatch(write_batch)
              .queryName(query_name)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_sink(spark, out_dir: str) -> DataFrame:
    """Read committed sink output back (S10 cleaned-readback analog)."""
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "batch_id=*"))
