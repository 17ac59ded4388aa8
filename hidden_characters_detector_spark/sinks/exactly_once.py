"""Exactly-once sink without Iceberg jars: idempotent foreachBatch parquet.

The reference's sink is a temp file + atomic ``os.replace`` + confirm
(``/root/reference/hidden-characters-detector.py:720-757, :911-923``) — a
single-node exactly-once commit.  The engine-scale equivalent is an Iceberg
``writeStream`` (snapshot commits); this sandbox has no Iceberg jars
(SURVEY.md §4.2, :func:`iceberg_sink` below records the recipe), so this
module provides the documented fallback with the same contract:

* every micro-batch writes to its own ``batch_id=N`` partition directory
  with ``mode=overwrite`` — re-running a batch after a crash/restart
  *replaces* its partition instead of duplicating it (idempotent);
* the write carries per-partition lineage columns; a JSON manifest per batch
  records row counts for audit (S11 report-file analog).  The count comes
  from the *written files' parquet footers* — zero recompute of the batch
  (a ``batch_df.count()`` here would re-run the whole upstream clean);
* Structured Streaming's checkpoint WAL guarantees each batch id is
  replayed with identical content, so overwrite-by-batch-id == exactly-once.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def parquet_dir_rows(path: str) -> int:
    """Row count of a parquet directory from file footers only (no job).

    Footer metadata is exact for committed files; at cluster scale the same
    numbers come from the Iceberg snapshot summary instead.
    """
    import pyarrow.parquet as pq

    total = 0
    for f in os.listdir(path):
        if f.endswith(".parquet") and not f.startswith("_"):
            total += pq.read_metadata(os.path.join(path, f)).num_rows
    return total


def write_batch_partition(batch_df: DataFrame, batch_id: int,
                          out_dir: str) -> int:
    """Write one micro-batch to its idempotent ``batch_id=N`` partition.

    Returns the committed row count (footer metadata, not a recompute) and
    drops an atomic JSON manifest next to the partition.
    """
    out = (batch_df
           .withColumn("batch_id", F.lit(batch_id))
           .withColumn("sink_partition_id", F.spark_partition_id()))
    path = os.path.join(out_dir, f"batch_id={batch_id}")
    out.write.mode("overwrite").parquet(path)
    n = parquet_dir_rows(path)
    manifest = os.path.join(out_dir, f"_manifest_batch_{batch_id}.json")
    tmp = manifest + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"batch_id": batch_id, "rows": n}, f)
    os.replace(tmp, manifest)  # atomic, like the reference's commit
    return n


def exactly_once_parquet_sink(df: DataFrame, out_dir: str,
                              checkpoint_dir: str, *,
                              trigger_available_now: bool = True,
                              query_name: str = "hcd-sink") -> StreamingQuery:
    """Start a writeStream with the idempotent overwrite-by-batch-id sink."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        write_batch_partition(batch_df, batch_id, out_dir)

    writer = (df.writeStream.foreachBatch(write_batch)
              .queryName(query_name)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _batch_dirs(out_dir: str) -> list[str]:
    if not os.path.isdir(out_dir):
        return []
    return sorted(d for d in os.listdir(out_dir)
                  if d.startswith("batch_id=")
                  and os.path.isdir(os.path.join(out_dir, d)))


def read_sink(spark, out_dir: str) -> DataFrame:
    """Read committed sink output back (S10 cleaned-readback analog).

    After :func:`compact_sink` has run, reads the compacted generation
    directory plus any batch partitions newer than the compaction point.
    """
    comp_meta = os.path.join(out_dir, "_compaction.json")
    if os.path.exists(comp_meta):
        with open(comp_meta) as f:
            meta = json.load(f)
        df = spark.read.parquet(os.path.join(out_dir, meta["dir"]))
        live = [d for d in _batch_dirs(out_dir)
                if int(d.split("=", 1)[1]) > meta["up_to"]]
        if live:
            newer = spark.read.option("basePath", out_dir).parquet(
                *[os.path.join(out_dir, d) for d in live])
            df = df.unionByName(newer)
        return df
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "batch_id=*"))


def compact_sink(spark, out_dir: str, *,
                 target_rows_per_file: int = 1_000_000) -> dict:
    """Compact the per-batch sink directories (small-files maintenance).

    A streaming sink that commits one directory per micro-batch accumulates
    many small files — the classic small-files problem that degrades scan
    parallelism and NameNode/listing pressure at scale.  This rewrites all
    committed ``batch_id=N`` partitions into one bin-packed generation
    directory, then atomically publishes it:

    1. read every committed batch partition (footer-exact row count);
    2. rewrite into ``ceil(rows / target_rows_per_file)`` files under a
       temp dir, carrying ``batch_id`` as a data column (lineage kept);
    3. ``os.replace`` the temp dir to ``gen-<up_to>`` and atomically write
       ``_compaction.json`` (the publish point — readers switch over in
       one rename, like the reference's temp-file commit);
    4. delete the superseded batch directories and their manifests.

    Batches newer than the compaction point keep arriving as ``batch_id=N``
    dirs and are unioned by :func:`read_sink`; the streaming query itself
    never replays a batch at or below a committed compaction point (the
    checkpoint WAL is ahead of it), so overwrite-by-batch-id semantics are
    unaffected.  (With Iceberg jars this whole function is
    ``rewrite_data_files``.)  Returns {"up_to", "rows", "files"}.
    """
    import math
    import shutil

    dirs = _batch_dirs(out_dir)
    comp_meta = os.path.join(out_dir, "_compaction.json")
    prev = None
    if os.path.exists(comp_meta):
        with open(comp_meta) as f:
            prev = json.load(f)
        dirs = [d for d in dirs if int(d.split("=", 1)[1]) > prev["up_to"]]
    if not dirs and prev is None:
        return {"up_to": -1, "rows": 0, "files": 0}
    up_to = max((int(d.split("=", 1)[1]) for d in dirs),
                default=prev["up_to"] if prev else -1)

    df = None
    if dirs:
        df = spark.read.option("basePath", out_dir).parquet(
            *[os.path.join(out_dir, d) for d in dirs])
    if prev is not None:
        old_gen = spark.read.parquet(os.path.join(out_dir, prev["dir"]))
        df = old_gen if df is None else df.unionByName(old_gen)
    rows = sum(parquet_dir_rows(os.path.join(out_dir, d)) for d in dirs)
    if prev is not None:
        rows += prev["rows"]
    n_files = max(1, math.ceil(rows / target_rows_per_file))
    tmp = os.path.join(out_dir, "_compact_tmp")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    gen_name = f"gen-{up_to}"
    gen_dir = os.path.join(out_dir, gen_name)
    if os.path.exists(gen_dir):
        shutil.rmtree(gen_dir)
    os.replace(tmp, gen_dir)
    meta_tmp = comp_meta + ".tmp"
    with open(meta_tmp, "w") as f:
        json.dump({"up_to": up_to, "dir": gen_name, "rows": rows}, f)
    os.replace(meta_tmp, comp_meta)  # the atomic publish point
    # garbage-collect superseded inputs (crash before this point only
    # leaves extra files; readers already switched at the publish)
    for d in dirs:
        shutil.rmtree(os.path.join(out_dir, d))
        manifest = os.path.join(out_dir,
                                f"_manifest_batch_{d.split('=', 1)[1]}.json")
        if os.path.exists(manifest):
            os.remove(manifest)
    if prev is not None and prev["dir"] != gen_name:
        shutil.rmtree(os.path.join(out_dir, prev["dir"]), ignore_errors=True)
    n_out = len([f for f in os.listdir(gen_dir) if f.endswith(".parquet")])
    return {"up_to": up_to, "rows": rows, "files": n_out}


ICEBERG_PACKAGE = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0"


def iceberg_sink(df: DataFrame, table: str, checkpoint_dir: str, *,
                 trigger_available_now: bool = True,
                 query_name: str = "hcd-iceberg-sink") -> StreamingQuery:
    """The at-scale exactly-once sink: Iceberg streaming append.

    Recipe (requires network / pre-staged jars — NOT available in this
    sandbox, where the import check below fails and we raise a clear error):

        spark-submit --packages {ICEBERG_PACKAGE} \\
          --conf spark.sql.extensions=org.apache.iceberg.spark.extensions\\
.IcebergSparkSessionExtensions \\
          --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \\
          --conf spark.sql.catalog.lake.type=hadoop \\
          --conf spark.sql.catalog.lake.warehouse=/path/to/warehouse \\
          scripts/run_pipeline.py --sink iceberg --output lake.db.cleaned ...

    Iceberg's snapshot commit gives atomic exactly-once appends (each
    micro-batch == one snapshot, replays deduplicated via the snapshot's
    WAL'd batch id), replacing the overwrite-by-batch-id fallback above.
    """
    spark = df.sparkSession
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
    except Exception as e:  # noqa: BLE001 - any JVM lookup failure
        raise RuntimeError(
            "Iceberg runtime jars are not on the Spark classpath; launch "
            f"with --packages {ICEBERG_PACKAGE} (see iceberg_sink docstring)."
            " Falling back to exactly_once_parquet_sink is the documented "
            "sandbox behavior (SURVEY.md §4.2).") from e
    writer = (df.writeStream.format("iceberg").outputMode("append")
              .queryName(query_name)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.toTable(table)
