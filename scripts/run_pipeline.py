#!/usr/bin/env python3
"""spark-submit entry point for the streaming CEP pipeline (north_rule).

Usage (cluster):

    zip -r hcd_spark.zip hidden_characters_detector_spark
    spark-submit --py-files hcd_spark.zip scripts/run_pipeline.py \
        --input /path/to/token_stream --output /path/to/sink \
        --checkpoint /path/to/ck --metrics /path/to/metrics.jsonl

Runs both branches of the pipeline (cleaned-sequence exactly-once sink +
windowed detection aggregates), resumable from checkpoint.  In the sandbox
it is exercised against a staged file stream; on a real cluster the input
is the Iceberg token table and the sink is an Iceberg append
(``--format iceberg`` once the runtime jars are on the classpath).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(256 << 20))
os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--metrics", default=None)
    ap.add_argument("--master", default=None,
                    help="override master (default: from spark-submit)")
    ap.add_argument("--available-now", action="store_true", default=True)
    ap.add_argument("--watermark", default="10 minutes")
    ap.add_argument("--window", default="1 minute")
    ap.add_argument("--salt", type=int, default=16)
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    b = (SparkSession.builder.appName("hcd-spark-pipeline")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.python.worker.reuse", "true")
         .config("spark.sql.shuffle.partitions",
                 os.environ.get("SPARK_GRAFT_SHUFFLE", "64")))
    if args.master:
        b = b.master(args.master)
    spark = b.getOrCreate()

    from hidden_characters_detector_spark.sinks.exactly_once import (
        exactly_once_parquet_sink)
    from hidden_characters_detector_spark.streaming import pipeline
    from hidden_characters_detector_spark.streaming.metrics import (
        ProgressRecorder)

    rec = ProgressRecorder(args.metrics)
    spark.streams.addListener(rec)

    tok = pipeline.read_token_stream(
        spark, args.input, max_files_per_trigger=args.max_files_per_trigger)
    cleaned = pipeline.clean_stream(tok)
    q_sink = exactly_once_parquet_sink(
        cleaned, os.path.join(args.output, "cleaned"),
        os.path.join(args.checkpoint, "sink"), query_name="cleaned-sink")

    ev = pipeline.event_stream(pipeline.read_token_stream(
        spark, args.input, max_files_per_trigger=args.max_files_per_trigger))
    dens = pipeline.salted_density_windows(
        ev, watermark=args.watermark, window=args.window, salt=args.salt)
    def write_density(df, bid: int) -> None:
        # idempotent overwrite-by-batch-id, same contract as the main sink
        df.write.mode("overwrite").parquet(
            os.path.join(args.output, f"density/batch_id={bid}"))

    q_dens = (dens.writeStream.foreachBatch(write_density)
              .queryName("density-windows")
              .option("checkpointLocation",
                      os.path.join(args.checkpoint, "dens"))
              .trigger(availableNow=True).start())

    q_sink.awaitTermination()
    q_dens.awaitTermination()
    n = rec.total_input_rows("cleaned-sink")
    dur = sum(p.get("batchDuration", 0) for p in rec.progress
              if p.get("name") == "cleaned-sink") / 1000.0
    print(f"PIPELINE DONE rows={n} wall_batch_s={dur:.2f} "
          f"rows_per_sec={n / dur if dur else 0:.0f} "
          f"late_dropped={rec.rows_dropped_by_watermark()}")
    spark.stop()


if __name__ == "__main__":
    main()
