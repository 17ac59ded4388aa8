#!/usr/bin/env python3
"""spark-submit entry point for the streaming CEP pipeline (north_rule).

Usage (cluster):

    zip -r hcd_spark.zip hidden_characters_detector_spark
    spark-submit --py-files hcd_spark.zip scripts/run_pipeline.py \
        --input /path/to/token_stream --output /path/to/sink \
        --checkpoint /path/to/ck --metrics /path/to/metrics.jsonl

Runs the full pipeline as ONE streaming query (clean once per micro-batch →
exactly-once sink + counter-derived density partials; see
``streaming.pipeline.single_pass_pipeline``), resumable from checkpoint.  In
the sandbox it is exercised against a staged file stream; on a real cluster
the input is the Iceberg token table and ``--sink iceberg`` switches the
cleaned-sequence sink to Iceberg snapshot commits (requires the runtime
jars, see ``sinks.exactly_once.iceberg_sink`` for the --packages recipe).

Detection config mirrors the reference CLI (ref :969-1050): --exclude-char
(U+XXXX / hex / literal, repeatable), --word, --no-typographic, --no-ivs,
--detect-only.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(256 << 20))
os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")


def build_config(args):
    """argparse namespace -> DetectorConfig (ref from_args, :948-963)."""
    from hidden_characters_detector_spark.functions.kernel import (
        DetectorConfig, parse_excluded_chars)

    try:
        excluded = parse_excluded_chars(args.exclude_char or [])
    except ValueError as e:
        print(f"Error: {e}", file=sys.stderr)
        raise SystemExit(1) from e
    return DetectorConfig(
        clean=not args.detect_only,
        check_typographic=not args.no_typographic,
        check_ivs=not args.no_ivs,
        exclude_word_chars=args.word,
        excluded=excluded)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--metrics", default=None)
    ap.add_argument("--master", default=None,
                    help="override master (default: from spark-submit)")
    ap.add_argument("--available-now", default=True,
                    action=argparse.BooleanOptionalAction,
                    help="drain available input then stop (default); "
                         "--no-available-now runs continuously")
    ap.add_argument("--window", default="1 minute")
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument("--sink", choices=("parquet", "iceberg"),
                    default="parquet")
    ap.add_argument("--compact", action="store_true",
                    help="after the drain completes, compact the per-batch "
                         "sink dirs into one generation (small-files "
                         "maintenance; availableNow mode only)")
    ap.add_argument("--compact-target-rows", type=int, default=1_000_000)
    # detection config (reference CLI parity)
    ap.add_argument("--exclude-char", action="append", default=[],
                    metavar="CHAR", help="U+XXXX, bare hex, or literal char "
                    "to exclude from detection (repeatable)")
    ap.add_argument("--word", action="store_true",
                    help="also exclude MS-Word common chars")
    ap.add_argument("--no-typographic", action="store_true")
    ap.add_argument("--no-ivs", action="store_true")
    ap.add_argument("--detect-only", action="store_true",
                    help="report markers without cleaning (ref --clean off)")
    args = ap.parse_args()
    cfg = build_config(args)

    from pyspark.sql import SparkSession

    b = (SparkSession.builder.appName("hcd-spark-pipeline")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.python.worker.reuse", "true")
         .config("spark.sql.shuffle.partitions",
                 os.environ.get("SPARK_GRAFT_SHUFFLE", "64")))
    if args.master:
        b = b.master(args.master)
    spark = b.getOrCreate()

    from hidden_characters_detector_spark.streaming import pipeline
    from hidden_characters_detector_spark.streaming.metrics import (
        ProgressRecorder)

    rec = ProgressRecorder(args.metrics)
    spark.streams.addListener(rec)

    if args.sink == "iceberg":
        # surfaces a clear error + recipe when the jars are absent
        from hidden_characters_detector_spark.sinks.exactly_once import (
            iceberg_sink)
        tok = pipeline.read_token_stream(
            spark, args.input,
            max_files_per_trigger=args.max_files_per_trigger)
        q = iceberg_sink(pipeline.clean_stream(tok, cfg), args.output,
                         os.path.join(args.checkpoint, "sink"),
                         trigger_available_now=args.available_now,
                         query_name="cleaned-sink")
    else:
        q = pipeline.single_pass_pipeline(
            spark, args.input, args.output,
            os.path.join(args.checkpoint, "sink"), cfg=cfg,
            window=args.window,
            max_files_per_trigger=args.max_files_per_trigger,
            trigger_available_now=args.available_now,
            query_name="cleaned-sink")

    q.awaitTermination()
    if args.compact and args.sink == "parquet" and args.available_now:
        from hidden_characters_detector_spark.sinks.exactly_once import (
            compact_sink)
        info = compact_sink(spark, os.path.join(args.output, "cleaned"),
                            target_rows_per_file=args.compact_target_rows)
        print(f"COMPACTED up_to={info['up_to']} rows={info['rows']} "
              f"files={info['files']}")
    n = rec.total_input_rows("cleaned-sink")
    dur = sum(p.get("batchDuration", 0) for p in rec.progress
              if p.get("name") == "cleaned-sink") / 1000.0
    print(f"PIPELINE DONE rows={n} wall_batch_s={dur:.2f} "
          f"rows_per_sec={n / dur if dur else 0:.0f} "
          f"late_dropped={rec.rows_dropped_by_watermark()}")
    spark.stop()


if __name__ == "__main__":
    main()
