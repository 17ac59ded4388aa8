"""Batch sources: directory scans with pruning/glob (SURVEY.md §2.1 S1-S4).

The reference walks directories with ignore-dir pruning and glob filters
(``find_files_to_process``, ``/root/reference/hidden-characters-detector.py:824-878``);
Spark's file sources give the same semantics declaratively — recursive
lookup, path-glob filters, and partition pruning are planner-native, so the
"scan" is just reader options.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_corpus(spark: SparkSession, path: str, *, fmt: str = "parquet",
                glob: str | None = None, recursive: bool = False,
                schema: str | None = None) -> DataFrame:
    """Directory/file scan (S1/S4), recursive walk (S2, ref :863-867),
    and file-pattern filter (S3, ref :838-842) as reader options."""
    reader = spark.read.format(fmt)
    if schema:
        reader = reader.schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def with_lineage(df: DataFrame) -> DataFrame:
    """Per-partition/file lineage columns (north_rule: per-partition
    lineage): input file + partition id travel with every row."""
    from pyspark.sql import functions as F

    return (df.withColumn("_input_file", F.input_file_name())
            .withColumn("_partition_id", F.spark_partition_id()))
