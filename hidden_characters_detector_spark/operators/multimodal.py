"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side contracts — schema, partitioning, Arrow batch shape, UDF
signatures — are real and tested; the actual codec work is STUBBED because
this container ships no image/audio libraries: ``decode_images`` /
``resample_audio`` raise ``NotImplementedError`` unless
``deterministic_fake=True``, in which case a seeded, content-hash-derived
fake is produced (stable across partitionings, so tests and downstream
plumbing behave exactly as they would with a real codec).

Schema conventions:

* ``media: binary`` — the opaque payload;
* ``media_meta: struct<kind string, width int, height int, sample_rate int,
  n_frames int>`` — typed metadata travelling with the payload;
* feature columns are fixed-size float arrays (Arrow FixedSizeList) so
  downstream ANN/similarity operators apply unchanged.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_DDL = ("media_meta struct<kind:string, width:int, height:int, "
                  "sample_rate:int, n_frames:int>")


def attach_fake_media(df: DataFrame, id_col: str = "doc_id", *,
                      kind: str = "image", seed: int = 42) -> DataFrame:
    """Test fixture: deterministic binary payload + metadata per row
    (payload bytes derive from xxhash64(id), so any partitioning yields the
    same table)."""
    h = F.xxhash64(F.concat(F.col(id_col).cast("string"), F.lit(str(seed))))
    payload = F.sha2(h.cast("string"), 256).cast("binary")
    meta = F.struct(
        F.lit(kind).alias("kind"),
        (F.pmod(h, F.lit(512)) + 32).cast("int").alias("width"),
        (F.pmod(h, F.lit(256)) + 32).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.pmod(h, F.lit(240)) + 1).cast("int").alias("n_frames"))
    return df.withColumn("media", payload).withColumn("media_meta", meta)


def decode_images(df: DataFrame, *, out_dim: int = 8,
                  deterministic_fake: bool = False,
                  media_col: str = "media") -> DataFrame:
    """binary image -> feature vector ``img_features: array<float>``.

    Real implementation would decode via PIL/opencv inside the Arrow batch;
    the container has neither, so only the deterministic fake path runs
    (features = seeded hash of payload bytes, unit-normalized).
    """
    keep = [f.name for f in df.schema.fields]
    ddl = ", ".join([f"{f.name} {f.dataType.simpleString()}"
                     for f in df.schema.fields]
                    + ["img_features array<float>"])

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            blobs = batch.column(media_col).to_pylist()
            if not deterministic_fake:
                raise NotImplementedError(
                    "image codec not available in this container; pass "
                    "deterministic_fake=True for the plumbing path")
            feats = np.zeros((len(blobs), out_dim), dtype=np.float32)
            for i, b in enumerate(blobs):
                if b is None:
                    continue
                seed = int.from_bytes(bytes(b)[:8] or b"\0", "little")
                v = np.random.default_rng(seed).standard_normal(out_dim)
                feats[i] = (v / (np.linalg.norm(v) or 1.0)).astype(np.float32)
            fl = pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), type=pa.float32()), out_dim
            ).cast(pa.list_(pa.float32()))
            yield pa.RecordBatch.from_arrays(
                [batch.column(c) for c in keep] + [fl],
                names=keep + ["img_features"])

    return df.mapInArrow(run, ddl)


def sample_frames(df: DataFrame, *, every_n: int = 24,
                  media_col: str = "media") -> DataFrame:
    """video -> exploded frame index rows (frame decode itself stubbed).

    The *sampling plan* is real Spark: frame indices come from the metadata,
    so the fan-out, partitioning, and row explosion are exercised without a
    codec.  Downstream ``decode_images`` consumes the per-frame rows.
    """
    idxs = F.sequence(
        F.lit(0), F.greatest(F.col("media_meta.n_frames") - 1, F.lit(0)),
        F.lit(every_n))
    return (df.withColumn("frame_idx", F.explode(idxs))
            .withColumn("frame_ref",
                        F.concat_ws(":", F.xxhash64(media_col).cast("string"),
                                    F.col("frame_idx").cast("string"))))


def resample_audio(df: DataFrame, *, target_rate: int = 16000,
                   deterministic_fake: bool = False,
                   media_col: str = "media") -> DataFrame:
    """binary audio -> ``audio_features: array<float>`` (stubbed codec)."""
    if not deterministic_fake:
        raise NotImplementedError(
            "audio codec not available in this container; pass "
            "deterministic_fake=True for the plumbing path")
    return decode_images(df, out_dim=4, deterministic_fake=True,
                         media_col=media_col) \
        .withColumnRenamed("img_features", "audio_features") \
        .withColumn("resampled_rate", F.lit(target_rate))
