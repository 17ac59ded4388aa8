"""Deduplication operators for large-scale training-data pipelines.

Exact, MinHash+LSH, SimHash, and n-gram Jaccard near-dup detection over the
``documents`` corpus.  Scale notes (100 TB framing):

* exact dedup is a hash-groupBy — one shuffle on a 16-byte digest, with
  map-side distinct;
* MinHash signatures are computed vectorized per Arrow batch (numpy
  universal hashing over shingle hashes), then LSH *bands* are exploded and
  shuffled once on (band, bucket) — candidate pairs only ever meet inside a
  bucket, never via a cross join;
* SimHash reduces each doc to a 64-bit fingerprint; near-dup candidates are
  grouped by fingerprint bands (4x16-bit tables) — again no cross join;
* verification (true Jaccard) happens only on bucket-collision candidates.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_M61 = np.uint64((1 << 61) - 1)


def _shingle_hashes(texts: list[str], k: int = 5) -> list[np.ndarray]:
    """Per-doc arrays of 64-bit k-shingle hashes (character shingles).

    Rolling polynomial hash over codepoints, vectorized per doc via numpy
    stride tricks on the codepoint array.
    """
    out = []
    base = np.uint64(1099511628211)
    for t in texts:
        cps = np.frombuffer(t.encode("utf-32-le"), dtype="<u4").astype(
            np.uint64)
        if cps.size < k:
            out.append(np.zeros(0, dtype=np.uint64))
            continue
        n = cps.size - k + 1
        acc = np.zeros(n, dtype=np.uint64)
        for j in range(k):  # k is a small constant (5)
            acc = acc * base + cps[j:j + n]
        out.append(np.unique(acc))
    return out


def _minhash_sig(hashes: np.ndarray, a: np.ndarray, b: np.ndarray
                 ) -> np.ndarray:
    """num_perm minhash values via universal hashing ((a*x+b) mod p)."""
    if hashes.size == 0:
        return np.full(a.shape[0], np.iinfo(np.uint64).max, dtype=np.uint64)
    x = hashes[None, :]
    v = (a[:, None] * x + b[:, None]) % _M61
    return v.min(axis=1)


def minhash_signatures(df: DataFrame, text_col: str = "text", *,
                       num_perm: int = 64, shingle_k: int = 5,
                       seed: int = 42) -> DataFrame:
    """Add ``minhash: array<bigint>`` (num_perm values) per document."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_M61), num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_M61), num_perm, dtype=np.uint64)
    keep = [f.name for f in df.schema.fields]
    ddl = ", ".join([f"{f.name} {f.dataType.simpleString()}"
                     for f in df.schema.fields] + ["minhash array<bigint>"])

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            texts = batch.column(text_col).to_pylist()
            sigs = np.stack([
                _minhash_sig(h, a, b)
                for h in _shingle_hashes(texts, shingle_k)
            ]) if texts else np.zeros((0, num_perm), dtype=np.uint64)
            sig_arr = pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.astype(np.int64).ravel(), type=pa.int64()),
                num_perm).cast(pa.list_(pa.int64()))
            yield pa.RecordBatch.from_arrays(
                [batch.column(c) for c in keep] + [sig_arr],
                names=keep + ["minhash"])

    return df.mapInArrow(run, ddl)


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id", *,
                      num_perm: int = 64, bands: int = 16,
                      text_col: str = "text",
                      jaccard_threshold: float = 0.7,
                      seed: int = 42) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH + verification.

    rows per band per doc -> groupBy (band, band_hash) buckets -> pairs
    within buckets -> verified by estimated Jaccard (signature agreement).
    Returns (doc_a, doc_b, est_jaccard), doc_a < doc_b, deduplicated.
    """
    rows_per_band = num_perm // bands
    sig = minhash_signatures(df.select(id_col, text_col), text_col,
                             num_perm=num_perm, seed=seed)
    banded = sig.select(
        id_col, "minhash",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda i: F.hash(F.slice(
                "minhash", i * rows_per_band + 1, rows_per_band))
        )).alias("band", "band_hash"))
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (left.join(right,
                      (F.col("l.band") == F.col("r.band"))
                      & (F.col("l.band_hash") == F.col("r.band_hash"))
                      & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
            .select(F.col(f"l.{id_col}").alias("doc_a"),
                    F.col(f"r.{id_col}").alias("doc_b"),
                    F.col("l.minhash").alias("mh_a"),
                    F.col("r.minhash").alias("mh_b"))
            .dropDuplicates(["doc_a", "doc_b"]))
    est = (F.size(F.filter(F.zip_with("mh_a", "mh_b",
                                      lambda x, y: x == y),
                           lambda z: z))
           / F.lit(float(num_perm)))
    return (cand.withColumn("est_jaccard", est)
            .where(F.col("est_jaccard") >= jaccard_threshold)
            .select("doc_a", "doc_b",
                    F.round("est_jaccard", 4).alias("est_jaccard")))


def simhash_fingerprints(df: DataFrame, text_col: str = "text", *,
                         shingle_k: int = 4, seed: int = 42) -> DataFrame:
    """Add ``simhash: bigint`` — 64-bit weighted-majority fingerprint."""
    keep = [f.name for f in df.schema.fields]
    ddl = ", ".join([f"{f.name} {f.dataType.simpleString()}"
                     for f in df.schema.fields] + ["simhash bigint"])

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            texts = batch.column(text_col).to_pylist()
            fps = np.zeros(len(texts), dtype=np.uint64)
            for i, h in enumerate(_shingle_hashes(texts, shingle_k)):
                if h.size == 0:
                    continue
                bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                        & np.uint64(1))
                counts = bits.sum(axis=0)
                maj = (counts * 2 > h.size).astype(np.uint64)
                fps[i] = (maj << np.arange(64, dtype=np.uint64)).sum(
                    dtype=np.uint64)
            yield pa.RecordBatch.from_arrays(
                [batch.column(c) for c in keep]
                + [pa.array(fps.astype(np.int64), type=pa.int64())],
                names=keep + ["simhash"])

    return df.mapInArrow(run, ddl)


def simhash_near_dups(df: DataFrame, id_col: str = "doc_id", *,
                      text_col: str = "text", max_hamming: int = 3
                      ) -> DataFrame:
    """Candidate near-dup pairs by 16-bit simhash band collision, verified
    by Hamming distance (pigeonhole: ≤3 differing bits ⇒ ≥1 of 4 bands
    equal)."""
    fp = simhash_fingerprints(df.select(id_col, text_col),
                              text_col).select(id_col, "simhash")
    banded = fp.select(
        id_col, "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.shiftrightunsigned("simhash", 16 * i)
                     .bitwiseAND(F.lit(0xFFFF)).alias("key"))
            for i in range(4)])).alias("bk")
    ).select(id_col, "simhash", "bk.band", "bk.key")
    l, r = banded.alias("l"), banded.alias("r")
    pairs = (l.join(r, (F.col("l.band") == F.col("r.band"))
                    & (F.col("l.key") == F.col("r.key"))
                    & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
             .select(F.col(f"l.{id_col}").alias("doc_a"),
                     F.col(f"r.{id_col}").alias("doc_b"),
                     F.col("l.simhash").alias("sh_a"),
                     F.col("r.simhash").alias("sh_b"))
             .dropDuplicates(["doc_a", "doc_b"]))
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (pairs.withColumn("hamming", hamming)
            .where(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming"))


def exact_dedup(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Exact dedup via content digest: keep min-id doc per distinct text.

    Output: (doc_id, content_hash, group_size) for every *kept* doc.
    Shuffles once on the digest; Catalyst plans a partial/final agg.
    """
    h = F.md5(F.col(text_col).cast("binary")).alias("content_hash")
    w = Window.partitionBy("content_hash")
    return (df.select(id_col, h)
            .withColumn("group_size", F.count("*").over(w))
            .withColumn("_rk", F.row_number().over(
                w.orderBy(id_col)))
            .where(F.col("_rk") == 1)
            .select(id_col, "content_hash",
                    F.col("group_size").cast("long").alias("group_size")))


def ngram_jaccard(df_pairs: DataFrame, *, k: int = 5) -> DataFrame:
    """True Jaccard over k-shingle sets for candidate pairs
    (columns text_a, text_b appended -> jaccard double)."""
    keep = [f.name for f in df_pairs.schema.fields]
    ddl = ", ".join([f"{f.name} {f.dataType.simpleString()}"
                     for f in df_pairs.schema.fields] + ["jaccard double"])

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ha = _shingle_hashes(batch.column("text_a").to_pylist(), k)
            hb = _shingle_hashes(batch.column("text_b").to_pylist(), k)
            jac = np.array([
                (np.intersect1d(x, y).size / np.union1d(x, y).size)
                if x.size and y.size else 0.0
                for x, y in zip(ha, hb)])
            yield pa.RecordBatch.from_arrays(
                [batch.column(c) for c in keep]
                + [pa.array(jac, type=pa.float64())],
                names=keep + ["jaccard"])

    return df_pairs.mapInArrow(run, ddl)
