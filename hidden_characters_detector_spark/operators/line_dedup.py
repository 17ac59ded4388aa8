"""Cross-document line/paragraph deduplication (C4/RefinedWeb-style).

The single most common curation transform over a web-scale corpus: a line
that repeats across ``min_docs`` or more DISTINCT documents is boilerplate
(navigation chrome, cookie banners, template headers/footers, license
blurbs) and is dropped from every document that carries it.  This is
sub-document dedup — the whole-document operators (``dedup.exact_dedup``,
``minhash_lsh_pairs``, ...) cannot express it.  Reference seed: the
per-line processing model of the reference detector
(``/root/reference/hidden-characters-detector.py:740-746``); the transform
itself follows the C4 (Raffel et al., JMLR 2020 §2.2) and RefinedWeb
(Penedo et al., 2023) line-dedup recipes.

Scale shape (100 TB framing) — everything is JVM codegen, no Python:

* **explode** (``split`` + ``posexplode``) is a stateless projection — no
  shuffle;
* **frequency counting** shuffles ONLY ``(line_hash: long, doc_id)`` pairs
  — the 8-byte ``xxhash64`` of the normalized line rides the exchange, not
  the line text — with map-side partial aggregation at both stages (the
  pair-distinct and the per-hash count), so repeated boilerplate collapses
  to one row per map partition before it ever ships;
* the **frequent set** (hashes seen in ≥ ``min_docs`` docs) is small by
  construction — boilerplate cardinality, not corpus cardinality — and is
  broadcast to the anti-side, so the big exploded side never shuffles for
  the membership probe;
* **rebuild** folds kept lines back per document: one shuffle on
  ``doc_id`` carrying the kept text.  This is the honest unavoidable cost
  of re-assembly; input bucketed/partitioned by ``doc_id`` makes it a
  local fold.

Hash-grouping note: counting groups 64-bit ``xxhash64(normalized line)``
values, not the strings.  A collision merges two distinct lines' doc
counts; at 10^12 lines the expected number of colliding PAIRS is ~10^4 —
and a false merge matters only when it pushes a count across ``min_docs``,
so the impact is a vanishingly rare extra-dropped line, the standard
trade every hash-keyed dedup at this scale makes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _exploded_lines(df: DataFrame, text_col: str, id_col: str,
                    min_chars: int, sep_pattern: str = "\n") -> DataFrame:
    """One row per (doc, line): ``line_no`` (0-based), verbatim ``line``,
    and ``line_hash`` — xxhash64 of the TRIMMED line, NULL for exempt
    lines (trimmed length < ``min_chars``), which therefore never match
    the frequent set and are never counted or dropped."""
    # NULL text behaves as the empty document: split(NULL) is NULL and
    # posexplode of NULL emits ZERO rows, which would silently delete the
    # document from the rebuilt corpus — coalesce keeps the membership
    # contract (the doc survives with one empty, exempt line)
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")),
                             sep_pattern))
        .alias("line_no", "line"))
    norm = F.trim(F.col("line"))
    return lines.withColumn(
        "line_hash",
        F.when(F.length(norm) >= min_chars, F.xxhash64(norm)))


def dedup_lines_within(df: DataFrame, text_col: str = "text", *,
                       min_chars: int = 1, sep_pattern: str = "\n",
                       join_sep: str = "\n") -> DataFrame:
    """WITHIN-document duplicate-line removal: keep each normalized line's
    FIRST occurrence inside a document, drop later repeats (the intra-doc
    complement of :func:`dedup_lines` — a page whose nav menu repeats ten
    times keeps one copy even if no other document shares it).  Lines
    with trimmed length < ``min_chars`` are exempt (blank separators are
    structure).

    Pure per-row JVM higher-order functions — zero shuffle, zero Python,
    partitioning-trivial.  The first-occurrence probe is
    ``array_position`` per line, i.e. O(L²) in a document's LINE count:
    bounded and cheap for real documents (hundreds of lines → ~10⁴
    comparisons); for pathological million-line documents route through
    the exploded/regroup machinery of :func:`dedup_lines` instead.

    ``sep_pattern`` is a REGEX (what ``F.split`` takes) and ``join_sep``
    the literal rebuild separator — the same split the sibling
    :func:`dedup_lines` makes, so a regex separator can't silently be
    re-inserted verbatim between rebuilt lines.

    Adds ``text_dedup`` (rebuilt, original order/whitespace), ``n_lines``
    and ``n_lines_dropped``; other columns pass through.
    """
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), sep_pattern)
    norms = F.transform(lines, lambda x: F.trim(x))
    kept = F.filter(
        lines,
        lambda x, i: (F.length(F.trim(x)) < min_chars)
        | (F.array_position(norms, F.trim(x)) == i + 1))
    return (df
            .withColumn("text_dedup", F.concat_ws(join_sep, kept))
            .withColumn("n_lines", F.size(lines).cast("long"))
            .withColumn("n_lines_dropped",
                        (F.size(lines) - F.size(kept)).cast("long")))


def frequent_lines(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", *, min_docs: int = 5,
                   min_chars: int = 1, sep_pattern: str = "\n",
                   with_sample: bool = False) -> DataFrame:
    """The boilerplate census: ``(line_hash, n_docs)`` for every normalized
    line occurring in ≥ ``min_docs`` distinct documents.

    Two-stage exact distinct count, both stages partial-aggregated: the
    (line_hash, doc_id) pair-distinct collapses a doc's repeated lines
    map-side, then the per-hash count shuffles one row per pair — only
    the 8-byte hash and the id ever ride an exchange, never the line
    text.  Exact (not ``approx_count_distinct``) because the output feeds
    a threshold filter where sketch error would drop/keep lines
    nondeterministically near the boundary — and the pair-distinct
    already bounds the shuffle.

    ``with_sample=True`` adds ``sample_line`` (lexicographic min of the
    matching verbatim lines) for auditing, via a SECOND pass that
    broadcasts the (tiny) frequent set against the exploded lines — the
    text stays out of the counting shuffle either way.
    """
    lines = _exploded_lines(df, text_col, id_col, min_chars, sep_pattern)
    pairs = (lines.where(F.col("line_hash").isNotNull())
             .select("line_hash", id_col).dropDuplicates())
    freq = (pairs.groupBy("line_hash")
            .agg(F.count("*").cast("long").alias("n_docs"))
            .where(F.col("n_docs") >= min_docs))
    if with_sample:
        freq = (lines.join(F.broadcast(freq), "line_hash")
                .groupBy("line_hash", "n_docs")
                .agg(F.min("line").alias("sample_line")))
    return freq


def dedup_lines(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", *, min_docs: int = 5,
                min_chars: int = 1, sep_pattern: str = "\n",
                join_sep: str = "\n",
                broadcast_frequent: bool = True) -> DataFrame:
    """Drop every line occurring in ≥ ``min_docs`` distinct documents and
    rebuild each document's text from the surviving lines (original order,
    original verbatim lines — normalization is for MATCHING only).

    Lines whose trimmed length is < ``min_chars`` are exempt (an empty
    line "repeats" everywhere but is structure, not boilerplate).

    PARAGRAPH mode (the RefinedWeb/Dolma variant of the same transform):
    pass ``sep_pattern=r"\\n{2,}"`` and ``join_sep="\\n\\n"`` — units
    become blank-line-separated paragraphs, and runs of 3+ newlines are
    normalized to exactly one blank separator on rebuild (the standard
    lossy-but-intended behavior of paragraph dedup).

    Output: one row per input document —
    ``(id_col, text_dedup, n_lines, n_lines_kept, n_lines_dropped)``.
    A document whose every line is boilerplate survives with
    ``text_dedup = ''`` (dropping the row would silently change corpus
    membership; leave that decision to a downstream filter).

    ``broadcast_frequent`` (default) broadcasts the frequent-hash set —
    boilerplate cardinality is tiny next to the corpus; pass ``False``
    only if the threshold is so low the frequent set rivals executor
    memory, in which case the membership probe becomes a shuffle join.
    """
    lines = _exploded_lines(df, text_col, id_col, min_chars, sep_pattern)
    freq = (frequent_lines(df, text_col, id_col, min_docs=min_docs,
                           min_chars=min_chars, sep_pattern=sep_pattern)
            .select("line_hash", F.lit(True).alias("_drop")))
    if broadcast_frequent:
        freq = F.broadcast(freq)
    flagged = lines.join(freq, "line_hash", "left")
    kept_struct = F.when(F.col("_drop").isNull(),
                         F.struct("line_no", "line"))
    return (flagged.groupBy(id_col)
            .agg(
                # collect_list skips NULLs (the dropped lines); struct sort
                # orders by line_no first, restoring document order
                F.concat_ws(join_sep, F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["line"])).alias("text_dedup"),
                F.count("*").cast("long").alias("n_lines"),
                F.sum(F.col("_drop").isNull().cast("long"))
                .alias("n_lines_kept"),
                F.sum(F.col("_drop").isNotNull().cast("long"))
                .alias("n_lines_dropped")))
