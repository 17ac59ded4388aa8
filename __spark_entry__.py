"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship pipeline; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 for the
driver's DuckDB cross-check at sf=0.01.

Marker-bearing inputs are derived from ``documents.text`` via a *portable
SQL* injection expression (``plans/oracle.marked_expr``) evaluated
identically by Spark and DuckDB, so both engines see byte-identical inputs;
the Spark side then runs the real engine (tokenize → Arrow kernel →
detokenize) while the oracle re-expresses the reference semantics in SQL.

Aggregate parity note: double sums are computed as ``sum(cast(. as
decimal))`` then cast back to double, so distributed vs serial summation
order cannot produce differing float results.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hidden_characters_detector_spark.functions.kernel import (
    DetectorConfig, FULL_CLEAN)
from hidden_characters_detector_spark.operators.clean import (
    clean_detect, clean_documents, detect_events, document_events)
from hidden_characters_detector_spark.operators.text_ops import (
    detokenize, tokenize)
from hidden_characters_detector_spark.plans import oracle as osql
from hidden_characters_detector_spark.sources import synth

SPARK, DUCKDB = osql.SPARK, osql.DUCKDB


def _table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _utc(spark: SparkSession) -> None:
    """Pin session tz so window-start rendering matches the naive-timestamp
    oracle regardless of host timezone."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _marked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + injected ``marked`` column (identical to the oracle's)."""
    return _table(spark, sf_dir, "documents").selectExpr(
        "doc_id", "source", "lang", "n_chars",
        f"{osql.marked_expr()} AS marked")


def _cleaned(spark: SparkSession, sf_dir: str,
             cfg: DetectorConfig = FULL_CLEAN, *, keep=None,
             emit_text: bool = False) -> DataFrame:
    """Fused single-Arrow-pass clean over the injected corpus; pass ``keep``
    to prune passthrough columns (mapInArrow blocks Catalyst pruning, so
    pruning must happen at the operator boundary)."""
    return clean_documents(_marked(spark, sf_dir), text_col="marked",
                           cfg=cfg, keep=keep, emit_text=emit_text)


# =========================================================================
# flagship entry: synthetic token table -> clean -> per-source density
# =========================================================================
def entry(spark: SparkSession) -> DataFrame:
    tok = synth.token_table(spark, "/root/testdata/sf0.001")
    cleaned = clean_detect(tok, FULL_CLEAN)
    return (cleaned.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.col("had_marker").cast("long")).alias("docs_with_markers"),
                 F.sum("n_detected").alias("total_detected"),
                 F.sum("n_processed").alias("total_processed"),
                 F.sum("n_tok").alias("total_tokens"),
                 F.sum("n_tok_clean").alias("total_tokens_clean")))


# =========================================================================
# queries + oracles
# =========================================================================
def q_scan_stats(spark, sf_dir):
    """A3 global ScanStats fold (ref :544-563, :881-899)."""
    return _cleaned(spark, sf_dir, keep=[]).agg(
        F.count("*").cast("long").alias("files_processed"),
        F.sum(F.col("had_marker").cast("long")).alias("files_with_markers"),
        F.sum("n_detected").cast("long").alias("total_markers_detected"),
        F.sum("n_processed").cast("long").alias("total_markers_processed"))


def _o_scan_stats():
    d = osql.detected_expr(DUCKDB, "marked")
    chg = osql.changed_expr(DUCKDB, "marked")
    return f"""
    SELECT CAST(count(*) AS BIGINT) AS files_processed,
           CAST(sum(CASE WHEN {d} > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS files_with_markers,
           CAST(sum({d}) AS BIGINT) AS total_markers_detected,
           CAST(sum(CASE WHEN {chg} THEN {d} ELSE 0 END) AS BIGINT)
               AS total_markers_processed
    FROM {osql.marked_docs_sql(DUCKDB)} m"""


def q_clean_text(spark, sf_dir):
    """P1-P6 full fused clean: text -> kernel -> cleaned text, one pass."""
    return _cleaned(spark, sf_dir, keep=["doc_id"], emit_text=True) \
        .select("doc_id", "text_clean")


def _o_clean_text():
    return f"""
    SELECT doc_id, {osql.clean_expr(DUCKDB, 'marked')} AS text_clean
    FROM {osql.marked_docs_sql(DUCKDB)} m"""


def q_detect_counts(spark, sf_dir):
    """Per-doc per-family detection counts (P3/P4/P5 membership), emitted
    map-side by the fused kernel pass — no event fan-out, no join."""
    out = _cleaned(spark, sf_dir, keep=["doc_id"])
    return out.select(
        "doc_id", F.col("n_detected").cast("long").alias("n_detected"),
        F.col("n_hidden").cast("long").alias("n_hidden"),
        F.col("n_ivs").cast("long").alias("n_ivs"),
        F.col("n_typo").cast("long").alias("n_typo"))


def _o_detect_counts():
    h = osql.count_expr(DUCKDB, "marked", osql.HIDDEN_CLASS)
    i = osql.count_expr(DUCKDB, "marked", osql.IVS_CLASS)
    t = osql.count_expr(DUCKDB, "marked", osql.TYPO_CLASS)
    return f"""
    SELECT doc_id, CAST({h} + {i} + {t} AS BIGINT) AS n_detected,
           CAST({h} AS BIGINT) AS n_hidden, CAST({i} AS BIGINT) AS n_ivs,
           CAST({t} AS BIGINT) AS n_typo
    FROM {osql.marked_docs_sql(DUCKDB)} m"""


def q_stats_by_source(spark, sf_dir):
    """A3 grouped by source — the skew-prone keyed aggregate."""
    return (_cleaned(spark, sf_dir, keep=["source"]).groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.col("had_marker").cast("long")).alias("docs_with_markers"),
        F.sum("n_detected").cast("long").alias("total_detected")))


def _o_stats_by_source():
    d = osql.detected_expr(DUCKDB, "marked")
    return f"""
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN {d} > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_with_markers,
           CAST(sum({d}) AS BIGINT) AS total_detected
    FROM {osql.marked_docs_sql(DUCKDB)} m GROUP BY source"""


def q_detect_events(spark, sf_dir):
    """P6 event emission: one row per MarkerReport (clean mode), incl. the
    human-readable ``description`` string (ref :527)."""
    return document_events(_marked(spark, sf_dir), text_col="marked",
                           keep=["doc_id"]).select(
        "doc_id", F.col("idx").cast("long").alias("idx"),
        F.col("token").cast("long").alias("token"), "marker_type",
        "description")


def _desc_lut_sql() -> str:
    """(VALUES ...) lookup of codepoint -> reference description string."""
    from hidden_characters_detector_spark import markers as mk
    rows = []
    seen = set()
    for table in (mk.HIDDEN_DESCRIPTIONS, mk.TYPOGRAPHIC_DESCRIPTIONS):
        for cp, d in table.items():
            if cp not in seen:  # hidden listed first: wins, like the kernel
                seen.add(cp)
                rows.append(f"({cp}, {osql.q(d)})")
    for cp in range(mk.IVS_LO, mk.IVS_HI + 1):
        rows.append(f"({cp}, {osql.q(mk.ivs_description(cp))})")
    return "(VALUES " + ", ".join(rows) + ") AS lut(cp, description)"


def _o_detect_events():
    # single-line docs: idx-in-line == position in string (0-based)
    return f"""
    WITH ev AS (
      SELECT doc_id, CAST(t.i - 1 AS BIGINT) AS idx,
             CAST(unicode(substr(marked, CAST(t.i AS INTEGER), 1)) AS BIGINT)
                 AS token,
             CASE WHEN regexp_matches(substr(marked, CAST(t.i AS INTEGER), 1),
                                      {osql.q(osql.HIDDEN_CLASS)})
                  THEN 'Hidden'
                  WHEN regexp_matches(substr(marked, CAST(t.i AS INTEGER), 1),
                                      {osql.q(osql.IVS_CLASS)})
                  THEN 'IdeographicVS'
                  ELSE 'Typographic' END AS marker_type
      FROM {osql.marked_docs_sql(DUCKDB)} m,
           unnest(range(1, length(marked) + 1)) AS t(i)
      WHERE regexp_matches(substr(marked, CAST(t.i AS INTEGER), 1),
                           {osql.q(osql.HIDDEN_CLASS)})
         OR regexp_matches(substr(marked, CAST(t.i AS INTEGER), 1),
                           {osql.q(osql.IVS_CLASS)})
         OR regexp_matches(substr(marked, CAST(t.i AS INTEGER), 1),
                           {osql.q(osql.TYPO_CLASS)}))
    SELECT ev.doc_id, ev.idx, ev.token, ev.marker_type, lut.description
    FROM ev JOIN {_desc_lut_sql()} ON ev.token = lut.cp"""


def q_excluded_zwsp(spark, sf_dir):
    """P1 user-excluded-char filter: ZWSP passes through untouched."""
    cfg = DetectorConfig(excluded=frozenset({0x200B}))
    return _cleaned(spark, sf_dir, cfg, keep=["doc_id"], emit_text=True) \
        .select("doc_id", "text_clean")


def _o_excluded_zwsp():
    e = osql.clean_expr(DUCKDB, "marked", excluded=frozenset({0x200B}))
    return f"""
    SELECT doc_id, {e} AS text_clean
    FROM {osql.marked_docs_sql(DUCKDB)} m"""


def q_word_mode(spark, sf_dir):
    """P1 --word: Word-common chars merged into the excluded set."""
    cfg = DetectorConfig(exclude_word_chars=True)
    return _cleaned(spark, sf_dir, cfg, keep=["doc_id"], emit_text=True) \
        .select("doc_id", "text_clean")


def _o_word_mode():
    from hidden_characters_detector_spark import markers
    e = osql.clean_expr(DUCKDB, "marked",
                        excluded=markers.WORD_COMMON_CODEPOINTS)
    return f"""
    SELECT doc_id, {e} AS text_clean
    FROM {osql.marked_docs_sql(DUCKDB)} m"""


def q_detect_only(spark, sf_dir):
    """Detect mode (--clean off, ref :677): text passes through unchanged;
    a LEADING BOM (line 1, idx 0) is not reported; nothing is 'processed'."""
    cfg = DetectorConfig(clean=False)
    out = _cleaned(spark, sf_dir, cfg, keep=["doc_id"], emit_text=True)
    return out.select(
        "doc_id", "text_clean",
        F.col("n_detected").cast("long").alias("n_detected"),
        F.col("n_processed").cast("long").alias("n_processed"))


def _o_detect_only():
    d = osql.detected_expr(DUCKDB, "marked")
    bom = "(CASE WHEN substr(marked, 1, 1) = '﻿' THEN 1 ELSE 0 END)"
    return f"""
    SELECT doc_id, marked AS text_clean,
           CAST({d} - {bom} AS BIGINT) AS n_detected,
           CAST(0 AS BIGINT) AS n_processed
    FROM {osql.marked_docs_sql(DUCKDB)} m"""


def q_no_typographic(spark, sf_dir):
    """check_typographic=False (ref :686): hidden/IVS still removed,
    typographic chars left untouched and uncounted."""
    cfg = DetectorConfig(check_typographic=False)
    out = _cleaned(spark, sf_dir, cfg, keep=["doc_id"], emit_text=True)
    return out.select(
        "doc_id", "text_clean",
        F.col("n_detected").cast("long").alias("n_detected"))


def _o_no_typographic():
    e = osql.clean_expr(DUCKDB, "marked", typographic=False)
    h = osql.count_expr(DUCKDB, "marked", osql.HIDDEN_CLASS)
    i = osql.count_expr(DUCKDB, "marked", osql.IVS_CLASS)
    return f"""
    SELECT doc_id, {e} AS text_clean,
           CAST({h} + {i} AS BIGINT) AS n_detected
    FROM {osql.marked_docs_sql(DUCKDB)} m"""


def q_no_ivs(spark, sf_dir):
    """check_ivs=False (ref :694): IVS range left in place and uncounted."""
    cfg = DetectorConfig(check_ivs=False)
    out = _cleaned(spark, sf_dir, cfg, keep=["doc_id"], emit_text=True)
    return out.select(
        "doc_id", "text_clean",
        F.col("n_detected").cast("long").alias("n_detected"))


def _o_no_ivs():
    e = osql.clean_expr(DUCKDB, "marked", ivs=False)
    h = osql.count_expr(DUCKDB, "marked", osql.HIDDEN_CLASS)
    t = osql.count_expr(DUCKDB, "marked", osql.TYPO_CLASS)
    return f"""
    SELECT doc_id, {e} AS text_clean,
           CAST({h} + {t} AS BIGINT) AS n_detected
    FROM {osql.marked_docs_sql(DUCKDB)} m"""


def q_token_stats(spark, sf_dir):
    """Tokenize + token counting (text-analysis op over documents)."""
    toks = tokenize(_marked(spark, sf_dir).select("doc_id", "marked"),
                    text_col="marked")
    return toks.select(
        "doc_id", F.col("n_tok").cast("long").alias("n_tok"),
        (F.size(F.filter(F.col("tokens"), lambda t: t == 0x20)) + 1)
        .cast("long").alias("n_words"))


def _o_token_stats():
    sp = osql.count_expr(DUCKDB, "marked", "[ ]")
    return f"""
    SELECT doc_id, CAST(length(marked) AS BIGINT) AS n_tok,
           CAST({sp} + 1 AS BIGINT) AS n_words
    FROM {osql.marked_docs_sql(DUCKDB)} m"""


def q_token_histogram(spark, sf_dir):
    """Corpus unigram census over the tokenized marked docs
    (``text_analysis.token_histogram`` — explode → partial-agged count;
    the wordcount shape with a vocab-bounded shuffle).  Every codepoint's
    exact occurrence count is under the hash gate, including the planted
    hidden/typographic markers."""
    from hidden_characters_detector_spark.operators import text_analysis
    toks = tokenize(_marked(spark, sf_dir).select("doc_id", "marked"),
                    text_col="marked")
    return text_analysis.token_histogram(toks).select(
        F.col("token").cast("long").alias("token"), "n_occurrences")


def _o_token_histogram():
    return f"""
    WITH t AS (
      SELECT unicode(substr(marked, CAST(i AS INTEGER), 1)) AS token
      FROM {osql.marked_docs_sql(DUCKDB)} m,
           unnest(range(1, length(marked) + 1)) AS u(i))
    SELECT CAST(token AS BIGINT) AS token,
           CAST(count(*) AS BIGINT) AS n_occurrences
    FROM t GROUP BY token"""


def q_vocab_stats(spark, sf_dir):
    """One-row corpus vocabulary profile (``text_analysis.vocab_stats``):
    total tokens, vocab size, modal-token count, unigram entropy in bits —
    the same bounded-shuffle histogram plus a scalar final aggregate; the
    oracle recomputes the identical entropy formula."""
    from hidden_characters_detector_spark.operators import text_analysis
    toks = tokenize(_marked(spark, sf_dir).select("doc_id", "marked"),
                    text_col="marked")
    return text_analysis.vocab_stats(toks)


def _o_vocab_stats():
    return f"""
    WITH t AS (
      SELECT unicode(substr(marked, CAST(i AS INTEGER), 1)) AS token
      FROM {osql.marked_docs_sql(DUCKDB)} m,
           unnest(range(1, length(marked) + 1)) AS u(i)),
    h AS (SELECT token, count(*) AS c FROM t GROUP BY token)
    SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS vocab_size,
           CAST(max(c) AS BIGINT) AS top_token_count,
           round(log2(CAST(sum(c) AS DOUBLE))
                 - sum(c * log2(CAST(c AS DOUBLE)))
                   / CAST(sum(c) AS DOUBLE), 6) AS unigram_entropy_bits
    FROM h"""


# --- relational coverage (joins / aggs / windows / sort-limit) --------------
def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style hash aggregate with decimal-exact sums."""
    li = _table(spark, sf_dir, "lineitem")
    return (li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                 .cast("double").alias("sum_qty"),
                 F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                 .cast("double").alias("sum_base_price"),
                 F.count("*").cast("long").alias("count_order")))


def _o_pricing_summary():
    return """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_base_price,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus"""


def q_order_customer_join(spark, sf_dir):
    """Broadcast equi-join orders ⋈ customer + grouped agg."""
    o = _table(spark, sf_dir, "orders")
    c = _table(spark, sf_dir, "customer")
    return (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count("*").cast("long").alias("n_orders"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("total_price")))


def _o_order_customer_join():
    return """
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment"""


def q_events_tumbling(spark, sf_dir):
    """Tumbling 1-minute window aggregate over the events stream table."""
    _utc(spark)
    ev = _table(spark, sf_dir, "events")
    w = F.window("ts", "1 minute")
    return (ev.groupBy(w, "event_type")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,2)"))
                 .cast("double").alias("total_value"))
            .select(F.date_format("window.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("window_start"), "event_type", "n_events",
                    "total_value"))


def _o_events_tumbling():
    return """
    SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S')
               AS window_start,
           event_type, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2"""


def q_events_sliding(spark, sf_dir):
    """Sliding 10-minute window, 5-minute slide, per event_type."""
    _utc(spark)
    ev = _table(spark, sf_dir, "events")
    w = F.window("ts", "10 minutes", "5 minutes")
    return (ev.groupBy(w, "event_type")
            .agg(F.count("*").cast("long").alias("n_events"))
            .select(F.date_format("window.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("window_start"), "event_type", "n_events"))


def _o_events_sliding():
    # each event belongs to exactly two 10min/5min windows
    return """
    WITH b AS (
      SELECT make_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT)
                            * 1000000) AS w0,
             event_type FROM events),
    x AS (
      SELECT w0 AS ws, event_type FROM b
      UNION ALL
      SELECT w0 - INTERVAL 5 MINUTE AS ws, event_type FROM b)
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
           CAST(count(*) AS BIGINT) AS n_events
    FROM x GROUP BY 1, 2"""


def q_events_session(spark, sf_dir):
    """Session windows (5-minute gap) per user over the events table."""
    _utc(spark)
    ev = _table(spark, sf_dir, "events")
    return (ev.groupBy(F.session_window("ts", "5 minutes"), "user_id")
            .agg(F.count("*").cast("long").alias("n_events"))
            .select("user_id",
                    F.date_format("session_window.start",
                                  "yyyy-MM-dd HH:mm:ss")
                    .alias("session_start"), "n_events"))


def _o_events_session():
    return """
    WITH o AS (
      SELECT user_id, ts,
             -- Spark session windows are half-open [ts, ts+gap): an event
             -- exactly `gap` after the previous one starts a NEW session
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 5 MINUTE OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    s AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM o)
    SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, session_id"""


def q_top_sources(spark, sf_dir):
    """Sort + limit: top-3 sources by marker density."""
    agg = (_cleaned(spark, sf_dir, keep=["source"]).groupBy("source")
           .agg(F.sum("n_detected").cast("long").alias("total_detected"),
                F.count("*").cast("long").alias("n_docs")))
    return agg.orderBy(F.desc("total_detected"), "source").limit(3)


def _o_top_sources():
    d = osql.detected_expr(DUCKDB, "marked")
    return f"""
    SELECT source, CAST(sum({d}) AS BIGINT) AS total_detected,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM {osql.marked_docs_sql(DUCKDB)} m
    GROUP BY source ORDER BY total_detected DESC, source LIMIT 3"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "scan_stats": q_scan_stats,
        "clean_text": q_clean_text,
        "detect_counts": q_detect_counts,
        "stats_by_source": q_stats_by_source,
        "detect_events": q_detect_events,
        "excluded_zwsp": q_excluded_zwsp,
        "word_mode": q_word_mode,
        "detect_only": q_detect_only,
        "no_typographic": q_no_typographic,
        "no_ivs": q_no_ivs,
        "token_stats": q_token_stats,
        "pricing_summary": q_pricing_summary,
        "order_customer_join": q_order_customer_join,
        "events_tumbling": q_events_tumbling,
        "events_sliding": q_events_sliding,
        "events_session": q_events_session,
        "top_sources": q_top_sources,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "scan_stats": _o_scan_stats(),
        "clean_text": _o_clean_text(),
        "detect_counts": _o_detect_counts(),
        "stats_by_source": _o_stats_by_source(),
        "detect_events": _o_detect_events(),
        "excluded_zwsp": _o_excluded_zwsp(),
        "word_mode": _o_word_mode(),
        "detect_only": _o_detect_only(),
        "no_typographic": _o_no_typographic(),
        "no_ivs": _o_no_ivs(),
        "token_stats": _o_token_stats(),
        "pricing_summary": _o_pricing_summary(),
        "order_customer_join": _o_order_customer_join(),
        "events_tumbling": _o_events_tumbling(),
        "events_sliding": _o_events_sliding(),
        "events_session": _o_events_session(),
        "top_sources": _o_top_sources(),
    }


# =========================================================================
# training-data pipeline operators (dedup / similarity / text analysis)
# =========================================================================
def q_exact_dedup(spark, sf_dir):
    """Exact dedup: min-id keeper per content digest + group size."""
    from hidden_characters_detector_spark.operators import dedup
    docs = _table(spark, sf_dir, "documents").selectExpr(
        "cast(doc_id as string) AS doc_id", "text")
    # make real duplicate groups: each doc also appears under a clone id
    both = docs.unionByName(
        docs.selectExpr("concat(doc_id, '_clone') AS doc_id", "text"))
    return dedup.exact_dedup(both)


def _o_exact_dedup():
    return """
    WITH unioned AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
      UNION ALL
      SELECT doc_id || '_clone' AS doc_id, text FROM documents),
    h AS (
      SELECT doc_id, md5(text) AS content_hash,
             CAST(count(*) OVER (PARTITION BY md5(text)) AS BIGINT)
                 AS group_size,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)
                 AS rk
      FROM unioned)
    SELECT doc_id, content_hash, group_size FROM h WHERE rk = 1"""


def q_token_counts(spark, sf_dir):
    """Token counting (whitespace + BPE-ish regex) over documents."""
    from hidden_characters_detector_spark.operators import text_analysis
    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    out = text_analysis.token_counts(docs)
    return out.select("doc_id", "n_chars_obs", "n_ws_tokens", "n_bpe_pieces")


def _o_token_counts():
    from hidden_characters_detector_spark.operators.text_analysis import (
        BPE_REGEX)
    return f"""
    SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_obs,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
                AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, {osql.q(BPE_REGEX)}))
                AS BIGINT) AS n_bpe_pieces
    FROM documents"""


def q_quality(spark, sf_dir):
    """Quality-score heuristics over documents."""
    from hidden_characters_detector_spark.operators import text_analysis
    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    return text_analysis.quality_scores(docs).select(
        "doc_id", "punct_ratio", "digit_ratio", "upper_ratio",
        "space_ratio", "quality_score")


def _o_quality():
    n = "length(text)"
    punct = f"({n} - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))"
    digits = f"({n} - length(regexp_replace(text, '[0-9]', '', 'g')))"
    uppers = f"({n} - length(regexp_replace(text, '[A-Z]', '', 'g')))"
    spaces = f"({n} - length(regexp_replace(text, '[ ]', '', 'g')))"

    def ratio(x):
        return f"round({x} / greatest(CAST({n} AS DOUBLE), 1.0), 6)"

    score = (f"round(1.0"
             f" * (CASE WHEN {n} BETWEEN 50 AND 10000 THEN 1.0 ELSE 0.5 END)"
             f" * (CASE WHEN {ratio(punct)} <= 0.2 THEN 1.0 ELSE 0.6 END)"
             f" * (CASE WHEN {ratio(digits)} <= 0.3 THEN 1.0 ELSE 0.7 END)"
             f" * (CASE WHEN {ratio(spaces)} BETWEEN 0.05 AND 0.4"
             f"      THEN 1.0 ELSE 0.8 END), 6)")
    return f"""
    SELECT doc_id, {ratio(punct)} AS punct_ratio,
           {ratio(digits)} AS digit_ratio, {ratio(uppers)} AS upper_ratio,
           {ratio(spaces)} AS space_ratio, {score} AS quality_score
    FROM documents"""


def q_lang_id(spark, sf_dir):
    """Stopword-vote language ID over documents."""
    from hidden_characters_detector_spark.operators import text_analysis
    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    return text_analysis.language_id(docs).select("doc_id", "lang_pred")


def _o_lang_id():
    from hidden_characters_detector_spark.operators.text_analysis import (
        LANG_STOPWORDS)
    parts, case = [], []
    for lang, words in LANG_STOPWORDS.items():
        lst = ", ".join(osql.q(w) for w in words)
        parts.append(
            f"len(list_filter(regexp_split_to_array(lower(text), "
            f"'[^a-zà-ÿ]+'), x -> x IN ({lst}))) AS sw_{lang}")
    langs = list(LANG_STOPWORDS)
    best = "greatest(" + ", ".join(f"sw_{la}" for la in langs) + ")"
    case.append(f"CASE WHEN {best} <= 0 THEN 'und'")
    for la in langs:
        case.append(f"WHEN sw_{la} = {best} THEN '{la}'")
    case.append("END AS lang_pred")
    return f"""
    WITH s AS (SELECT doc_id, {', '.join(parts)} FROM documents)
    SELECT doc_id, {' '.join(case)} FROM s"""


_ANN_QUERY_VEC = None


def _ann_query_vec():
    global _ANN_QUERY_VEC
    if _ANN_QUERY_VEC is None:
        import numpy as np
        _ANN_QUERY_VEC = [
            round(float(x), 6)
            for x in np.random.default_rng(7).standard_normal(64)]
    return _ANN_QUERY_VEC


def q_ann_topk(spark, sf_dir):
    """Brute-force cosine top-10 against a fixed query vector."""
    from hidden_characters_detector_spark.operators import similarity
    emb = _table(spark, sf_dir, "embeddings")
    out = similarity.cosine_topk(emb, _ann_query_vec(), k=10)
    return out.select("vec_id", F.round("cosine", 4).alias("cosine"))


def _o_ann_topk():
    vec = "[" + ", ".join(f"{x!r}" for x in _ann_query_vec()) + "]"
    return f"""
    WITH q AS (SELECT CAST({vec} AS DOUBLE[]) AS qv),
    s AS (
      SELECT vec_id,
             list_dot_product(CAST(embedding AS DOUBLE[]), qv)
             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[])))
                * sqrt(list_dot_product(qv, qv))) AS cos
      FROM embeddings, q)
    SELECT vec_id, round(round(cos, 6), 4) AS cosine
    FROM s ORDER BY round(cos, 6) DESC, vec_id LIMIT 10"""


# --- full-algorithm DuckDB oracles for the hash-sketch dedup family --------
#
# The minhash/simhash operators are pure functions of (text, seed): the
# shingle hash is a Horner polynomial over codepoints with wraparound mod
# 2^64, the 64 permutations are seeded affine maps mod M61, the simhash is
# a per-bit majority vote.  All of that is expressible in DuckDB SQL —
# HUGEINT (128-bit) holds every intermediate (acc*B < 2^104, a*h < 2^125),
# stepwise ``% 2^64`` mirrors numpy's uint64 wraparound, and the seeded
# constants are embedded as literals generated by the SAME numpy calls the
# kernel makes.  So the oracle replicates the ACTUAL algorithm, not a
# fixture-specific approximation — natural near-dups in the corpus agree by
# construction, and est_jaccard / hamming are verified value-for-value.

_M64 = "18446744073709551616"          # 2^64 (numpy uint64 wraparound)
_M61S = "2305843009213693951"          # (1<<61)-1, the permutation modulus
_HB = "1099511628211"                  # rolling-hash base (FNV prime)


def _o_shingle_hash_expr(k: int) -> str:
    """Horner rolling hash of the k-char shingle starting at position i,
    mirroring dedup._flat_shingle_hashes: acc = (acc*B + cp) wrap 2^64."""
    expr = (f"CAST(unicode(substr(text, CAST(i AS INTEGER), 1)) "
            f"AS HUGEINT)")
    for j in range(1, k):
        expr = (f"((({expr}) * {_HB} + CAST(unicode(substr(text, "
                f"CAST(i + {j} AS INTEGER), 1)) AS HUGEINT)) % {_M64})")
    return expr


def _mutated_docs(spark, sf_dir):
    """documents ∪ near-duplicate mutations (deterministic): each doc ≥15
    chars gets a sibling with the first 10 chars dropped — drives the
    near-dup sketch ops with real mixed-similarity structure (exact-style
    high-Jaccard twins AND whatever natural template near-dups the corpus
    carries; the full-algorithm oracles agree on all of them by
    construction).  Shingle-less docs need no special case on EITHER side:
    the operators exclude them from candidacy (no similarity signal — see
    ``_lsh_candidates``/``simhash_near_dups``) and the oracles' shingle
    CTEs produce no row for them, so both engines drop them identically
    whatever the corpus length distribution."""
    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    mut = docs.where(F.length("text") >= 15).selectExpr(
        "concat(doc_id, '000000') AS doc_id", "substr(text, 11) AS text")
    return docs.selectExpr("cast(doc_id as string) AS doc_id", "text") \
        .unionByName(mut)


_FIXTURE_MUTATED_SQL = """
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
      UNION ALL
      SELECT doc_id || '000000' AS doc_id, substr(text, 11) AS text
      FROM documents WHERE length(text) >= 15"""


def q_minhash_near_dups(spark, sf_dir):
    """Banded MinHash-LSH near-dup pairs (est_jaccard ≥ 0.5), hash-matched
    value-for-value against a DuckDB oracle that REPLICATES the algorithm:
    same rolling shingle hashes, same 64 seeded permutations, same
    16-band/4-row collision rule, same signature-agreement estimate (see
    ``_o_minhash_near_dups``)."""
    from hidden_characters_detector_spark.operators import dedup
    return dedup.minhash_lsh_pairs(_mutated_docs(spark, sf_dir),
                                   jaccard_threshold=0.5)


def _o_minhash_near_dups(num_perm: int = 64, bands: int = 16,
                         shingle_k: int = 5, threshold: float = 0.5,
                         extra_pred: str = ""):
    import numpy as np

    from hidden_characters_detector_spark.operators.dedup import _M61

    # the SAME seeded draws minhash_signatures(seed=42) makes
    rng = np.random.default_rng(42)
    a = rng.integers(1, int(_M61), num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_M61), num_perm, dtype=np.uint64)
    # per-permutation min over shingles of ((a*h mod 2^64) + b mod 2^64)
    # mod M61 — numpy wraps each op at 2^64 before the final % M61
    sig_cols = ", ".join(
        f"min((({int(a[i])} * h) % {_M64} + {int(b[i])}) % {_M64} "
        f"% {_M61S}) AS s{i}"
        for i in range(num_perm))
    matches = " + ".join(
        f"CASE WHEN x.s{i} = y.s{i} THEN 1 ELSE 0 END"
        for i in range(num_perm))
    rows_per_band = num_perm // bands
    band_hit = " OR ".join(
        "(" + " AND ".join(f"x.s{j} = y.s{j}"
                           for j in range(bb * rows_per_band,
                                          (bb + 1) * rows_per_band)) + ")"
        for bb in range(bands))
    return f"""
    WITH u AS ({_FIXTURE_MUTATED_SQL}),
    hs AS (
      SELECT doc_id, {_o_shingle_hash_expr(shingle_k)} AS h
      FROM u, unnest(range(1, length(text) - {shingle_k - 2})) AS t(i)),
    sigs AS (SELECT doc_id, {sig_cols} FROM hs GROUP BY doc_id)
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
           round(({matches}) / {float(num_perm)}, 4) AS est_jaccard
    FROM sigs x JOIN sigs y ON x.doc_id < y.doc_id
    WHERE ({band_hit})
      AND ({matches}) / {float(num_perm)} >= {threshold}{extra_pred}"""


def q_simhash_near_dups(spark, sf_dir):
    """SimHash near-dup pairs (Hamming ≤ 3 via 4×16-bit band pigeonhole),
    hash-matched value-for-value against a DuckDB oracle that replicates
    the fingerprint: same distinct shingle hashes, same per-bit majority
    vote, same Hamming verify (see ``_o_simhash_near_dups``)."""
    from hidden_characters_detector_spark.operators import dedup
    return dedup.simhash_near_dups(_mutated_docs(spark, sf_dir),
                                   max_hamming=3)


def _o_simhash_near_dups(shingle_k: int = 4, max_hamming: int = 3):
    # 64-bit fingerprint as two BIGINT halves (DuckDB bit ops are
    # BIGINT-native); bit t set ⟺ strict majority of DISTINCT shingle
    # hashes have bit t set — exactly simhash_fingerprints' vote.  The
    # banding stage needs no oracle: pigeonhole makes it lossless for
    # hamming ≤ 3, and the engine's final Hamming filter is replicated
    # below, so candidates == all-pairs here.
    lo_bits = " + ".join(
        f"(CASE WHEN 2 * sum(CAST((lo >> {t}) & 1 AS BIGINT)) > count(*) "
        f"THEN {1 << t} ELSE 0 END)" for t in range(32))
    hi_bits = " + ".join(
        f"(CASE WHEN 2 * sum(CAST((hi >> {t}) & 1 AS BIGINT)) > count(*) "
        f"THEN {1 << t} ELSE 0 END)" for t in range(32))
    return f"""
    WITH u AS ({_FIXTURE_MUTATED_SQL}),
    hs AS (
      SELECT DISTINCT doc_id,
             {_o_shingle_hash_expr(shingle_k)} AS h
      FROM u, unnest(range(1, length(text) - {shingle_k - 2})) AS t(i)),
    split AS (
      SELECT doc_id, CAST(h % 4294967296 AS BIGINT) AS lo,
             CAST(h // 4294967296 AS BIGINT) AS hi
      FROM hs),
    fp AS (
      SELECT doc_id, CAST({lo_bits} AS BIGINT) AS fp_lo,
             CAST({hi_bits} AS BIGINT) AS fp_hi
      FROM split GROUP BY doc_id)
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
           CAST(bit_count(xor(x.fp_lo, y.fp_lo))
                + bit_count(xor(x.fp_hi, y.fp_hi)) AS INTEGER) AS hamming
    FROM fp x JOIN fp y ON x.doc_id < y.doc_id
    WHERE bit_count(xor(x.fp_lo, y.fp_lo))
          + bit_count(xor(x.fp_hi, y.fp_hi)) <= {max_hamming}"""


def _planted_embeddings(spark, sf_dir):
    """embeddings ∪ planted near-duplicates: every 5th vector gets a sibling
    scaled by 1.25 — positive scaling keeps every hyperplane sign, so the
    sibling lands in the SAME sign-LSH bucket by construction (cosine is
    exactly 1.0), making the bucketed pairwise search verifiable against an
    exact all-pairs oracle.  Arrays are cast to double so both engines
    compute on identical values."""
    emb = _table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    sib = (emb.where(F.col("vec_id") % 5 == 0)
           .select((F.col("vec_id") + 1000000).alias("vec_id"),
                   F.transform("embedding", lambda x: x * F.lit(1.25))
                   .alias("embedding")))
    return emb.unionByName(sib)


def q_embedding_near_dups(spark, sf_dir):
    """Embedding-cosine near-dup pairs within LSH buckets, over the corpus
    with planted scaled siblings (full oracle: exact all-pairs cosine).
    ``nbits`` is auto-sized from the corpus (``similarity.auto_nbits``) so
    bucket occupancy stays ~constant as the corpus scales; planted siblings
    share their source's bucket at ANY nbits (positive scaling preserves
    every hyperplane sign), and the fixture-guard pytest
    (``test_embedding_near_dups_fixture_guard``) asserts the corpus carries
    no natural ≥0.99 pair that pruning could miss."""
    from hidden_characters_detector_spark.operators import similarity
    out = similarity.pairwise_cosine_in_buckets(
        _planted_embeddings(spark, sf_dir), min_cosine=0.99)
    return out.select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))


def _o_embedding_near_dups():
    return """
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id,
             list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.25) AS e
      FROM embeddings WHERE vec_id % 5 = 0),
    p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_dot_product(a.e, b.e)
             / (sqrt(list_dot_product(a.e, a.e))
                * sqrt(list_dot_product(b.e, b.e))) AS cos
      FROM base a, base b WHERE a.vec_id < b.vec_id)
    SELECT id_a, id_b, round(round(cos, 6), 4) AS cosine
    FROM p WHERE round(cos, 6) >= 0.99"""


def _mutated_long_docs(spark, sf_dir):
    """documents ∪ near-dup siblings for the verified-dedup query: docs of
    ≥200 chars get a first-10-chars-dropped twin, so every qualifying pair
    has true Jaccard ≥ ~0.9 — far above both the verify threshold (0.85)
    and the LSH banding's miss regime, making engine output == exact
    all-pairs oracle."""
    docs = _table(spark, sf_dir, "documents").selectExpr(
        "cast(doc_id as string) AS doc_id", "text")
    mut = docs.where(F.length("text") >= 200).selectExpr(
        "concat(doc_id, '000000') AS doc_id", "substr(text, 11) AS text")
    return docs.unionByName(mut)


def q_verified_near_dups(spark, sf_dir):
    """MinHash-LSH candidates verified by EXACT k-shingle Jaccard — the
    strongest oracle-checkable dedup signal (DuckDB computes true Jaccard
    over all pairs with a sound length prefilter)."""
    from hidden_characters_detector_spark.operators import dedup
    return dedup.verified_near_dups(_mutated_long_docs(spark, sf_dir),
                                    jaccard_threshold=0.85)


def _o_verified_near_dups():
    return """
    WITH unioned AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
      UNION ALL
      SELECT doc_id || '000000' AS doc_id, substr(text, 11) AS text
      FROM documents WHERE length(text) >= 200),
    sh AS (
      -- shingles as 64-bit hashes (collision odds ~1e-13): VARCHAR-list
      -- intersection is ~2x slower and the engine's exact-Jaccard verify
      -- also compares hashed shingle sets, so this mirrors it closer
      SELECT doc_id,
             list_distinct(list_transform(range(1, length(text) - 3),
                 i -> hash(substr(text, CAST(i AS INTEGER), 5)))) AS s
      FROM unioned),
    p AS (
      -- sound prefilter: jaccard <= min(|A|,|B|)/max(|A|,|B|)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.s, b.s)) AS i,
             len(a.s) AS la, len(b.s) AS lb
      FROM sh a JOIN sh b
        ON a.doc_id < b.doc_id
       AND least(len(a.s), len(b.s))
           >= 0.85 * greatest(len(a.s), len(b.s)))
    SELECT doc_a, doc_b,
           round(CAST(i AS DOUBLE) / (la + lb - i), 6) AS jaccard
    FROM p WHERE CAST(i AS DOUBLE) / (la + lb - i) >= 0.85"""


def _fingerprint_docs(spark, sf_dir):
    """documents ∪ planted fingerprint siblings: an exact duplicate per doc
    (same text ⇒ every fp column equal), a shared-prefix twin (same first-64
    chars ⇒ same fp_prefix), and a shared-suffix twin (same last-64 chars ⇒
    same fp_suffix) — the fixture that makes every equality-group below
    non-vacuous."""
    docs = _table(spark, sf_dir, "documents").selectExpr(
        "cast(doc_id as string) AS doc_id", "text")
    dup = docs.selectExpr("doc_id || '_dup' AS doc_id", "text")
    pre = docs.where(F.length("text") >= 128).selectExpr(
        "doc_id || '_pre' AS doc_id",
        "substr(text, 1, 64) || ' PFXTAIL ' || doc_id AS text")
    suf = docs.where(F.length("text") >= 128).selectExpr(
        "doc_id || '_suf' AS doc_id",
        "'SFXHEAD ' || doc_id || ' ' || substr(text, length(text) - 63)"
        " AS text")
    return docs.unionByName(dup).unionByName(pre).unionByName(suf)


def q_length_stats(spark, sf_dir):
    """Per-source exact length quantiles (R-7 interpolation — identical
    definition in Spark ``percentile`` and DuckDB ``quantile_cont``) —
    the profiling aggregate behind curation length cutoffs.  ``exact=True``
    is the explicit oracle-parity opt-in; the function DEFAULT is the
    bounded-memory approx sketch (the at-scale plan, plan-asserted in
    tests/test_plans.py)."""
    from hidden_characters_detector_spark.operators import text_analysis
    docs = _table(spark, sf_dir, "documents").select("source", "text")
    return text_analysis.length_quantiles(docs, exact=True)


def _o_length_stats():
    qs = ", ".join(
        f"round(quantile_cont(CAST(length(text) AS DOUBLE), {p}), 6)"
        f" AS p{int(p * 100)}"
        for p in (0.25, 0.5, 0.75, 0.95))
    return f"""
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs, {qs}
    FROM documents GROUP BY source"""


# portable md5-digit hash-unit (mirrors operators.sampling.hash_unit)
def _o_hash_unit(id_expr: str, salt) -> str:
    def dig(k):
        a = f"ascii(substr(md5({id_expr} || '|{salt}'), {k + 1}, 1))"
        return f"(CASE WHEN {a} <= 57 THEN {a} - 48 ELSE {a} - 87 END)"

    v = f"CAST({dig(0)} AS BIGINT)"
    for i in range(1, 8):
        v = f"({v} * 16 + {dig(i)})"
    return f"(CAST({v} AS DOUBLE) / 4294967296.0)"


def q_train_test_split(spark, sf_dir):
    """Deterministic hash-based train/test split (80/20): pure function of
    doc_id, partitioning-independent, zero-shuffle (codegen projection);
    the oracle evaluates the identical md5-digit arithmetic."""
    from hidden_characters_detector_spark.operators import sampling
    docs = _table(spark, sf_dir, "documents").select("doc_id")
    return sampling.train_test_split(docs, train_frac=0.8, salt=42)


def _o_train_test_split():
    u = _o_hash_unit("CAST(doc_id AS VARCHAR)", 42)
    return f"""
    SELECT doc_id,
           CASE WHEN {u} < 0.8 THEN 'train' ELSE 'test' END AS split
    FROM documents"""


# per-stratum fractions: vary by source index so stratification is
# non-vacuous (src0 keeps 10%, src7 keeps 80%, cycling)
_STRATA_FRACTIONS = {f"src{i}": (1 + (i % 8)) / 10.0 for i in range(20)}


def q_stratified_sample(spark, sf_dir):
    """Per-stratum deterministic Bernoulli downsampling (the curation
    rebalancing step): keep fraction varies per source; kept rows are a
    pure function of doc_id — the oracle recomputes the same decision."""
    from hidden_characters_detector_spark.operators import sampling
    docs = _table(spark, sf_dir, "documents").select("doc_id", "source")
    return sampling.stratified_sample(docs, _STRATA_FRACTIONS, salt=43)


def _o_stratified_sample():
    u = _o_hash_unit("CAST(doc_id AS VARCHAR)", 43)
    case = "CASE " + " ".join(
        f"WHEN source = '{s}' THEN {p!r}"
        for s, p in sorted(_STRATA_FRACTIONS.items())) + " ELSE 0.0 END"
    return f"""
    SELECT doc_id, source FROM documents WHERE {u} < ({case})"""


def q_temperature_mix(spark, sf_dir):
    """Temperature-based source rebalancing
    (``operators.sampling.temperature_mix``): keep probability per source
    ∝ sqrt(n_s) (alpha=0.5), scaled to a half-corpus budget, decided by
    the deterministic id hash.  The oracle recomputes the identical
    fraction arithmetic in SQL (sqrt is IEEE-correctly-rounded in both
    engines; the association order of the scale expression is mirrored
    term for term)."""
    from hidden_characters_detector_spark.operators import sampling
    docs = _table(spark, sf_dir, "documents").select("doc_id", "source")
    counts = {r["source"]: r["cnt"] for r in
              docs.groupBy("source").agg(F.count("*").alias("cnt"))
              .collect()}
    budget = sum(counts.values()) // 2
    return sampling.temperature_mix(docs, counts, alpha=0.5,
                                    total_budget=budget, salt=44)


def _o_temperature_mix():
    u = _o_hash_unit("CAST(doc_id AS VARCHAR)", 44)
    return f"""
    WITH c AS (SELECT source, CAST(count(*) AS DOUBLE) AS cnt
               FROM documents GROUP BY source),
    w AS (SELECT source, cnt, sqrt(cnt) AS wt FROM c),
    f AS (SELECT source,
                 least(1.0,
                       (SELECT count(*) // 2 FROM documents)
                       * wt / (SELECT sum(wt) FROM w) / cnt) AS frac
          FROM w)
    SELECT d.doc_id, d.source
    FROM documents d JOIN f ON d.source = f.source
    WHERE {u} < f.frac"""


def q_epoch_shuffle(spark, sf_dir):
    """Deterministic epoch shuffle (training-order generation,
    ``operators.sampling.epoch_shuffle``): the permutation key is a pure
    function of (doc_id, epoch) — identical on any partitioning or
    cluster size — and each epoch yields an independent order.  The gate
    value-checks the EXACT key (rescaled to its 32-bit integer, so no
    float-rounding ambiguity crosses engines) plus the derived shard
    assignment; row order itself is invisible to the order-insensitive
    compare, but the key column IS the order."""
    from hidden_characters_detector_spark.operators import sampling
    docs = _table(spark, sf_dir, "documents").select("doc_id")
    out = sampling.epoch_shuffle(docs, epoch=3, n_shards=8)
    return out.select(
        "doc_id",
        F.floor(F.col("shuffle_key") * F.lit(4294967296.0))
        .cast("long").alias("key_u32"),
        "shard")


def _o_epoch_shuffle():
    u = _o_hash_unit("CAST(doc_id AS VARCHAR)", "epoch3")
    return f"""
    SELECT doc_id,
           CAST(floor({u} * 4294967296.0) AS BIGINT) AS key_u32,
           CAST(floor({u} * 8) AS BIGINT) AS shard
    FROM documents"""


def q_dedup_groups(spark, sf_dir):
    """End-to-end near-dup GROUPING (the step after pair generation):
    LSH → exact-Jaccard verify → connected components (iterative min-label
    propagation as DataFrame joins) → canonical keeper per group.  Oracle:
    DuckDB computes the same exact-Jaccard pair graph and its TRUE
    transitive closure with a recursive CTE, so the engine's iterative
    convergence is verified against genuine reachability — components,
    sizes, and keeper election all hash-matched."""
    from hidden_characters_detector_spark.operators import dedup
    return dedup.dedup_groups(_mutated_long_docs(spark, sf_dir),
                              jaccard_threshold=0.85)


def _o_dedup_groups():
    # the pair CTEs are forced MATERIALIZED: inside WITH RECURSIVE, DuckDB
    # would otherwise re-inline the all-pairs Jaccard join into both edge
    # directions (measured ~5x slower)
    return """
    WITH RECURSIVE unioned AS MATERIALIZED (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
      UNION ALL
      SELECT doc_id || '000000' AS doc_id, substr(text, 11) AS text
      FROM documents WHERE length(text) >= 200),
    sh AS MATERIALIZED (
      -- hashed shingles: see _o_verified_near_dups
      SELECT doc_id,
             list_distinct(list_transform(range(1, length(text) - 3),
                 i -> hash(substr(text, CAST(i AS INTEGER), 5)))) AS s
      FROM unioned),
    p AS MATERIALIZED (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sh a JOIN sh b
        ON a.doc_id < b.doc_id
       AND least(len(a.s), len(b.s)) >= 0.85 * greatest(len(a.s), len(b.s))
       AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
           / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
           >= 0.85),
    edges AS MATERIALIZED (
      SELECT doc_a AS src, doc_b AS dst FROM p
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM p),
    walk(node, reach) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, w.reach FROM edges e JOIN walk w ON e.dst = w.node),
    comp AS (
      SELECT node, min(reach) AS group_id FROM walk GROUP BY node),
    sized AS (
      SELECT group_id, CAST(count(*) AS BIGINT) AS group_size
      FROM comp GROUP BY group_id)
    SELECT c.node AS doc_id, c.group_id, s.group_size,
           c.node = c.group_id AS is_canonical
    FROM comp c JOIN sized s USING (group_id)"""


def q_fingerprints(spark, sf_dir):
    """Content fingerprints verified as HASH-INDEPENDENT equality groups:
    raw xxhash64 values cannot be reproduced in DuckDB, but the *semantics*
    can — same text ⟺ same fp_xxh64, same first-64 chars ⟺ same fp_prefix,
    same last-64 chars ⟺ same fp_suffix (collisions are 2^-64).  Each fp
    column is re-keyed to ``min(doc_id)`` over its fp group; the oracle
    derives the identical groups from text equality.  ``grp_all`` groups by
    the FULL fingerprint tuple (including the Arrow-kernel
    ``fp_shingle_min``), so a nondeterministic / partition-dependent kernel
    value would split a text-equality group and fail the hash-match.  Raw
    winnowing robustness (shared minimal window across edits) stays in
    pytest (``test_fingerprints``)."""
    from pyspark.sql import Window

    from hidden_characters_detector_spark.operators import text_analysis
    fps = text_analysis.fingerprints(_fingerprint_docs(spark, sf_dir))
    return fps.select(
        "doc_id",
        F.min("doc_id").over(Window.partitionBy("fp_xxh64"))
        .alias("grp_content"),
        F.min("doc_id").over(Window.partitionBy("fp_prefix"))
        .alias("grp_prefix"),
        F.min("doc_id").over(Window.partitionBy("fp_suffix"))
        .alias("grp_suffix"),
        F.min("doc_id").over(Window.partitionBy(
            "fp_xxh64", "fp_prefix", "fp_suffix", "fp_shingle_min"))
        .alias("grp_all"))


_FP_FIXTURE_SQL = """
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
      UNION ALL
      SELECT CAST(doc_id AS VARCHAR) || '_dup' AS doc_id, text
      FROM documents
      UNION ALL
      SELECT CAST(doc_id AS VARCHAR) || '_pre' AS doc_id,
             substr(text, 1, 64) || ' PFXTAIL ' || CAST(doc_id AS VARCHAR)
                 AS text
      FROM documents WHERE length(text) >= 128
      UNION ALL
      SELECT CAST(doc_id AS VARCHAR) || '_suf' AS doc_id,
             'SFXHEAD ' || CAST(doc_id AS VARCHAR) || ' '
                 || substr(text, length(text) - 63) AS text
      FROM documents WHERE length(text) >= 128"""


def _o_fingerprints():
    # Spark's substring(text, -64, 64) returns the WHOLE text when
    # length < 64 (verified empirically), so the suffix key mirrors that
    return f"""
    WITH u AS ({_FP_FIXTURE_SQL}),
    keyed AS (
      SELECT doc_id, text AS k_content, substr(text, 1, 64) AS k_prefix,
             CASE WHEN length(text) <= 64 THEN text
                  ELSE substr(text, length(text) - 63) END AS k_suffix
      FROM u)
    SELECT doc_id,
           min(doc_id) OVER (PARTITION BY k_content) AS grp_content,
           min(doc_id) OVER (PARTITION BY k_prefix) AS grp_prefix,
           min(doc_id) OVER (PARTITION BY k_suffix) AS grp_suffix,
           min(doc_id) OVER (PARTITION BY k_content) AS grp_all
    FROM keyed"""


def q_ann_topk_lsh(spark, sf_dir):
    """Sign-LSH bucketed ANN (the scale path for ann_topk), run at the
    exhaustive-probe contract point: with ``probe_hamming == nbits`` every
    bucket is probed, so the result is PROVABLY equal to brute-force
    ``cosine_topk`` and shares its exact SQL oracle — the full bucketing /
    probe machinery (hyperplane kernel, Hamming bucket filter) still
    executes.  The production pruned-probe setting (recall<1 by design) is
    asserted against brute force in pytest
    (``test_pipeline_ops.test_lsh_topk_recalls_exact_neighbors``,
    ``test_lsh_exhaustive_probe_equals_brute_force``)."""
    from hidden_characters_detector_spark.operators import similarity
    emb = _table(spark, sf_dir, "embeddings")
    out = similarity.lsh_cosine_topk(emb, _ann_query_vec(), k=10, nbits=12,
                                     probe_hamming=12)
    return out.select("vec_id", F.round("cosine", 4).alias("cosine"))


def q_multimodal_features(spark, sf_dir):
    """Multimodal plumbing end-to-end: attach binary media + typed metadata
    to documents, decode to feature vectors inside the Arrow kernel
    (deterministic PORTABLE fake — container ships no codecs, see
    ``multimodal.decode_images``), sample video frames from the metadata,
    aggregate per doc.  Fully oracle-checked: the fake payload/meta/feature
    math is md5-hex + ascii arithmetic that DuckDB reproduces exactly
    (``_o_multimodal_features``), so the frame fan-out count AND the
    decoded feature values are verified value-for-value."""
    from hidden_characters_detector_spark.operators import multimodal
    docs = _table(spark, sf_dir, "documents").select("doc_id")
    media = multimodal.attach_fake_media(docs, kind="video")
    feat = multimodal.decode_images(media, deterministic_fake=True)
    frames = multimodal.sample_frames(feat, every_n=24)
    # n * first(feat0) rather than sum(feat0): every sampled frame of a doc
    # carries the same decoded features, and the oracle computes
    # n_sampled_frames * feat0 — repeated fp-addition vs one multiplication
    # can differ in the last ulp, which would flake the 4-decimal rounding
    # right at a boundary; evaluating the identical expression cannot
    return (frames.groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_sampled_frames"),
                 F.round(F.count("*")
                         * F.first(F.element_at("img_features", 1)), 4)
                 .alias("feat0_sum"))
            .orderBy("doc_id").limit(200))


def _o_multimodal_features(out_dim: int = 8, every_n: int = 24,
                           seed: int = 42):
    # the fake payload is the utf8 bytes of md5(doc_id || '|seed'), so
    # byte k of the payload == ascii(substr(hex, k+1, 1)); features are
    # 4-byte big-endian ints centered mod 65536, unit-normalized with
    # left-associative accumulation — replicated here term by term
    def a(k):  # ascii code of payload byte k (0-based)
        return f"ascii(substr(hx, {k + 1}, 1))"

    raws = [f"((({a(4 * j)} * 256 + {a(4 * j + 1)}) * 256 "
            f"+ {a(4 * j + 2)}) * 256 + {a(4 * j + 3)})"
            for j in range(out_dim)]
    vs = [f"(CAST({r} % 65536 AS DOUBLE) - 32768.0)" for r in raws]
    norm = vs[0] + " * " + vs[0]
    for v in vs[1:]:
        norm = f"({norm} + {v} * {v})"
    return f"""
    WITH m AS (
      SELECT doc_id,
             md5(CAST(doc_id AS VARCHAR) || '|{seed}') AS hx
      FROM documents),
    d AS (
      SELECT doc_id,
             ({a(0)} * 256 + {a(1)}) % 240 + 1 AS n_frames,
             {vs[0]} / (CASE WHEN sqrt({norm}) = 0 THEN 1.0
                             ELSE sqrt({norm}) END) AS feat0
      FROM m)
    SELECT doc_id,
           CAST((n_frames - 1) // {every_n} + 1 AS BIGINT)
               AS n_sampled_frames,
           round(((n_frames - 1) // {every_n} + 1) * feat0, 4) AS feat0_sum
    FROM d ORDER BY doc_id LIMIT 200"""


# portable SQL (identical in Spark SQL and DuckDB): plant PII into a
# deterministic subset of docs so redaction is non-vacuous
_PII_EXPR = ("(CASE WHEN doc_id % 5 = 0 THEN text || ' contact user'"
             " || cast(doc_id as string) || '@example.com at 192.168.'"
             " || cast(doc_id % 256 as string) || '.7 or +1 (555) 123-45'"
             " || cast(doc_id % 90 + 10 as string) ELSE text END)")


def q_redact_pii(spark, sf_dir):
    """PII redaction (emails / IPv4 / phone-ish runs) with audit counts —
    JVM regexp_replace only, patterns shared verbatim with the oracle."""
    from hidden_characters_detector_spark.operators import text_analysis
    docs = _table(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_PII_EXPR} AS text")
    return text_analysis.redact_pii(docs).select(
        "doc_id", "n_email", "n_ipv4", "n_phone", "text_redacted")


def _o_redact_pii():
    from hidden_characters_detector_spark.operators.text_analysis import (
        PII_PATTERNS)
    red = "text"
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            f"CAST(len(regexp_extract_all(text, {osql.q(pat)})) AS BIGINT)"
            f" AS n_{name}")
        red = f"regexp_replace({red}, {osql.q(pat)}, {osql.q(repl)}, 'g')"
    return f"""
    WITH planted AS (SELECT doc_id, {_PII_EXPR} AS text FROM documents)
    SELECT doc_id, {', '.join(counts)}, {red} AS text_redacted
    FROM planted"""


def q_ngram_topk(spark, sf_dir):
    """Corpus-level top-20 word bigrams (explode -> count -> sort-limit,
    the heavy-shuffle aggregate shape with map-side partials)."""
    from hidden_characters_detector_spark.operators import text_analysis
    docs = _table(spark, sf_dir, "documents").select("text")
    return text_analysis.top_ngrams(docs, n=2, k=20)


def _o_ngram_topk():
    return """
    WITH w AS (
      SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS ws
      FROM documents),
    g AS (
      SELECT ws[CAST(t.i AS INTEGER)] || ' ' || ws[CAST(t.i + 1 AS INTEGER)]
                 AS ngram
      FROM w, unnest(range(1, len(ws))) AS t(i)
      WHERE len(ws) >= 2)
    SELECT ngram, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM g GROUP BY ngram ORDER BY n_occurrences DESC, ngram LIMIT 20"""


# =========================================================================
# J3 batch analog: detections ⋈ versioned confusable dictionary (interval
# join) — the stream-stream join's semantics under the driver's hash gate
# =========================================================================
_DICT_T0 = "2024-01-01 00:00:00"


def q_dict_join(spark, sf_dir):
    """Batch analog of the stateful stream-stream confusable-dict join
    (``streaming.pipeline.confusable_dict_join``, SURVEY §2.3; dict tables
    seeded from ref :255-406): detection events with planted event times ⋈
    a VERSIONED dictionary on ``token = marker_cp AND event_time ∈
    [valid_from, valid_from + 1h)``.  Validity windows are non-vacuous by
    construction (``sources.confusable_dict.versioned_offsets``): a retired
    version-0 rule must never match, early events match only version 1,
    later events match versions 1 AND 2 — the oracle checks every matched
    (event, version) pair and the joined dictionary payload."""
    from hidden_characters_detector_spark.sources import confusable_dict
    from hidden_characters_detector_spark.streaming import pipeline as sp
    _utc(spark)
    ev = document_events(_marked(spark, sf_dir), text_col="marked",
                         keep=["doc_id"],
                         event_cols=["idx", "token", "marker_type"])
    # deterministic event time: T0 + (doc_id % 30) minutes, in-SQL so both
    # engines derive it identically
    ev = ev.withColumn(
        "event_time",
        F.expr(f"timestamp'{_DICT_T0}' "
               "+ make_interval(0, 0, 0, 0, 0, cast(doc_id % 30 as int), "
               "0)"))
    dc = confusable_dict.versioned_dict(spark, _DICT_T0)
    out = sp.confusable_dict_join_batch(ev, dc, validity="1 hour")
    return out.select(
        "doc_id", F.col("idx").cast("long").alias("idx"),
        F.col("token").cast("long").alias("token"),
        F.col("dict_marker_type").alias("marker_type"),
        F.col("version").cast("long").alias("version"), "repl_str")


def _o_timed_events_cte() -> str:
    """``WITH ev`` body shared by the dict-join oracles: every marker
    occurrence with its planted event minute (T0 + doc_id % 30)."""
    return f"""
      SELECT doc_id, CAST(t.i - 1 AS BIGINT) AS idx,
             CAST(unicode(substr(marked, CAST(t.i AS INTEGER), 1)) AS BIGINT)
                 AS token,
             doc_id % 30 AS ev_min
      FROM {osql.marked_docs_sql(DUCKDB)} m,
           unnest(range(1, length(marked) + 1)) AS t(i)
      WHERE regexp_matches(substr(marked, CAST(t.i AS INTEGER), 1),
                           {osql.q(osql.HIDDEN_CLASS)})
         OR regexp_matches(substr(marked, CAST(t.i AS INTEGER), 1),
                           {osql.q(osql.IVS_CLASS)})
         OR regexp_matches(substr(marked, CAST(t.i AS INTEGER), 1),
                           {osql.q(osql.TYPO_CLASS)})"""


def _dict_values_sql() -> str:
    """The versioned dictionary as a VALUES literal, generated from the
    same Python schedule the Spark side uses."""
    from hidden_characters_detector_spark.sources import confusable_dict

    rows = []
    for cp, repl, mt in confusable_dict.base_rules():
        for v, off in confusable_dict.versioned_offsets(cp):
            rs = confusable_dict.repl_str(repl, v)
            rows.append(f"({cp}, {osql.q(rs)}, {osql.q(mt)}, {off}, {v})")
    return ("(VALUES " + ", ".join(rows)
            + ") AS d(cp, repl_str, marker_type, off_min, version)")


def _o_dict_join():
    return f"""
    WITH ev AS ({_o_timed_events_cte()})
    SELECT ev.doc_id, ev.idx, ev.token, d.marker_type,
           CAST(d.version AS BIGINT) AS version, d.repl_str
    FROM ev JOIN {_dict_values_sql()}
      ON ev.token = d.cp
     AND ev.ev_min >= d.off_min AND ev.ev_min < d.off_min + 60"""


def q_dict_asof(spark, sf_dir):
    """As-of (point-in-time) join: each detection event resolves the SINGLE
    dictionary version CURRENT at its event time — the SCD-2 complement of
    ``dict_join``'s all-in-validity interval semantics, run through the
    scale-correct formulation (interval-closing ``lead`` window on the tiny
    dict side, then one broadcast equi-join: the event side never shuffles,
    sorts, or aggregates; ``operators.asof.asof_join_broadcast``).  Exactly
    one row per dict-keyed event: early events resolve the retired v0,
    mid-window v1, post-update v2."""
    from hidden_characters_detector_spark.operators.asof import (
        asof_join_broadcast)
    from hidden_characters_detector_spark.sources import confusable_dict
    _utc(spark)
    ev = document_events(_marked(spark, sf_dir), text_col="marked",
                         keep=["doc_id"],
                         event_cols=["idx", "token", "marker_type"]) \
        .drop("marker_type")
    ev = ev.withColumn(
        "event_time",
        F.expr(f"timestamp'{_DICT_T0}' "
               "+ make_interval(0, 0, 0, 0, 0, cast(doc_id % 30 as int), "
               "0)"))
    dc = confusable_dict.versioned_dict(spark, _DICT_T0).select(
        F.col("marker_cp").alias("token"),
        F.col("marker_type").alias("dict_marker_type"),
        "valid_from", "version", "repl_str")
    out = asof_join_broadcast(ev, dc, on=["token"],
                              left_time="event_time",
                              right_time="valid_from")
    return out.select(
        "doc_id", F.col("idx").cast("long").alias("idx"),
        F.col("token").cast("long").alias("token"),
        F.col("dict_marker_type").alias("marker_type"),
        F.col("version").cast("long").alias("version"), "repl_str")


def _o_dict_asof():
    return f"""
    WITH ev AS ({_o_timed_events_cte()}),
    d AS (
      SELECT cp, repl_str, marker_type, off_min, version,
             lead(off_min) OVER (PARTITION BY cp ORDER BY off_min)
                 AS off_to
      FROM {_dict_values_sql()})
    SELECT ev.doc_id, ev.idx, ev.token, d.marker_type,
           CAST(d.version AS BIGINT) AS version, d.repl_str
    FROM ev JOIN d
      ON ev.token = d.cp
     AND ev.ev_min >= d.off_min
     AND (d.off_to IS NULL OR ev.ev_min < d.off_to)"""


def q_quarantine(spark, sf_dir):
    """Bad-records quarantine gate (S6/unreadable-input analog, ref
    :604-631): documents mutated in portable SQL into a token-table shape
    with planted flaws — null id, empty id, null tokens, null event_time,
    null n_tok, n_tok contradicting the array, and one row violating TWO
    rules (null tokens + null time) so the rule PRECEDENCE (first match
    wins) is under the hash gate too.  The real operator classifies; output
    is the per-reason census a pipeline run reports."""
    from hidden_characters_detector_spark.operators import quarantine as qr
    docs = _table(spark, sf_dir, "documents")
    tok_tbl = docs.selectExpr(
        "CASE WHEN doc_id % 13 = 3 THEN NULL "
        "     WHEN doc_id % 13 = 4 THEN '' "
        "     ELSE cast(doc_id AS string) END AS doc_id",
        "CASE WHEN doc_id % 13 IN (5, 8) THEN NULL "
        "     ELSE array(1, 2) END AS tokens",
        "CASE WHEN doc_id % 13 = 6 THEN 99 "
        "     WHEN doc_id % 13 = 9 THEN NULL ELSE 2 END AS n_tok",
        "source",
        "CASE WHEN doc_id % 13 IN (7, 8) THEN NULL "
        "     ELSE timestamp'2024-01-01 00:00:00' END AS event_time")
    marked = qr.with_quarantine_reason(tok_tbl)
    return (marked
            .groupBy(F.coalesce("quarantine_reason", F.lit("valid"))
                     .alias("quarantine_reason"))
            .agg(F.count("*").cast("long").alias("n_rows")))


def _o_quarantine():
    return """
    WITH t AS (
      SELECT CASE WHEN doc_id % 13 = 3 THEN NULL
                  WHEN doc_id % 13 = 4 THEN ''
                  ELSE CAST(doc_id AS VARCHAR) END AS doc_id2,
             CASE WHEN doc_id % 13 IN (5, 8) THEN NULL
                  ELSE [1, 2] END AS tokens,
             CASE WHEN doc_id % 13 = 6 THEN 99
                  WHEN doc_id % 13 = 9 THEN NULL ELSE 2 END AS n_tok,
             CASE WHEN doc_id % 13 IN (7, 8) THEN NULL
                  ELSE TIMESTAMP '2024-01-01 00:00:00' END AS event_time
      FROM documents),
    r AS (
      -- the operator's CASE chain verbatim (rule order is contractual)
      SELECT CASE WHEN doc_id2 IS NULL OR doc_id2 = '' THEN 'null_doc_id'
                  WHEN tokens IS NULL THEN 'null_tokens'
                  WHEN event_time IS NULL THEN 'null_event_time'
                  WHEN n_tok IS NULL THEN 'null_n_tok'
                  WHEN n_tok <> len(tokens) THEN 'n_tok_mismatch'
                  ELSE 'valid' END AS quarantine_reason
      FROM t)
    SELECT quarantine_reason, CAST(count(*) AS BIGINT) AS n_rows
    FROM r GROUP BY quarantine_reason"""


def q_pack_sequences(spark, sf_dir):
    """Sequence packing census: documents grouped into ~2048-token training
    sequences by the bucketed running-total rule
    (``operators.packing.pack_documents`` — one shuffle on the bucket key +
    a per-bucket sort; the deterministic distributed approximation of
    greedy bin packing).  The oracle replicates the window arithmetic
    verbatim, so bucket assignment, pack boundaries, doc counts, token
    totals, and span endpoints are all under the hash gate."""
    from hidden_characters_detector_spark.operators import packing
    docs = _table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return packing.pack_summary(docs, size_col="n_chars", budget=2048,
                                buckets=16)


def _o_pack_sequences():
    return """
    WITH p AS (
      SELECT doc_id, n_chars, doc_id % 16 AS bucket,
             CAST(COALESCE(SUM(n_chars) OVER (
                    PARTITION BY doc_id % 16 ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING), 0) - n_chars AS BIGINT)
                 AS excl
      FROM documents)
    SELECT bucket, CAST(excl // 2048 AS BIGINT) AS pack_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM p GROUP BY bucket, pack_id"""


def q_padding_waste(spark, sf_dir):
    """Length-bucketed padding census (``operators.packing.padding_waste``
    — the length-grouped-batching profile): docs pad to the smallest
    bucket ≥ their length, overflow truncates to the largest; per-bucket
    docs / tokens / padded slots / waste fraction / truncated tokens.
    Codegen CASE-chain bucket + ≤4-group aggregate; the oracle mirrors
    the chain verbatim."""
    from hidden_characters_detector_spark.operators import packing
    docs = _table(spark, sf_dir, "documents").selectExpr(
        "n_chars AS n_tok")
    return packing.padding_waste(docs, buckets=(64, 128, 256, 512))


def _o_padding_waste():
    return """
    WITH r AS (
      SELECT CASE WHEN n_chars <= 64 THEN 64
                  WHEN n_chars <= 128 THEN 128
                  WHEN n_chars <= 256 THEN 256
                  ELSE 512 END AS bucket,
             n_chars AS n, least(n_chars, 512) AS kept
      FROM documents),
    a AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n) AS BIGINT) AS n_tokens,
             CAST(sum(kept) AS BIGINT) AS kept
      FROM r GROUP BY bucket)
    SELECT CAST(bucket AS BIGINT) AS bucket, n_docs, n_tokens,
           CAST(n_docs * bucket AS BIGINT) AS n_padded_slots,
           round(1.0 - kept / CAST(n_docs * bucket AS DOUBLE), 6)
               AS waste_frac,
           CAST(n_tokens - kept AS BIGINT) AS n_tokens_truncated
    FROM a"""


def q_chunk_tokens(spark, sf_dir):
    """Sliding-window chunking: each doc's token array split into
    128-token windows with 32-token overlap (stride 96), emitted as
    per-chunk scalars (length / sum / endpoints) so the window arithmetic,
    slice bounds, and tail behavior are value-checked without shipping the
    arrays through the compare."""
    from hidden_characters_detector_spark.operators import packing
    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = tokenize(docs)
    chunks = packing.chunk_tokens(tok, chunk=128, overlap=32)
    return chunks.select(
        "doc_id", "chunk_idx", "chunk_start", "n_chunk_tokens",
        F.aggregate("chunk_tokens", F.lit(0).cast("long"),
                    lambda a, x: a + x).alias("chunk_sum"),
        F.element_at("chunk_tokens", 1).cast("long").alias("first_tok"),
        F.element_at("chunk_tokens", -1).cast("long").alias("last_tok"))


def _o_chunk_tokens():
    # stride 96, chunk 128; list_slice is 1-based inclusive; chunk_idx =
    # start // stride (no WITH ORDINALITY in DuckDB)
    return """
    WITH tok AS (
      SELECT doc_id,
             list_transform(range(1, length(text) + 1),
                 i -> unicode(substr(text, CAST(i AS INTEGER), 1))) AS ts,
             length(text) AS n
      FROM documents WHERE length(text) > 0),
    st AS (
      SELECT doc_id, ts, n, CAST(s.s AS BIGINT) AS chunk_start
      FROM tok, unnest(range(0,
             CAST(greatest(ceil((n - 128) / 96.0), 0) AS BIGINT) * 96 + 1,
             96)) AS s(s)),
    c AS (
      SELECT doc_id, chunk_start // 96 AS chunk_idx, chunk_start,
             list_slice(ts, chunk_start + 1, chunk_start + 128) AS ck
      FROM st)
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, chunk_start,
           CAST(len(ck) AS BIGINT) AS n_chunk_tokens,
           CAST(list_sum(ck) AS BIGINT) AS chunk_sum,
           CAST(ck[1] AS BIGINT) AS first_tok,
           CAST(ck[-1] AS BIGINT) AS last_tok
    FROM c"""


# shared line-dedup fixture: documents made multiline with PLANTED
# cross-document boilerplate — a header shared by each doc_id%4 class and a
# footer shared by every doc — plus body lines from the corpus text (some
# of which repeat naturally across template-reuse docs; the oracle counts
# the same normalized lines, so both engines agree on all of them)
_LINE_DEDUP_TEXT_SPARK = (
    "concat('template header v', doc_id % 4, char(10), "
    "replace(text, ' the ', char(10)), char(10), "
    "'auto-generated corpus footer')")
_LINE_DEDUP_TEXT_DUCK = (
    "'template header v' || (doc_id % 4) || chr(10) || "
    "replace(text, ' the ', chr(10)) || chr(10) || "
    "'auto-generated corpus footer'")


def q_line_dedup(spark, sf_dir):
    """Cross-document line dedup (the C4/RefinedWeb boilerplate-removal
    step, ``operators.line_dedup.dedup_lines``): lines repeated across ≥5
    distinct docs are dropped and each doc's text rebuilt from the
    survivors.  The engine counts 64-bit hashes of normalized lines (only
    the hash rides the counting shuffle; membership probe is a broadcast
    join — plan-asserted in ``tests/test_line_dedup.py``); the oracle
    counts the normalized line strings themselves — equivalent absent
    hash collisions, which the fixture cannot produce."""
    from hidden_characters_detector_spark.operators import line_dedup
    docs = _table(spark, sf_dir, "documents").selectExpr(
        "cast(doc_id as string) AS doc_id",
        f"{_LINE_DEDUP_TEXT_SPARK} AS text")
    return line_dedup.dedup_lines(docs, min_docs=5)


def _o_line_dedup():
    return f"""
    WITH m AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id,
             {_LINE_DEDUP_TEXT_DUCK} AS text
      FROM documents),
    l AS (
      SELECT doc_id, ls[CAST(i AS INTEGER)] AS line, CAST(i AS BIGINT) AS ln
      FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM m),
           unnest(range(1, len(ls) + 1)) AS t(i)),
    e AS (SELECT doc_id, ln, line, trim(line) AS norm FROM l),
    freq AS (
      SELECT norm FROM e WHERE length(norm) >= 1
      GROUP BY norm HAVING count(DISTINCT doc_id) >= 5),
    f AS (
      SELECT e.doc_id, e.ln, e.line, (freq.norm IS NOT NULL) AS dropped
      FROM e LEFT JOIN freq ON e.norm = freq.norm)
    SELECT doc_id,
           COALESCE(string_agg(CASE WHEN NOT dropped THEN line END,
                               chr(10) ORDER BY ln), '') AS text_dedup,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN dropped THEN 0 ELSE 1 END) AS BIGINT)
               AS n_lines_kept,
           CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT)
               AS n_lines_dropped
    FROM f GROUP BY doc_id"""


def q_line_dedup_within(spark, sf_dir):
    """WITHIN-document duplicate-line removal
    (``operators.line_dedup.dedup_lines_within``): first occurrence of
    each normalized line kept, later repeats dropped, blank lines exempt
    — zero-shuffle JVM HOFs.  Fixture: the multiline docs with every
    third doc's header line repeated at the end, so drops are
    non-vacuous; the oracle mirrors the first-occurrence probe with
    DuckDB's indexed list_filter."""
    from hidden_characters_detector_spark.operators import line_dedup
    docs = _table(spark, sf_dir, "documents").selectExpr(
        "cast(doc_id as string) AS doc_id",
        f"concat({_LINE_DEDUP_TEXT_SPARK}, "
        "CASE WHEN doc_id % 3 = 0 THEN concat(char(10), "
        "'template header v', doc_id % 4) ELSE '' END) AS text")
    return line_dedup.dedup_lines_within(docs).select(
        "doc_id", "text_dedup", "n_lines", "n_lines_dropped")


def _o_line_dedup_within():
    return f"""
    WITH m AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id,
             {_LINE_DEDUP_TEXT_DUCK} ||
             CASE WHEN doc_id % 3 = 0
                  THEN chr(10) || 'template header v' || (doc_id % 4)
                  ELSE '' END AS text
      FROM documents),
    b AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM m),
    k AS (
      SELECT doc_id, ls,
             list_filter(ls, (x, i) ->
                 length(trim(x)) < 1
                 OR list_position(list_transform(ls, y -> trim(y)),
                                  trim(x)) = i) AS kept
      FROM b)
    SELECT doc_id, array_to_string(kept, chr(10)) AS text_dedup,
           CAST(len(ls) AS BIGINT) AS n_lines,
           CAST(len(ls) - len(kept) AS BIGINT) AS n_lines_dropped
    FROM k"""


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination audit (``operators.decontam``): the eval
    set is derived deterministically from held-out documents (doc_id % 7
    == 0, first 10 chars dropped — so eval items are verbatim substrings
    of real corpus text), and every training doc sharing any char-20-gram
    with it is reported with its distinct-shared-shingle count.  The
    oracle replicates the rolling shingle hash itself (same Horner/2^64
    arithmetic as the minhash oracle) and the distinct-count join, so
    n_hits is value-checked, not just row-counted.  Plan: broadcast
    semi-join, no cartesian (``tests/test_decontam.py``)."""
    from hidden_characters_detector_spark.operators import decontam
    docs = _table(spark, sf_dir, "documents")
    train = docs.where("doc_id % 7 <> 0").selectExpr(
        "cast(doc_id as string) AS doc_id", "text")
    evl = docs.where("doc_id % 7 = 0").selectExpr(
        "cast(doc_id as string) AS doc_id", "substr(text, 11) AS text")
    return decontam.contamination_report(train, evl, k=20)


def _o_decontaminate(k: int = 20):
    h = _o_shingle_hash_expr(k)
    return f"""
    WITH train AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
      WHERE doc_id % 7 <> 0),
    ev AS (SELECT substr(text, 11) AS text FROM documents
           WHERE doc_id % 7 = 0),
    th AS (
      SELECT DISTINCT doc_id, {h} AS h
      FROM train, unnest(range(1, length(text) - {k - 2})) AS t(i)),
    eh AS (
      SELECT DISTINCT {h} AS h
      FROM ev, unnest(range(1, length(text) - {k - 2})) AS t(i))
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
    FROM th WHERE h IN (SELECT h FROM eh)
    GROUP BY doc_id"""


def _substr_fixture(spark, sf_dir):
    """documents ∪ long-suffix twins: each doc ≥80 chars reappears under
    ``doc_id || 'S'`` with its first 20 chars dropped, so the corpus
    carries guaranteed ≥60-char exact duplicated substrings (plus
    whatever natural template repeats it already has — the oracle
    replicates the algorithm, so both agree by construction)."""
    docs = _table(spark, sf_dir, "documents").selectExpr(
        "cast(doc_id as string) AS doc_id", "text")
    twins = docs.where(F.length("text") >= 80).selectExpr(
        "concat(doc_id, 'S') AS doc_id", "substr(text, 21) AS text")
    return docs.unionByName(twins)


_SUBSTR_FIXTURE_SQL = """
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
      UNION ALL
      SELECT CAST(doc_id AS VARCHAR) || 'S' AS doc_id,
             substr(text, 21) AS text
      FROM documents WHERE length(text) >= 80"""


def _o_substr_spans_cte(k: int = 40, winnow: int = 1) -> str:
    """Shared oracle CTE chain ending in ``spans(doc_id, span_start,
    span_end)`` — replicates :mod:`operators.substr_dedup` verbatim: the
    same Horner/2^64 rolling hash per k-gram start (``list_reduce`` over
    HUGEINT codepoints — acc*B < 2^104 fits), the same
    first-occurrence-in-(doc,pos)-order mark rule (``row_number() >= 2``
    over the hash), the same gaps-and-islands merge of ``[pos, pos+k)``
    covers.  Binary string collation orders doc_id identically in both
    engines.  ``winnow > 1`` inserts the fingerprint-selection CTEs:
    per window of ``w`` consecutive positions (shrinking at the document
    tail, exactly like the kernel), the rightmost position attaining the
    window min — the verdict then runs over selected rows only."""
    if winnow > 1:
        sel = f""",
    wm AS (
      SELECT doc_id, pos AS ws,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW
                          AND {winnow - 1} FOLLOWING) AS wmin
      FROM hs),
    selpos AS (
      SELECT DISTINCT doc_id, pos FROM (
        SELECT wm.doc_id, max(h2.pos) AS pos
        FROM wm JOIN hs h2
          ON h2.doc_id = wm.doc_id
         AND h2.pos BETWEEN wm.ws AND wm.ws + {winnow - 1}
         AND h2.h = wm.wmin
        GROUP BY wm.doc_id, wm.ws)),
    vrows AS (
      SELECT hs.doc_id, hs.pos, hs.h
      FROM hs JOIN selpos USING (doc_id, pos))"""
    else:
        sel = """,
    vrows AS (SELECT doc_id, pos, h FROM hs)"""
    return f"""
    WITH u AS ({_SUBSTR_FIXTURE_SQL}),
    cl AS (
      SELECT doc_id, text,
             list_transform(string_split(text, ''),
                            c -> CAST(unicode(c) AS HUGEINT)) AS cpl
      FROM u),
    hs AS (
      SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
             list_reduce(
               list_slice(cpl, CAST(i AS INTEGER),
                          CAST(i + {k - 1} AS INTEGER)),
               (a, b) -> (a * {_HB} + b) % {_M64}) AS h
      FROM cl, unnest(range(1, len(cpl) - {k - 2})) AS t(i)){sel},
    mk AS (
      SELECT doc_id, pos FROM (
        SELECT doc_id, pos,
               row_number() OVER (PARTITION BY h
                                  ORDER BY doc_id, pos) AS rn
        FROM vrows) WHERE rn >= 2),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos > coalesce(max(pos + {k}) OVER w, -1)
                  THEN 1 ELSE 0 END AS new_isl
      FROM mk
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
    g AS (
      SELECT doc_id, pos,
             sum(new_isl) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS grp
      FROM isl),
    spans AS (
      SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
             CAST(max(pos) + {k} AS BIGINT) AS span_end
      FROM g GROUP BY doc_id, grp)"""


def q_dup_spans(spark, sf_dir):
    """Exact-substring duplicate spans (``operators.substr_dedup``, the
    ExactSubstr family of Lee et al. 2022): maximal spans of every char
    belonging to a repeated ≥40-char substring whose occurrence is not
    the corpus-order first.  Fixture plants long-suffix twins
    (:func:`_substr_fixture`).  The oracle replicates the rolling hash,
    the first-occurrence rule, and the island merge value-for-value."""
    from hidden_characters_detector_spark.operators import substr_dedup
    return substr_dedup.duplicated_spans(_substr_fixture(spark, sf_dir),
                                         k=40)


def _o_dup_spans(k: int = 40):
    return f"""{_o_substr_spans_cte(k)}
    SELECT doc_id, span_start, span_end FROM spans"""


def q_dup_spans_winnowed(spark, sf_dir):
    """The 100-TB scale path of exact-substring dedup: only winnowed
    fingerprints (rightmost-min over every 8-window of consecutive
    40-gram hashes, Schleimer et al. 2003) enter the verdict shuffle —
    ~4.5× less exchange volume, guaranteed detection of every repeat ≥
    47 chars.  The oracle replicates the window selection, the mark
    rule, and the island merge value-for-value."""
    from hidden_characters_detector_spark.operators import substr_dedup
    return substr_dedup.duplicated_spans(_substr_fixture(spark, sf_dir),
                                         k=40, winnow=8)


def _o_dup_spans_winnowed(k: int = 40, w: int = 8):
    return f"""{_o_substr_spans_cte(k, winnow=w)}
    SELECT doc_id, span_start, span_end FROM spans"""


def q_substring_dedup(spark, sf_dir):
    """The cut applied: each document rebuilt with its duplicated spans
    removed (first occurrences kept — a planted twin collapses to empty,
    its parent survives verbatim).  The oracle rebuilds from the
    complement intervals with ordered ``string_agg``."""
    from hidden_characters_detector_spark.operators import substr_dedup
    u = _substr_fixture(spark, sf_dir)
    return substr_dedup.remove_duplicated_spans(u, k=40).select(
        "doc_id", "text_dedup")


def _o_substring_dedup(k: int = 40):
    return f"""{_o_substr_spans_cte(k)},
    sp2 AS (
      SELECT doc_id, span_start,
             coalesce(lag(span_end) OVER (PARTITION BY doc_id
                                          ORDER BY span_start),
                      0) AS prev_end
      FROM spans),
    tails AS (SELECT doc_id, max(span_end) AS s FROM spans
              GROUP BY doc_id),
    pieces AS (
      SELECT doc_id, prev_end AS s, span_start AS e FROM sp2
      UNION ALL
      SELECT t.doc_id, t.s, CAST(length(uu.text) AS BIGINT) AS e
      FROM tails t JOIN u uu USING (doc_id)),
    reb AS (
      SELECT p.doc_id,
             string_agg(substr(uu.text, CAST(p.s + 1 AS INTEGER),
                               CAST(p.e - p.s AS INTEGER)),
                        '' ORDER BY p.s) AS td
      FROM pieces p JOIN u uu USING (doc_id)
      WHERE p.e > p.s GROUP BY p.doc_id)
    SELECT u.doc_id,
           CASE WHEN u.doc_id IN (SELECT doc_id FROM spans)
                THEN coalesce(r.td, '')
                ELSE coalesce(u.text, '') END AS text_dedup
    FROM u LEFT JOIN reb r USING (doc_id)"""


def q_repetition(spark, sf_dir):
    """Gopher-style repetition quality signals
    (``operators.text_analysis.repetition_scores``) over the multiline
    fixture: per-doc duplicate-line fraction, duplicate-line-char
    fraction, and the char share of the most repeated word bigram
    (count×len spec), plus the composite is_repetitive flag.  Line metrics
    are zero-shuffle JVM HOFs; the bigram mode is relational (partial-
    agged (doc, gram) count, narrow join back) — the oracle replicates
    the same arithmetic on lists."""
    from hidden_characters_detector_spark.operators import text_analysis
    # every third doc repeats its header line, so dup_line_frac /
    # dup_line_char_frac are non-vacuous at corpus level too
    docs = _table(spark, sf_dir, "documents").selectExpr(
        "cast(doc_id as string) AS doc_id",
        f"concat({_LINE_DEDUP_TEXT_SPARK}, "
        "CASE WHEN doc_id % 3 = 0 THEN concat(char(10), "
        "'template header v', doc_id % 4) ELSE '' END) AS text")
    return text_analysis.repetition_scores(docs)


def _o_repetition():
    return f"""
    WITH m AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id,
             {_LINE_DEDUP_TEXT_DUCK} ||
             CASE WHEN doc_id % 3 = 0
                  THEN chr(10) || 'template header v' || (doc_id % 4)
                  ELSE '' END AS text
      FROM documents),
    base AS (
      SELECT doc_id, length(text) AS n_chars,
             list_transform(string_split(text, chr(10)), x -> trim(x))
                 AS lsn,
             lower(text) AS lt
      FROM m),
    lm AS (
      SELECT doc_id, n_chars, len(lsn) AS n_lines,
             len(list_distinct(lsn)) AS n_dist,
             COALESCE(list_sum(list_transform(lsn, x -> length(x))), 0)
                 AS sum_all,
             COALESCE(list_sum(list_transform(list_distinct(lsn),
                                              x -> length(x))), 0)
                 AS sum_dist,
             lt
      FROM base),
    words AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lt, '[^a-z0-9]+'),
                         x -> x <> '') AS ws
      FROM base),
    grams AS (
      SELECT doc_id,
             ws[CAST(i AS INTEGER)] || ' ' || ws[CAST(i + 1 AS INTEGER)]
                 AS gram
      FROM words, unnest(range(1, len(ws))) AS t(i)
      WHERE len(ws) >= 2),
    gc AS (SELECT doc_id, gram, count(*) AS cnt FROM grams
           GROUP BY doc_id, gram),
    topg AS (SELECT doc_id, max(cnt * length(gram)) AS top_cover
             FROM gc GROUP BY doc_id),
    j AS (
      SELECT lm.doc_id, CAST(n_chars AS BIGINT) AS n_chars,
             CAST(n_lines AS BIGINT) AS n_lines,
             round((n_lines - n_dist) / CAST(n_lines AS DOUBLE), 6)
                 AS dup_line_frac,
             CASE WHEN sum_all > 0
                  THEN round((sum_all - sum_dist)
                             / CAST(sum_all AS DOUBLE), 6)
                  ELSE 0.0 END AS dup_line_char_frac,
             CASE WHEN n_chars > 0
                  THEN round(COALESCE(top_cover, 0)
                             / CAST(n_chars AS DOUBLE), 6)
                  ELSE 0.0 END AS top_bigram_char_frac
      FROM lm LEFT JOIN topg ON lm.doc_id = topg.doc_id)
    SELECT *,
           (dup_line_frac > 0.30 OR dup_line_char_frac > 0.20
            OR top_bigram_char_frac > 0.20) AS is_repetitive
    FROM j"""


def q_dedup_representatives(spark, sf_dir):
    """Quality-aware keeper election (``dedup.select_representatives``):
    after near-dup grouping, each group keeps its HIGHEST-scoring member
    (score here = text length, so the un-truncated original beats its
    10-chars-shorter twin), ties broken by min id.  The corpus side joins
    the (tiny) groups table via broadcast — plan-asserted in
    tests/test_plans.py.  Oracle: the same recursive-CTE transitive
    closure as ``dedup_groups`` plus the identical max-score/min-id
    election arithmetic."""
    from hidden_characters_detector_spark.operators import dedup
    docs = _mutated_long_docs(spark, sf_dir)
    groups = dedup.dedup_groups(docs, jaccard_threshold=0.85)
    scored = docs.select(
        "doc_id", F.length("text").cast("long").alias("score"))
    return dedup.select_representatives(scored, groups, score_col="score")


def _o_dedup_representatives():
    return """
    WITH RECURSIVE unioned AS MATERIALIZED (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
      UNION ALL
      SELECT doc_id || '000000' AS doc_id, substr(text, 11) AS text
      FROM documents WHERE length(text) >= 200),
    sh AS MATERIALIZED (
      SELECT doc_id,
             list_distinct(list_transform(range(1, length(text) - 3),
                 i -> hash(substr(text, CAST(i AS INTEGER), 5)))) AS s
      FROM unioned),
    p AS MATERIALIZED (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sh a JOIN sh b
        ON a.doc_id < b.doc_id
       AND least(len(a.s), len(b.s)) >= 0.85 * greatest(len(a.s), len(b.s))
       AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
           / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
           >= 0.85),
    edges AS MATERIALIZED (
      SELECT doc_a AS src, doc_b AS dst FROM p
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM p),
    walk(node, reach) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, w.reach FROM edges e JOIN walk w ON e.dst = w.node),
    comp AS (
      SELECT node, min(reach) AS group_id FROM walk GROUP BY node),
    sized AS (
      SELECT group_id, CAST(count(*) AS BIGINT) AS group_size
      FROM comp GROUP BY group_id),
    m AS (
      SELECT c.node AS did, c.group_id, s.group_size,
             CAST(length(u.text) AS BIGINT) AS score
      FROM comp c JOIN sized s USING (group_id)
      JOIN unioned u ON u.doc_id = c.node),
    best AS (SELECT group_id, max(score) AS keep_score
             FROM m GROUP BY group_id)
    SELECT m.group_id, min(m.did) AS keep_id, b.keep_score,
           max(m.group_size) AS group_size
    FROM m JOIN best b USING (group_id)
    WHERE m.score IS NOT DISTINCT FROM b.keep_score
    GROUP BY m.group_id, b.keep_score"""


def q_incremental_dedup(spark, sf_dir):
    """Ingest-batch near-dup probe against a stored signature index
    (``dedup.incremental_near_dups``) — the 100 TB dedup steady state:
    the batch's band rows broadcast against the index, which is never
    reshuffled (plan-asserted).  Fixture: index = the corpus, batch = the
    first-10-chars-dropped twins.  Oracle: the full-algorithm minhash SQL
    (same seeded permutations/banding) restricted to pairs touching ≥1
    batch doc — exactly the operator's contract."""
    from hidden_characters_detector_spark.operators import dedup
    docs = _table(spark, sf_dir, "documents").selectExpr(
        "cast(doc_id as string) AS doc_id", "text")
    new = docs.where(F.length("text") >= 15).selectExpr(
        "concat(doc_id, '000000') AS doc_id", "substr(text, 11) AS text")
    index = dedup.signature_index(docs)
    return dedup.incremental_near_dups(new, index, jaccard_threshold=0.5)


def _o_incremental_dedup():
    return _o_minhash_near_dups(extra_pred=(
        "\n      AND (x.doc_id LIKE '%000000' OR y.doc_id LIKE '%000000')"))


def q_unigram_logprob(spark, sf_dir):
    """CCNet-style unigram LM quality score
    (``text_analysis.unigram_logprob``): per doc the mean bits/word under
    the corpus' own top-100 word-unigram model (true corpus total as
    denominator, OOV floored at 1/total), plus OOV stats.  The model
    lookup is a broadcast join and the per-doc reduce the plan's only
    wide shuffle (plan-asserted).  Cross-engine: per-word bits rounded to
    6 decimals and summed as DECIMAL — exact, order-independent."""
    from hidden_characters_detector_spark.operators import text_analysis
    docs = _table(spark, sf_dir, "documents").selectExpr(
        "cast(doc_id as string) AS doc_id", "text")
    wc = text_analysis.word_counts(docs)
    total = wc.agg(F.sum("cnt")).collect()[0][0] or 1
    model = wc.orderBy(F.col("cnt").desc(), F.col("word").asc()).limit(100)
    return text_analysis.unigram_logprob(docs, model, total_words=total)


def _o_unigram_logprob():
    return """
    WITH docs AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents),
    w AS (
      SELECT doc_id, x AS word
      FROM docs, unnest(list_filter(
          regexp_split_to_array(lower(COALESCE(text, '')), '[^a-z0-9]+'),
          x -> x <> '')) AS t(x)),
    wc AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt
           FROM w GROUP BY word),
    tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM wc),
    model AS (SELECT word, cnt FROM wc
              ORDER BY cnt DESC, word ASC LIMIT 100),
    -- explode_outer analog: every doc keeps a row even with zero words
    j AS (
      SELECT d.doc_id, w.word, m.cnt
      FROM docs d
      LEFT JOIN w ON w.doc_id = d.doc_id
      LEFT JOIN model m ON m.word = w.word),
    pd AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN word IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_words,
             CAST(sum(CASE WHEN word IS NOT NULL AND cnt IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
             CAST(sum(CASE WHEN word IS NOT NULL THEN
                 CAST(round(log2((SELECT total FROM tot))
                            - log2(CAST(COALESCE(cnt, 1) AS DOUBLE)), 6)
                      AS DECIMAL(18,6)) END) AS DOUBLE) AS sb
      FROM j GROUP BY doc_id)
    SELECT doc_id, n_words, n_oov,
           CASE WHEN n_words > 0
                THEN round(n_oov / CAST(n_words AS DOUBLE), 6)
                ELSE 0.0 END AS oov_frac,
           CASE WHEN n_words > 0
                THEN round(sb / CAST(n_words AS DOUBLE), 6)
                ELSE 0.0 END AS bits_per_word
    FROM pd"""


_EXTRA_QUERIES = {
    "line_dedup": q_line_dedup,
    "line_dedup_within": q_line_dedup_within,
    "dup_spans": q_dup_spans,
    "dup_spans_winnowed": q_dup_spans_winnowed,
    "substring_dedup": q_substring_dedup,
    "decontaminate": q_decontaminate,
    "repetition": q_repetition,
    "token_histogram": q_token_histogram,
    "vocab_stats": q_vocab_stats,
    "pack_sequences": q_pack_sequences,
    "padding_waste": q_padding_waste,
    "chunk_tokens": q_chunk_tokens,
    "quarantine": q_quarantine,
    "dict_join": q_dict_join,
    "dict_asof": q_dict_asof,
    "exact_dedup": q_exact_dedup,
    "redact_pii": q_redact_pii,
    "ngram_topk": q_ngram_topk,
    "token_counts": q_token_counts,
    "quality": q_quality,
    "lang_id": q_lang_id,
    "ann_topk": q_ann_topk,
    "ann_topk_lsh": q_ann_topk_lsh,
    "multimodal_features": q_multimodal_features,
    "minhash_near_dups": q_minhash_near_dups,
    "simhash_near_dups": q_simhash_near_dups,
    "embedding_near_dups": q_embedding_near_dups,
    "verified_near_dups": q_verified_near_dups,
    "dedup_groups": q_dedup_groups,
    "dedup_representatives": q_dedup_representatives,
    "incremental_dedup": q_incremental_dedup,
    "unigram_logprob": q_unigram_logprob,
    "fingerprints": q_fingerprints,
    "train_test_split": q_train_test_split,
    "epoch_shuffle": q_epoch_shuffle,
    "temperature_mix": q_temperature_mix,
    "stratified_sample": q_stratified_sample,
    "length_stats": q_length_stats,
}

_EXTRA_ORACLES = {
    "line_dedup": _o_line_dedup,
    "line_dedup_within": _o_line_dedup_within,
    "dup_spans": _o_dup_spans,
    "dup_spans_winnowed": _o_dup_spans_winnowed,
    "substring_dedup": _o_substring_dedup,
    "decontaminate": _o_decontaminate,
    "repetition": _o_repetition,
    "token_histogram": _o_token_histogram,
    "vocab_stats": _o_vocab_stats,
    "pack_sequences": _o_pack_sequences,
    "padding_waste": _o_padding_waste,
    "chunk_tokens": _o_chunk_tokens,
    "quarantine": _o_quarantine,
    "dict_join": _o_dict_join,
    "dict_asof": _o_dict_asof,
    "exact_dedup": _o_exact_dedup,
    "redact_pii": _o_redact_pii,
    "ngram_topk": _o_ngram_topk,
    "token_counts": _o_token_counts,
    "quality": _o_quality,
    "lang_id": _o_lang_id,
    "ann_topk": _o_ann_topk,
    "ann_topk_lsh": _o_ann_topk,  # exhaustive probe == brute force
    "embedding_near_dups": _o_embedding_near_dups,
    "verified_near_dups": _o_verified_near_dups,
    "dedup_groups": _o_dedup_groups,
    "dedup_representatives": _o_dedup_representatives,
    "incremental_dedup": _o_incremental_dedup,
    "unigram_logprob": _o_unigram_logprob,
    "minhash_near_dups": _o_minhash_near_dups,
    "simhash_near_dups": _o_simhash_near_dups,
    "fingerprints": _o_fingerprints,
    "multimodal_features": _o_multimodal_features,
    "train_test_split": _o_train_test_split,
    "epoch_shuffle": _o_epoch_shuffle,
    "temperature_mix": _o_temperature_mix,
    "stratified_sample": _o_stratified_sample,
    "length_stats": _o_length_stats,
}

_BASE_QUERIES = queries


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:  # noqa: F811
    out = dict(_BASE_QUERIES())
    out.update(_EXTRA_QUERIES)
    return out


_BASE_ORACLES = oracle_sql


def oracle_sql() -> dict[str, str]:  # noqa: F811
    out = dict(_BASE_ORACLES())
    for k, fn in _EXTRA_ORACLES.items():
        out[k] = fn()
    return out


# =========================================================================
# remaining SURVEY §2 coverage: A5 status flag, A1 per-line grouping
# =========================================================================
def q_markers_found(spark, sf_dir):
    """A5 status flag (ref :943-948, --fail exit code): corpus-level
    markers-found boolean + counts."""
    agg = _cleaned(spark, sf_dir, keep=[]).agg(
        F.sum(F.col("had_marker").cast("long")).alias("files_with_markers"),
        F.count("*").cast("long").alias("files_processed"))
    return agg.select(
        (F.col("files_with_markers") > 0).alias("markers_found"),
        "files_with_markers", "files_processed")


def _o_markers_found():
    d = osql.detected_expr(DUCKDB, "marked")
    return f"""
    WITH s AS (
      SELECT CAST(sum(CASE WHEN {d} > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS files_with_markers,
             CAST(count(*) AS BIGINT) AS files_processed
      FROM {osql.marked_docs_sql(DUCKDB)} m)
    SELECT files_with_markers > 0 AS markers_found, files_with_markers,
           files_processed FROM s"""


def _multiline_marked(spark, sf_dir):
    """documents with markers AND newlines injected (portable SQL), so the
    per-line machinery (A1 grouping, line_no/idx semantics) is exercised."""
    ml = (f"replace({osql.marked_expr()}, ' the ', ' the' || char(10))")
    return _table(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{ml} AS marked")


def q_line_reports(spark, sf_dir):
    """A1 per-line report grouping (ref :739-746): reports per (doc, line)
    over multiline documents."""
    ev = document_events(_multiline_marked(spark, sf_dir),
                         text_col="marked", keep=["doc_id"])
    return (ev.groupBy("doc_id", "line_no")
            .agg(F.count("*").cast("long").alias("n_reports"))
            .select("doc_id", F.col("line_no").cast("long").alias("line_no"),
                    "n_reports"))


def _o_line_reports():
    d = osql.detected_expr(DUCKDB, "u.line")
    ml = f"replace({osql.marked_expr()}, ' the ', ' the' || chr(10))"
    return f"""
    WITH m AS (SELECT doc_id, string_split({ml}, chr(10)) AS ls
               FROM documents),
    lines AS (
      SELECT doc_id, ls[CAST(t.i AS INTEGER)] AS line, t.i AS ln
      FROM m, unnest(range(1, len(ls) + 1)) AS t(i))
    SELECT doc_id, CAST(ln AS BIGINT) AS line_no,
           CAST({d} AS BIGINT) AS n_reports
    FROM lines u WHERE {d} > 0"""


_EXTRA_QUERIES["markers_found"] = q_markers_found
_EXTRA_QUERIES["line_reports"] = q_line_reports
_EXTRA_ORACLES["markers_found"] = _o_markers_found
_EXTRA_ORACLES["line_reports"] = _o_line_reports


# =========================================================================
# relational breadth: multi-join, window functions, anti-join (SURVEY §2.3/2.5)
# =========================================================================
def q_shipping_priority(spark, sf_dir):
    """3-way join + filtered agg + sort-limit (TPC-H Q3 shape)."""
    c = _table(spark, sf_dir, "customer")
    o = _table(spark, sf_dir, "orders")
    li = _table(spark, sf_dir, "lineitem")
    rev = F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("decimal(18,4)")).cast("double")
    return (c.where(F.col("c_mktsegment") == "BUILDING")
            .join(o, c.c_custkey == o.o_custkey)
            .join(li, o.o_orderkey == li.l_orderkey)
            .where(F.col("l_shipdate") > F.col("o_orderdate"))
            .groupBy("l_orderkey")
            .agg(rev.alias("revenue"),
                 F.count("*").cast("long").alias("n_items"))
            .orderBy(F.desc("revenue"), "l_orderkey").limit(10))


def _o_shipping_priority():
    return """
    SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING' AND l_shipdate > o_orderdate
    GROUP BY l_orderkey
    ORDER BY revenue DESC, l_orderkey LIMIT 10"""


def q_top_users_per_type(spark, sf_dir):
    """Window function (rank within group) over the events table."""
    from pyspark.sql import Window
    ev = _table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type", "user_id").agg(
        F.count("*").cast("long").alias("n_events"))
    w = Window.partitionBy("event_type").orderBy(
        F.desc("n_events"), "user_id")
    return (agg.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= 3)
            .select("event_type", "user_id", "n_events",
                    F.col("rk").cast("long").alias("rk")))


def _o_top_users_per_type():
    return """
    WITH a AS (
      SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY event_type, user_id),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
               ORDER BY n_events DESC, user_id) AS rk FROM a)
    SELECT event_type, user_id, n_events, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= 3"""


def q_customers_without_orders(spark, sf_dir):
    """Anti join (the relational form of P1's exclusion filter)."""
    c = _table(spark, sf_dir, "customer")
    o = _table(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .select("c_custkey", "c_mktsegment"))


def _o_customers_without_orders():
    return """
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)"""


_EXTRA_QUERIES["shipping_priority"] = q_shipping_priority
_EXTRA_QUERIES["top_users_per_type"] = q_top_users_per_type
_EXTRA_QUERIES["customers_without_orders"] = q_customers_without_orders
_EXTRA_ORACLES["shipping_priority"] = _o_shipping_priority
_EXTRA_ORACLES["top_users_per_type"] = _o_top_users_per_type
_EXTRA_ORACLES["customers_without_orders"] = _o_customers_without_orders


# =========================================================================
# composite training-data pipeline: clean -> quality -> lang -> dedup
# =========================================================================
def q_training_pipeline(spark, sf_dir):
    """End-to-end curation pass: strip watermarks (hidden/IVS/homoglyph
    markers, all exactly reversible — the cleaned text is the pristine
    document), score quality on the CLEANED text, keep passable English
    docs, exact-dedup keeping the min doc_id — the composed shape of a real
    training-data pipeline."""
    from pyspark.sql import Window
    from hidden_characters_detector_spark.operators import text_analysis
    wm = _table(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{osql.watermark_marked_expr()} AS marked")
    cleaned = clean_documents(wm, text_col="marked", keep=["doc_id"],
                              emit_text=True).select("doc_id", "text_clean")
    scored = text_analysis.quality_scores(cleaned, text_col="text_clean")
    langed = text_analysis.language_id(scored, text_col="text_clean")
    kept = langed.where((F.col("quality_score") >= 0.9)
                        & (F.col("lang_pred") == "en"))
    w = Window.partitionBy(F.md5(F.col("text_clean").cast("binary"))) \
        .orderBy("doc_id")
    return (kept.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .select("doc_id", "text_clean",
                    F.col("quality_score").cast("double")
                    .alias("quality_score")))


def _o_training_pipeline():
    from hidden_characters_detector_spark.operators.text_analysis import (
        LANG_STOPWORDS)
    clean = osql.clean_expr(DUCKDB, "marked")
    n = "length(text_clean)"
    punct = f"({n} - length(regexp_replace(text_clean, '[^\\w\\s]', '', 'g')))"
    digits = f"({n} - length(regexp_replace(text_clean, '[0-9]', '', 'g')))"
    spaces = f"({n} - length(regexp_replace(text_clean, '[ ]', '', 'g')))"

    def ratio(x):
        return f"round({x} / greatest(CAST({n} AS DOUBLE), 1.0), 6)"

    score = (f"round(1.0"
             f" * (CASE WHEN {n} BETWEEN 50 AND 10000 THEN 1.0 ELSE 0.5 END)"
             f" * (CASE WHEN {ratio(punct)} <= 0.2 THEN 1.0 ELSE 0.6 END)"
             f" * (CASE WHEN {ratio(digits)} <= 0.3 THEN 1.0 ELSE 0.7 END)"
             f" * (CASE WHEN {ratio(spaces)} BETWEEN 0.05 AND 0.4"
             f"      THEN 1.0 ELSE 0.8 END), 6)")
    sw_cols, langs = [], list(LANG_STOPWORDS)
    for lang, words in LANG_STOPWORDS.items():
        lst = ", ".join(osql.q(wd) for wd in words)
        sw_cols.append(
            f"len(list_filter(regexp_split_to_array(lower(text_clean), "
            f"'[^a-zà-ÿ]+'), x -> x IN ({lst}))) AS sw_{lang}")
    best = "greatest(" + ", ".join(f"sw_{la}" for la in langs) + ")"
    case = [f"CASE WHEN {best} <= 0 THEN 'und'"]
    for la in langs:
        case.append(f"WHEN sw_{la} = {best} THEN '{la}'")
    case.append("END AS lang_pred")
    return f"""
    WITH cleaned AS (
      SELECT doc_id, {clean} AS text_clean
      FROM {osql.watermarked_docs_sql(DUCKDB)} m),
    scored AS (
      SELECT doc_id, text_clean, {score} AS quality_score,
             {', '.join(sw_cols)}
      FROM cleaned),
    langed AS (SELECT *, {' '.join(case)} FROM scored),
    kept AS (
      SELECT doc_id, text_clean, CAST(quality_score AS DOUBLE)
                 AS quality_score
      FROM langed WHERE quality_score >= 0.9 AND lang_pred = 'en'),
    dedup AS (
      SELECT *, row_number() OVER (PARTITION BY md5(text_clean)
               ORDER BY doc_id) AS rk FROM kept)
    SELECT doc_id, text_clean, quality_score FROM dedup WHERE rk = 1"""


_EXTRA_QUERIES["training_pipeline"] = q_training_pipeline
_EXTRA_ORACLES["training_pipeline"] = _o_training_pipeline


# =========================================================================
# embedding k-means clustering + SemDeDup (semantic within-cluster dedup)
# =========================================================================
_KM_DIM = 64        # embeddings table vector width
_KM_K = 8           # pinned for the contract rows (auto_k covers scale)
_KM_ITERS = 3       # assignment passes; updates between them


def _o_kmeans_ctes(source_sql: str, *, k: int = _KM_K,
                   iters: int = _KM_ITERS, dim: int = _KM_DIM) -> str:
    """Unrolled Lloyd's-iteration CTE chain replicating
    ``clustering.kmeans_assign`` value-for-value (see that module's
    determinism protocol): 6-decimal coords, min-id init, dim-order
    distance folds (bit-identical to the Arrow kernel's accumulation),
    unrounded argmin with cluster-id tiebreak, decimal-exact centroid
    means, empty clusters keep their previous centroid.  The final
    assignment CTE is ``a{iters}`` (columns vec_id, v, cl)."""
    dist = ("list_reduce(list_transform(list_zip(a.v, c.v), "
            "p -> (p[1]-p[2])*(p[1]-p[2])), (x,y) -> x+y)")
    means = ", ".join(
        f"round(CAST(sum(CAST(v[{j + 1}] AS DECIMAL(28,6))) AS DOUBLE)"
        f" / count(*), 6)" for j in range(dim))
    ctes = [f"base AS ({source_sql})",
            "e AS (SELECT vec_id, list_transform(emb, x -> round(x, 6))"
            " AS v FROM base)",
            f"c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl,"
            f" v FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {k}))"]
    for t in range(1, iters + 1):
        ctes.append(
            f"a{t} AS (SELECT vec_id, v, cl FROM ("
            f"SELECT a.vec_id, a.v, c.cl, row_number() OVER ("
            f"PARTITION BY a.vec_id ORDER BY {dist}, c.cl) AS rn "
            f"FROM e a CROSS JOIN c{t - 1} c) WHERE rn = 1)")
        if t < iters:
            ctes.append(
                f"c{t} AS (SELECT p.cl, coalesce(m.mv, p.v) AS v "
                f"FROM c{t - 1} p LEFT JOIN (SELECT cl, [{means}] AS mv "
                f"FROM a{t} GROUP BY cl) m ON p.cl = m.cl)")
    return ",\n    ".join(ctes)


_KM_PLAIN_SRC = ("SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb "
                 "FROM embeddings")


def q_kmeans_clusters(spark, sf_dir):
    """Lloyd's k-means assignment over the embeddings table (k=8, 3
    assignment passes), hash-matched value-for-value against a DuckDB
    oracle that replicates the iteration chain (``_o_kmeans_ctes``)."""
    from hidden_characters_detector_spark.operators import clustering
    emb = _table(spark, sf_dir, "embeddings")
    assigned, _ = clustering.kmeans_assign(
        emb, k=_KM_K, iters=_KM_ITERS, materialize=False)
    return assigned.select("vec_id", "cluster")


def _o_kmeans_clusters():
    return f"""
    WITH {_o_kmeans_ctes(_KM_PLAIN_SRC)}
    SELECT vec_id, CAST(cl AS INTEGER) AS cluster FROM a{_KM_ITERS}"""


def _semantic_embeddings(spark, sf_dir):
    """embeddings ∪ planted semantic near-dups: every 7th vector gets an
    EXACT duplicate (same coords ⇒ same cluster by the deterministic
    tiebreak, cosine exactly 1) and every 5th a 1.001-scaled sibling
    (cosine 1 up to coordinate rounding; the tiny scale keeps the
    distance geometry near-identical so siblings co-cluster for all but
    hairline-margin points — and the oracle replicates the clustering
    itself, so recall is parity-checked, not assumed)."""
    emb = _table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    near = (emb.where(F.col("vec_id") % 5 == 0)
            .select((F.col("vec_id") + 1000000).alias("vec_id"),
                    F.transform("embedding", lambda x: x * F.lit(1.001))
                    .alias("embedding")))
    dup = (emb.where(F.col("vec_id") % 7 == 0)
           .select((F.col("vec_id") + 2000000).alias("vec_id"), "embedding"))
    return emb.unionByName(near).unionByName(dup)


_KM_PLANTED_SRC = """
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000,
             list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.001)
      FROM embeddings WHERE vec_id % 5 = 0
      UNION ALL
      SELECT vec_id + 2000000, CAST(embedding AS DOUBLE[])
      FROM embeddings WHERE vec_id % 7 = 0"""


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup keep/drop verdict (k-means clusters → within-cluster
    cosine ≥ 0.99 → drop the larger id) over the corpus with planted
    exact + scaled siblings; the oracle replicates clustering, pair
    search and verdict end to end."""
    from hidden_characters_detector_spark.operators import clustering
    return clustering.semantic_dedup(
        _semantic_embeddings(spark, sf_dir), k=_KM_K, iters=_KM_ITERS,
        min_cosine=0.99)


def _o_semantic_dedup():
    dot = ("list_reduce(list_transform(list_zip(a.v, b.v), "
           "p -> p[1]*p[2]), (x,y) -> x+y)")

    def norm(side):
        return (f"sqrt(list_reduce(list_transform({side}.v, x -> x*x), "
                f"(x,y) -> x+y))")

    return f"""
    WITH {_o_kmeans_ctes(_KM_PLANTED_SRC)},
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM a{_KM_ITERS} a JOIN a{_KM_ITERS} b
        ON a.cl = b.cl AND a.vec_id < b.vec_id
      WHERE round({dot} / ({norm('a')} * {norm('b')}), 6) >= 0.99),
    dropped AS (SELECT DISTINCT id_b FROM pairs)
    SELECT a.vec_id, CAST(a.cl AS INTEGER) AS cluster,
           (d.id_b IS NULL) AS kept
    FROM a{_KM_ITERS} a LEFT JOIN dropped d ON a.vec_id = d.id_b"""


_EXTRA_QUERIES["kmeans_clusters"] = q_kmeans_clusters
_EXTRA_QUERIES["semantic_dedup"] = q_semantic_dedup
_EXTRA_ORACLES["kmeans_clusters"] = _o_kmeans_clusters
_EXTRA_ORACLES["semantic_dedup"] = _o_semantic_dedup


_IVF_NPROBE = 3     # partial probe (3 of the 8 lists) — the oracle
#                     replicates the probe ranking, so recall is
#                     parity-checked, not assumed


def q_ann_topk_ivf(spark, sf_dir):
    """IVF ANN (k-means coarse quantizer, FAISS IndexIVFFlat shape):
    exact cosine top-10 over the ``nprobe=3`` of 8 inverted lists whose
    centroids are nearest the query — the data-adaptive complement of
    ``ann_topk_lsh``.  The oracle replicates quantizer training, probe
    ranking and scoring end-to-end (``similarity.ivf_topk``)."""
    from hidden_characters_detector_spark.operators import similarity
    emb = _table(spark, sf_dir, "embeddings")
    out = similarity.ivf_topk(emb, _ann_query_vec(), k=10,
                              n_lists=_KM_K, nprobe=_IVF_NPROBE,
                              iters=_KM_ITERS)
    return out.select("vec_id", F.round("cosine", 4).alias("cosine"))


def _o_ann_topk_ivf():
    vec = "[" + ", ".join(f"{x!r}" for x in _ann_query_vec()) + "]"
    # same dim-order IEEE folds as the kmeans chain: the probe ranking and
    # the scoring reuse the sequential list_reduce accumulation that is
    # bit-identical to the Arrow kernel / JVM aggregate() fold
    dist = ("list_reduce(list_transform(list_zip(qv, c.v), "
            "p -> (p[1]-p[2])*(p[1]-p[2])), (x,y) -> x+y)")
    dot = ("list_reduce(list_transform(list_zip(v, qv), "
           "p -> p[1]*p[2]), (x,y) -> x+y)")
    vnorm = "sqrt(list_reduce(list_transform(v, x -> x*x), (x,y) -> x+y))"
    last_c = _KM_ITERS - 1
    return f"""
    WITH {_o_kmeans_ctes(_KM_PLAIN_SRC)},
    q AS (SELECT CAST({vec} AS DOUBLE[]) AS qv),
    ranked AS (
      SELECT cl, row_number() OVER (ORDER BY {dist}, cl) AS rn
      FROM c{last_c} c, q),
    cand AS (
      SELECT a.vec_id, a.v FROM a{_KM_ITERS} a
      JOIN (SELECT cl FROM ranked WHERE rn <= {_IVF_NPROBE}) p
        ON a.cl = p.cl),
    s AS (
      SELECT vec_id,
             {dot} / ({vnorm} * sqrt(list_dot_product(qv, qv))) AS cos
      FROM cand, q)
    SELECT vec_id, round(round(cos, 6), 4) AS cosine
    FROM s ORDER BY round(cos, 6) DESC, vec_id LIMIT 10"""


_EXTRA_QUERIES["ann_topk_ivf"] = q_ann_topk_ivf
_EXTRA_ORACLES["ann_topk_ivf"] = _o_ann_topk_ivf


def q_ann_batch_ivf(spark, sf_dir):
    """Batch ANN: a query table (every 97th vector) against the IVF
    index — per query, exact cosine top-5 over its 3 nearest inverted
    lists (``similarity.ivf_batch_topk``; cluster-equi join, never
    all-pairs).  The oracle replicates quantizer, per-query probe
    ranking, scoring and ranking end-to-end."""
    from hidden_characters_detector_spark.operators import similarity
    emb = _table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = similarity.ivf_batch_topk(
        emb, queries, k=5, n_lists=_KM_K, nprobe=_IVF_NPROBE,
        iters=_KM_ITERS)
    return out.select("query_id", "vec_id",
                      F.round("cosine", 4).alias("cosine"), "rank")


def _o_ann_batch_ivf():
    dist = ("list_reduce(list_transform(list_zip(qv, c.v), "
            "p -> (p[1]-p[2])*(p[1]-p[2])), (x,y) -> x+y)")
    dot = ("list_reduce(list_transform(list_zip(qv, v), "
           "p -> p[1]*p[2]), (x,y) -> x+y)")
    qn = "sqrt(list_reduce(list_transform(qv, x -> x*x), (x,y) -> x+y))"
    vn = "sqrt(list_reduce(list_transform(v, x -> x*x), (x,y) -> x+y))"
    last_c = _KM_ITERS - 1
    return f"""
    WITH {_o_kmeans_ctes(_KM_PLAIN_SRC)},
    qs AS (
      SELECT vec_id AS query_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> round(x, 6)) AS qv
      FROM embeddings WHERE vec_id % 97 = 0),
    pr AS (
      SELECT query_id, qv, cl,
             row_number() OVER (PARTITION BY query_id
                 ORDER BY {dist}, cl) AS rn
      FROM qs, c{last_c} c),
    cand AS (
      SELECT p.query_id, p.qv, a.vec_id, a.v
      FROM (SELECT query_id, qv, cl FROM pr
            WHERE rn <= {_IVF_NPROBE}) p
      JOIN a{_KM_ITERS} a ON a.cl = p.cl),
    s AS (
      SELECT query_id, vec_id,
             CASE WHEN {qn} * {vn} > 0
                  THEN round({dot} / ({qn} * {vn}), 6) END AS cosine
      FROM cand),
    r AS (
      SELECT query_id, vec_id, cosine,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cosine DESC, vec_id) AS BIGINT) AS "rank"
      FROM s WHERE cosine IS NOT NULL)
    SELECT query_id, vec_id, round(cosine, 4) AS cosine, "rank"
    FROM r WHERE "rank" <= 5"""


_EXTRA_QUERIES["ann_batch_ivf"] = q_ann_batch_ivf
_EXTRA_ORACLES["ann_batch_ivf"] = _o_ann_batch_ivf


def q_tfidf_terms(spark, sf_dir):
    """Per-source characteristic terms by smoothed tf-idf
    (``text_analysis.tfidf_terms``): top-15 words per source ranked by
    ``tf · (ln((1+S)/(1+df)) + 1)`` rounded to 6 decimals — the
    corpus-profiling report behind mixture design.  The oracle replicates
    the word split, both aggregations and the one-op-sequence idf
    arithmetic."""
    from hidden_characters_detector_spark.operators import text_analysis
    docs = _table(spark, sf_dir, "documents")
    return text_analysis.tfidf_terms(docs, top=15)


def _o_tfidf_terms():
    return """
    WITH w AS (
      SELECT source, x AS word
      FROM documents, unnest(list_filter(
          regexp_split_to_array(lower(COALESCE(text, '')), '[^a-z0-9]+'),
          x -> x <> '')) AS t(x)),
    tf AS (SELECT source, word, CAST(count(*) AS BIGINT) AS tf
           FROM w GROUP BY source, word),
    dfq AS (SELECT word, CAST(count(*) AS BIGINT) AS dfc
            FROM tf GROUP BY word),
    s AS (SELECT CAST(count(DISTINCT source) AS DOUBLE) AS ns
          FROM documents),
    scored AS (
      SELECT tf.source, tf.word,
             round(tf.tf * (ln((1.0 + ns) / (1.0 + dfc)) + 1.0), 6)
                 AS tfidf
      FROM tf JOIN dfq ON tf.word = dfq.word, s),
    ranked AS (
      SELECT source, word, tfidf,
             CAST(row_number() OVER (PARTITION BY source
                  ORDER BY tfidf DESC, word) AS BIGINT) AS "rank"
      FROM scored)
    SELECT source, word, tfidf, "rank" FROM ranked WHERE "rank" <= 15"""


_EXTRA_QUERIES["tfidf_terms"] = q_tfidf_terms
_EXTRA_ORACLES["tfidf_terms"] = _o_tfidf_terms


def q_bigram_logprob(spark, sf_dir):
    """Bigram-LM quality score (``text_analysis.bigram_logprob``): mean
    bits/word under a top-200 bigram + top-100 unigram model of the
    corpus itself, conditional ``p(w|prev)`` where modelled, unigram
    backoff with OOV floor elsewhere — one tier up from
    ``unigram_logprob`` toward the CCNet KenLM filter.  The oracle
    replicates models, backoff rule and decimal-exact bit sums."""
    from hidden_characters_detector_spark.operators import text_analysis
    docs = _table(spark, sf_dir, "documents").selectExpr(
        "cast(doc_id as string) AS doc_id", "text")
    uni_all = text_analysis.word_counts(docs)
    total = uni_all.agg(F.sum("cnt")).collect()[0][0] or 1
    uni = uni_all.orderBy(F.col("cnt").desc(),
                          F.col("word").asc()).limit(100)
    bi = (text_analysis.word_bigram_counts(docs)
          .orderBy(F.col("cnt").desc(), "word_a", "word_b").limit(200))
    return text_analysis.bigram_logprob(docs, uni, bi,
                                        total_words=int(total))


def _o_bigram_logprob():
    return """
    WITH docs AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents),
    w AS (
      SELECT doc_id, list_filter(
          regexp_split_to_array(lower(COALESCE(text, '')), '[^a-z0-9]+'),
          x -> x <> '') AS ws
      FROM docs),
    pw AS (
      SELECT doc_id, ws[CAST(i AS INTEGER)] AS word,
             CASE WHEN i > 1 THEN ws[CAST(i AS INTEGER) - 1] END AS prev
      FROM w, unnest(range(1, len(ws) + 1)) AS u(i)),
    wc AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt
           FROM pw GROUP BY word),
    tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM wc),
    uni AS (SELECT word, cnt FROM wc ORDER BY cnt DESC, word LIMIT 100),
    bc AS (SELECT prev AS word_a, word AS word_b,
                  CAST(count(*) AS BIGINT) AS cnt
           FROM pw WHERE prev IS NOT NULL GROUP BY prev, word),
    bi AS (SELECT word_a, word_b, cnt FROM bc
           ORDER BY cnt DESC, word_a, word_b LIMIT 200),
    j AS (
      SELECT d.doc_id, p.word,
             b.cnt AS bcnt, up.cnt AS pcnt, uw.cnt AS ucnt
      FROM docs d
      LEFT JOIN pw p ON p.doc_id = d.doc_id
      LEFT JOIN bi b ON b.word_a = p.prev AND b.word_b = p.word
      LEFT JOIN uni up ON up.word = p.prev
      LEFT JOIN uni uw ON uw.word = p.word),
    pd AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN word IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_words,
             CAST(sum(CASE WHEN word IS NOT NULL AND bcnt IS NOT NULL
                           AND pcnt IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_bigram_hits,
             CAST(sum(CASE WHEN word IS NOT NULL THEN
                 CAST(round(CASE WHEN bcnt IS NOT NULL
                                 AND pcnt IS NOT NULL
                      THEN log2(CAST(pcnt AS DOUBLE))
                           - log2(CAST(bcnt AS DOUBLE))
                      ELSE log2((SELECT total FROM tot))
                           - log2(CAST(COALESCE(ucnt, 1) AS DOUBLE))
                      END, 6) AS DECIMAL(18,6)) END) AS DOUBLE) AS sb
      FROM j GROUP BY doc_id)
    SELECT doc_id, n_words, n_bigram_hits,
           CASE WHEN n_words > 0
                THEN round(sb / CAST(n_words AS DOUBLE), 6)
                ELSE 0.0 END AS bits_per_word
    FROM pd"""


_EXTRA_QUERIES["bigram_logprob"] = q_bigram_logprob
_EXTRA_ORACLES["bigram_logprob"] = _o_bigram_logprob


def q_source_overlap(spark, sf_dir):
    """Cross-source exact-duplicate overlap matrix
    (``dedup.cross_source_overlap``) over the corpus plus deterministic
    mirror slices (every 5th doc re-labelled ``mirror_<doc_id mod 3>``),
    so the matrix has planted cross-source mass on top of whatever
    natural cross-source dups exist — both replicated in the oracle."""
    from hidden_characters_detector_spark.operators import dedup
    docs = _table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source")
    mirror = (docs.where(F.col("doc_id") % 5 == 0)
              .select((F.col("doc_id") + 1000000).alias("doc_id"), "text",
                      F.concat(F.lit("mirror_"),
                               (F.col("doc_id") % 3).cast("string"))
                      .alias("source")))
    return dedup.cross_source_overlap(docs.unionByName(mirror))


def _o_source_overlap():
    return """
    WITH corpus AS (
      SELECT doc_id, text, source FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text,
             'mirror_' || CAST(doc_id % 3 AS VARCHAR)
      FROM documents WHERE doc_id % 5 = 0),
    per AS (
      SELECT md5(COALESCE(text, '')) AS h, source,
             CAST(count(*) AS BIGINT) AS n
      FROM corpus GROUP BY 1, 2),
    p AS (
      SELECT a.source AS source_a, b.source AS source_b,
             a.n AS na, b.n AS nb
      FROM per a JOIN per b ON a.h = b.h AND a.source < b.source)
    SELECT source_a, source_b,
           CAST(count(*) AS BIGINT) AS n_shared_texts,
           CAST(sum(na * nb) AS BIGINT) AS n_doc_pairs
    FROM p GROUP BY source_a, source_b"""


_EXTRA_QUERIES["source_overlap"] = q_source_overlap
_EXTRA_ORACLES["source_overlap"] = _o_source_overlap


def q_eval_contamination(spark, sf_dir):
    """Eval-side contamination audit (``decontam.eval_contamination``):
    same train/eval fixture as ``decontaminate`` but reported per EVAL
    item — distinct shingles, leaked shingles, sharing train docs and
    leak fraction (every eval item emits a row).  The oracle replicates
    the rolling shingle hash and both distinct counts."""
    from hidden_characters_detector_spark.operators import decontam
    docs = _table(spark, sf_dir, "documents")
    train = docs.where("doc_id % 7 <> 0").selectExpr(
        "cast(doc_id as string) AS doc_id", "text")
    evl = docs.where("doc_id % 7 = 0").selectExpr(
        "cast(doc_id as string) AS doc_id", "substr(text, 11) AS text")
    return decontam.eval_contamination(train, evl, k=20)


def _o_eval_contamination(k: int = 20):
    h = _o_shingle_hash_expr(k)
    return f"""
    WITH train AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
      WHERE doc_id % 7 <> 0),
    ev AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                  substr(text, 11) AS text
           FROM documents WHERE doc_id % 7 = 0),
    th AS (
      SELECT DISTINCT doc_id AS train_id, {h} AS h
      FROM train, unnest(range(1, length(text) - {k - 2})) AS t(i)),
    eh AS (
      SELECT DISTINCT doc_id, {h} AS h
      FROM ev, unnest(range(1, length(text) - {k - 2})) AS t(i)),
    base AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
             FROM eh GROUP BY doc_id),
    m AS (SELECT e.doc_id, e.h, t.train_id
          FROM eh e JOIN th t ON e.h = t.h),
    hits AS (
      SELECT doc_id,
             CAST(count(DISTINCT h) AS BIGINT) AS n_leaked,
             CAST(count(DISTINCT train_id) AS BIGINT) AS n_train_docs
      FROM m GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(b.n_shingles, 0) AS n_shingles,
           COALESCE(hi.n_leaked, 0) AS n_leaked,
           COALESCE(hi.n_train_docs, 0) AS n_train_docs,
           CASE WHEN COALESCE(b.n_shingles, 0) > 0
                THEN round(COALESCE(hi.n_leaked, 0)
                           / CAST(b.n_shingles AS DOUBLE), 6)
                ELSE 0.0 END AS leak_frac
    FROM (SELECT DISTINCT doc_id FROM ev) d
    LEFT JOIN base b ON b.doc_id = d.doc_id
    LEFT JOIN hits hi ON hi.doc_id = d.doc_id"""


_EXTRA_QUERIES["eval_contamination"] = q_eval_contamination
_EXTRA_ORACLES["eval_contamination"] = _o_eval_contamination


def q_containment_pairs(spark, sf_dir):
    """Asymmetric containment near-dups (``dedup.containment_pairs``)
    over the corpus plus planted quoted chunks (every 9th doc's chars
    31–150 as a new 'C'-suffixed doc — fully contained, Jaccard-invisible
    at ~0.2).  Hot shingles (df > 20) are excluded from the pair join;
    the oracle replicates hash, cap, counts and the lower-bound
    containment arithmetic."""
    from hidden_characters_detector_spark.operators import dedup
    docs_raw = _table(spark, sf_dir, "documents")
    base = docs_raw.selectExpr("cast(doc_id as string) AS doc_id", "text")
    chunks = docs_raw.where("doc_id % 9 = 0 AND length(text) >= 160") \
        .selectExpr("concat(cast(doc_id as string), 'C') AS doc_id",
                    "substr(text, 31, 120) AS text")
    return dedup.containment_pairs(base.unionByName(chunks), k=20,
                                   min_containment=0.5,
                                   max_shingle_df=20)


def _o_containment_pairs(k: int = 20):
    h = _o_shingle_hash_expr(k)
    cont = "round(n_shared / CAST(least(sa.n, sb.n) AS DOUBLE), 6)"
    return f"""
    WITH corpus AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
      UNION ALL
      SELECT CAST(doc_id AS VARCHAR) || 'C', substr(text, 31, 120)
      FROM documents WHERE doc_id % 9 = 0 AND length(text) >= 160),
    sh AS (
      SELECT DISTINCT doc_id, {h} AS h
      FROM corpus, unnest(range(1, length(text) - {k - 2})) AS t(i)),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
              FROM sh GROUP BY doc_id),
    kept AS (SELECT h FROM (SELECT h, count(*) AS d FROM sh GROUP BY h)
             WHERE d >= 2 AND d <= 20),
    s2 AS (SELECT doc_id, h FROM sh WHERE h IN (SELECT h FROM kept)),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM s2 a JOIN s2 b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b, n_shared, {cont} AS containment
    FROM p JOIN sizes sa ON sa.doc_id = p.doc_a
           JOIN sizes sb ON sb.doc_id = p.doc_b
    WHERE {cont} >= 0.5"""


_EXTRA_QUERIES["containment_pairs"] = q_containment_pairs
_EXTRA_ORACLES["containment_pairs"] = _o_containment_pairs


# =========================================================================
# DSIR importance resampling (target-domain upweighting)
# =========================================================================
_DSIR_SALT = "dsir"
_DSIR_K = 25
_LN2_LIT = "0.6931471805599453"   # repr(math.log(2.0)) — embedded so both
#                                   engines use the identical double


def _dsir_inputs(spark, sf_dir):
    """(docs, target_model, raw_model, target_total, raw_total): the
    target domain is the corpus' own wiki slice — deterministic, no
    external data — and both models are top-100 word heads with TRUE
    totals (the un-truncated denominators, mirroring unigram_logprob)."""
    from hidden_characters_detector_spark.operators import text_analysis
    docs = _table(spark, sf_dir, "documents").selectExpr(
        "cast(doc_id as string) AS doc_id", "text", "source")
    def head(wc):
        total = wc.agg(F.sum("cnt")).collect()[0][0] or 1
        return (wc.orderBy(F.col("cnt").desc(), F.col("word").asc())
                .limit(100), int(total))
    target, t_tot = head(text_analysis.word_counts(
        docs.where(F.col("source") == "wiki")))
    raw, r_tot = head(text_analysis.word_counts(docs))
    return docs.select("doc_id", "text"), target, raw, t_tot, r_tot


def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights (``importance.log2_ratio_weights``): per
    doc the log2 likelihood ratio of its words under a target-domain
    (wiki-slice) unigram model vs the raw-corpus model — the ranking
    signal of importance resampling.  Model lookups are broadcast; the
    per-doc reduce is the only wide shuffle (plan-asserted); per-word
    ratios are rounded to 6 decimals and summed as DECIMAL (exact,
    order-independent — the unigram_logprob protocol)."""
    from hidden_characters_detector_spark.operators import importance
    docs, target, raw, t_tot, r_tot = _dsir_inputs(spark, sf_dir)
    return importance.log2_ratio_weights(
        docs, target, raw, target_total=t_tot, raw_total=r_tot)


def q_dsir_sample(spark, sf_dir):
    """Gumbel-top-k importance resample (``importance.dsir_sample``):
    the k=25 docs ranked by ``ln w + Gumbel`` with the noise a pure
    function of (doc_id, salt) — a without-replacement draw with
    probability ∝ the importance weight, reproducible under any
    partitioning; plans as TakeOrdered (no full sort shuffle)."""
    from hidden_characters_detector_spark.operators import importance
    docs, target, raw, t_tot, r_tot = _dsir_inputs(spark, sf_dir)
    return importance.dsir_sample(
        docs, target, raw, k=_DSIR_K, target_total=t_tot,
        raw_total=r_tot, salt=_DSIR_SALT)


def _o_dsir_weight_ctes() -> str:
    """CTE chain computing (doc_id, n_words, log2_ratio_sum,
    log2_ratio_per_word) — the exact arithmetic replica of
    ``importance.log2_ratio_weights`` over the wiki-target/raw models."""
    return """
    docs AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, text, source
             FROM documents),
    w AS (
      SELECT doc_id, x AS word
      FROM docs, unnest(list_filter(
          regexp_split_to_array(lower(COALESCE(text, '')), '[^a-z0-9]+'),
          x -> x <> '')) AS t(x)),
    tw AS (
      SELECT doc_id, x AS word
      FROM docs, unnest(list_filter(
          regexp_split_to_array(lower(COALESCE(text, '')), '[^a-z0-9]+'),
          x -> x <> '')) AS t(x)
      WHERE source = 'wiki'),
    twc AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt
            FROM tw GROUP BY word),
    rwc AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt
            FROM w GROUP BY word),
    ttot AS (SELECT CAST(COALESCE(sum(cnt), 1) AS DOUBLE) AS total
             FROM twc),
    rtot AS (SELECT CAST(COALESCE(sum(cnt), 1) AS DOUBLE) AS total
             FROM rwc),
    tmodel AS (SELECT word, cnt FROM twc
               ORDER BY cnt DESC, word ASC LIMIT 100),
    rmodel AS (SELECT word, cnt FROM rwc
               ORDER BY cnt DESC, word ASC LIMIT 100),
    j AS (
      SELECT d.doc_id, w.word, tm.cnt AS tc, rm.cnt AS rc
      FROM docs d
      LEFT JOIN w ON w.doc_id = d.doc_id
      LEFT JOIN tmodel tm ON tm.word = w.word
      LEFT JOIN rmodel rm ON rm.word = w.word),
    pd AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN word IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_words,
             CAST(sum(CASE WHEN word IS NOT NULL THEN
                 CAST(round(
                     (log2(CAST(COALESCE(tc, 1) AS DOUBLE))
                      - log2((SELECT total FROM ttot)))
                     - (log2(CAST(COALESCE(rc, 1) AS DOUBLE))
                        - log2((SELECT total FROM rtot))), 6)
                      AS DECIMAL(18,6)) END) AS DOUBLE) AS sb
      FROM j GROUP BY doc_id),
    weights AS (
      SELECT doc_id, n_words,
             round(COALESCE(sb, 0.0), 6) AS log2_ratio_sum,
             CASE WHEN n_words > 0
                  THEN round(COALESCE(sb, 0.0)
                             / CAST(n_words AS DOUBLE), 6)
                  ELSE 0.0 END AS log2_ratio_per_word
      FROM pd)"""


def _o_dsir_weights():
    return f"""
    WITH {_o_dsir_weight_ctes()}
    SELECT doc_id, n_words, log2_ratio_sum, log2_ratio_per_word
    FROM weights"""


def _o_dsir_sample():
    u = _o_hash_unit("doc_id", _DSIR_SALT)
    key = (f"round(log2_ratio_sum * {_LN2_LIT} "
           f"- ln(-ln({u} + 1.0/8589934592.0)), 6)")
    return f"""
    WITH {_o_dsir_weight_ctes()}
    SELECT doc_id, n_words, log2_ratio_sum, log2_ratio_per_word,
           {key} AS sample_key
    FROM weights
    ORDER BY sample_key DESC, doc_id
    LIMIT {_DSIR_K}"""


_EXTRA_QUERIES["dsir_weights"] = q_dsir_weights
_EXTRA_QUERIES["dsir_sample"] = q_dsir_sample
_EXTRA_ORACLES["dsir_weights"] = _o_dsir_weights
_EXTRA_ORACLES["dsir_sample"] = _o_dsir_sample


# =========================================================================
# cross-snapshot Bloom-filter membership (operators/bloom.py)
# =========================================================================
_BLOOM_M, _BLOOM_K = 1 << 14, 5


def q_bloom_dedup(spark, sf_dir):
    """Cross-snapshot dedup membership via a broadcast Bloom filter
    (``operators.bloom``): the history split's text keys compress into an
    m-bit filter in ONE narrow pass (positions explode map-side, each
    partition ships one m/8-byte partial bitset, the driver ORs them — no
    key ever moves), then every document probes the filter JVM-side (the
    bitset rides the plan as a binary literal; the bit test is pure
    codegen, zero shuffle, zero Python).  History rows prove the
    no-false-negative contract (all must probe true); the new split
    exercises the negative/false-positive path.  The oracle replicates
    the md5 double-hashing position arithmetic digit-for-digit and
    evaluates membership against the history's distinct position set —
    equal to the bitset semantics by construction."""
    from hidden_characters_detector_spark.operators import bloom
    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    hist = docs.where(F.col("doc_id") % 10 != 7)
    bits = bloom.bloom_build(hist, "text", m=_BLOOM_M, k=_BLOOM_K)
    out = bloom.bloom_might_contain(docs, bits, "text",
                                    m=_BLOOM_M, k=_BLOOM_K)
    return out.select("doc_id",
                      (F.col("doc_id") % 10 != 7).alias("is_history"),
                      "might_contain")


def _o_hex_fold(hx_expr: str, start: int) -> str:
    """DuckDB replica of ``bloom._hex_fold``: 8 hex digits of a digest
    column folded to BIGINT (the ``_o_hash_unit`` arithmetic, offset-
    parametrized)."""
    def dig(i):
        a = f"ascii(substr({hx_expr}, {i + 1}, 1))"
        return f"(CASE WHEN {a} <= 57 THEN {a} - 48 ELSE {a} - 87 END)"

    v = f"CAST({dig(start)} AS BIGINT)"
    for i in range(start + 1, start + 8):
        v = f"({v} * 16 + {dig(i)})"
    return v


def _o_bloom_dedup():
    h1 = _o_hex_fold("hx", 0)
    h2 = _o_hex_fold("hx", 8)
    return f"""
    WITH kx AS (
      SELECT doc_id, (doc_id % 10 <> 7) AS is_history,
             md5(coalesce(text, '') || '|bloom') AS hx
      FROM documents),
    hh AS (
      SELECT doc_id, is_history, {h1} AS h1, {h2} AS h2 FROM kx),
    pos AS (
      SELECT doc_id, is_history,
             (h1 + CAST(u.i AS BIGINT) * (2 * h2 + 1)) % {_BLOOM_M} AS p
      FROM hh, unnest(range(0, {_BLOOM_K})) AS u(i)),
    hist AS (SELECT DISTINCT p FROM pos WHERE is_history)
    SELECT pos.doc_id, pos.is_history,
           bool_and(hist.p IS NOT NULL) AS might_contain
    FROM pos LEFT JOIN hist ON pos.p = hist.p
    GROUP BY pos.doc_id, pos.is_history"""


_EXTRA_QUERIES["bloom_dedup"] = q_bloom_dedup
_EXTRA_ORACLES["bloom_dedup"] = _o_bloom_dedup


# =========================================================================
# cross-boundary block packing (operators/packing.py::pack_blocks)
# =========================================================================
def q_pack_blocks(spark, sf_dir):
    """GPT-style block packing (``operators.packing.pack_blocks``): every
    doc's tokens concatenate in doc_id order and the stream cuts into
    512-token blocks CROSSING document boundaries — zero padding, only
    the corpus tail block short.  Offsets come from the two-level
    (bucketed) cumsum so no task sorts the corpus; docs explode to one
    row per TOUCHED block; token payload crosses exactly one exchange.
    The oracle replicates the offset arithmetic with a serial window
    cumsum (provably equal to the bucketed decomposition) and the same
    slice bounds, then value-checks per-block scalars (length, doc span,
    token sum, endpoints) so assembly order is under the hash gate."""
    from hidden_characters_detector_spark.operators import packing
    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = tokenize(docs)
    blocks = packing.pack_blocks(tok, block=512)
    return blocks.select(
        "block_id", "n_tokens", "n_docs", "first_doc", "last_doc",
        F.aggregate("tokens", F.lit(0).cast("long"),
                    lambda a, x: a + x).alias("token_sum"),
        F.element_at("tokens", 1).cast("long").alias("first_tok"),
        F.element_at("tokens", -1).cast("long").alias("last_tok"))


def _o_pack_blocks():
    return """
    WITH tok AS (
      SELECT doc_id,
             list_transform(range(1, length(text) + 1),
                 i -> unicode(substr(text, CAST(i AS INTEGER), 1))) AS ts,
             CAST(length(text) AS BIGINT) AS n
      FROM documents WHERE length(text) > 0),
    off AS (
      SELECT doc_id, ts, n,
             CAST(sum(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                  - n AS BIGINT) AS o
      FROM tok),
    sp AS (
      SELECT doc_id, ts, n, o, CAST(b.b AS BIGINT) AS block_id
      FROM off, unnest(range(o // 512, (o + n - 1) // 512 + 1)) AS b(b)),
    sl AS (
      SELECT block_id, doc_id, o,
             list_slice(ts, greatest(block_id * 512 - o, 0) + 1,
                        least((block_id + 1) * 512, o + n) - o) AS ck
      FROM sp),
    g AS (
      SELECT block_id, CAST(count(*) AS BIGINT) AS n_docs,
             min(doc_id) AS first_doc, max(doc_id) AS last_doc,
             flatten(list(ck ORDER BY o)) AS toks
      FROM sl GROUP BY block_id)
    SELECT block_id, CAST(len(toks) AS BIGINT) AS n_tokens, n_docs,
           first_doc, last_doc,
           CAST(list_sum(toks) AS BIGINT) AS token_sum,
           CAST(toks[1] AS BIGINT) AS first_tok,
           CAST(toks[-1] AS BIGINT) AS last_tok
    FROM g"""


_EXTRA_QUERIES["pack_blocks"] = q_pack_blocks
_EXTRA_ORACLES["pack_blocks"] = _o_pack_blocks


# =========================================================================
# BPE merge-pair counting (operators/text_analysis.py::pair_counts)
# =========================================================================
def q_bpe_pairs(spark, sf_dir):
    """Distributed BPE merge-candidate selection
    (``text_analysis.top_pairs``): the corpus's 50 most frequent adjacent
    token pairs — the counting half of a BPE vocabulary-learning round.
    Pairs build from two shifted slices via ``zip_with`` (JVM HOFs, no
    Python), partial-aggregate before the single pair shuffle (exchange
    bounded by the live bigram set, not the corpus), and the top-k plans
    as TakeOrdered with a deterministic (count desc, a, b) tiebreak so
    the cutoff is stable across engines."""
    from hidden_characters_detector_spark.operators import text_analysis
    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = tokenize(docs)
    return text_analysis.top_pairs(tok, k=50).select(
        F.col("token_a").cast("long").alias("token_a"),
        F.col("token_b").cast("long").alias("token_b"),
        "n_occurrences")


def _o_bpe_pairs():
    return """
    WITH tok AS (
      SELECT list_transform(range(1, length(text) + 1),
                 i -> unicode(substr(text, CAST(i AS INTEGER), 1))) AS ts,
             CAST(length(text) AS BIGINT) AS n
      FROM documents WHERE length(text) >= 2),
    p AS (
      SELECT ts[CAST(i AS INTEGER)] AS a, ts[CAST(i AS INTEGER) + 1] AS b
      FROM tok, unnest(range(1, n)) AS u(i))
    SELECT CAST(a AS BIGINT) AS token_a, CAST(b AS BIGINT) AS token_b,
           CAST(count(*) AS BIGINT) AS n_occurrences
    FROM p GROUP BY a, b
    ORDER BY n_occurrences DESC, a, b
    LIMIT 50"""


_EXTRA_QUERIES["bpe_pairs"] = q_bpe_pairs
_EXTRA_ORACLES["bpe_pairs"] = _o_bpe_pairs
