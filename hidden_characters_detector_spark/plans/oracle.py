"""Dialect-aware SQL fragments shared by the Spark queries and DuckDB oracles.

The driver cross-checks every ``queries()`` entry against ``oracle_sql()`` on
the same parquet tables.  Two needs:

* **marker injection** must be *identical* in both engines, so it is written
  once here as portable SQL (``replace``/``translate``/``CASE``/``||`` behave
  the same in Spark SQL and DuckDB) and applied to ``documents.text``;
* **cleaning/count oracles** re-express the reference semantics
  (hidden-removal precedence, live-replacement chain, count rules — SURVEY.md
  §2.2) in plain SQL.  Dialect differences are confined to
  ``regexp_replace`` (DuckDB needs an explicit ``'g'`` flag).

Replacement-chain safety: every live replacement maps a non-ASCII marker to
ASCII output, so chained global ``replace`` calls cannot cascade into each
other regardless of order — making the per-char reference loop and the
per-string SQL chain equivalent.
"""

from __future__ import annotations

from .. import markers

SPARK, DUCKDB = "spark", "duckdb"


def q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _regexp_replace(dialect: str, col: str, pattern: str, repl: str) -> str:
    if dialect == DUCKDB:
        return f"regexp_replace({col}, {q(pattern)}, {q(repl)}, 'g')"
    return f"regexp_replace({col}, {q(pattern)}, {q(repl)})"


def _char_class(cps) -> str:
    return "[" + "".join(chr(cp) for cp in sorted(cps)) + "]"


# hidden markers + the IVS range: everything full-clean removes outright.
# (FE0F is included: the emoji context rule is inert without the emoji lib —
# consistent across our kernel, the reference here, and this oracle.)
def removal_class(excluded: frozenset[int] = frozenset(), *,
                  ivs: bool = True) -> str:
    cps = markers.HIDDEN_CODEPOINTS - excluded
    cls = "".join(chr(cp) for cp in sorted(cps))
    ivs_part = "" if (not ivs or markers.IVS_LO in excluded) else \
        f"{chr(markers.IVS_LO)}-{chr(markers.IVS_HI)}"
    return f"[{cls}{ivs_part}]"


TYPO_CLASS = _char_class(markers.TYPOGRAPHIC_CODEPOINTS)
HIDDEN_CLASS = _char_class(markers.HIDDEN_CODEPOINTS)
IVS_CLASS = f"[{chr(markers.IVS_LO)}-{chr(markers.IVS_HI)}]"


def clean_expr(dialect: str, col: str,
               excluded: frozenset[int] = frozenset(), *,
               typographic: bool = True, ivs: bool = True) -> str:
    """Clean semantics as one SQL expression; ``typographic``/``ivs``
    mirror the constructor flags (ref :576-599): typographic off leaves
    live-replacement chars untouched, ivs off leaves the VS17-256 range."""
    e = _regexp_replace(dialect, col, removal_class(excluded, ivs=ivs), "")
    if typographic:
        for cp, out in sorted(markers.LIVE_REPLACEMENTS.items()):
            if cp in excluded:
                continue
            e = f"replace({e}, {q(chr(cp))}, {q(''.join(map(chr, out)))})"
    return e


def count_expr(dialect: str, col: str, cls: str) -> str:
    """# of chars of ``col`` matching regex char-class ``cls``."""
    return f"(length({col}) - length({_regexp_replace(dialect, col, cls, '')}))"


def detected_expr(dialect: str, col: str) -> str:
    """clean-mode n_detected = all hidden + IVS + typographic markers."""
    return (f"({count_expr(dialect, col, HIDDEN_CLASS)}"
            f" + {count_expr(dialect, col, IVS_CLASS)}"
            f" + {count_expr(dialect, col, TYPO_CLASS)})")


LIVE_TYPO_CLASS = _char_class(markers.LIVE_REPLACEMENTS)


def changed_expr(dialect: str, col: str) -> str:
    """True iff full-clean modifies the (single-line) text: any removal or
    any live replacement (detect-only typographic markers don't count)."""
    return (f"({count_expr(dialect, col, HIDDEN_CLASS)}"
            f" + {count_expr(dialect, col, IVS_CLASS)}"
            f" + {count_expr(dialect, col, LIVE_TYPO_CLASS)}) > 0")


# --- deterministic marker injection over documents.text ---------------------
# Portable SQL, applied identically by both engines.  Families covered:
# ZWSP after every 'e' (hidden removal), homoglyph o/x (live replacement),
# em-dash for '-', right-quote after 't' (live replacement), IVS after 'm'
# (IVS removal), tricolon after 'w' (detect-only typographic), NBSP for
# double-space, ellipsis after 'q' (dead rule: must survive cleaning),
# leading BOM on every 7th doc.
def marked_expr(col: str = "text", id_col: str = "doc_id") -> str:
    e = f"translate({col}, 'ox', 'ох')"
    for find, repl in [
        ("e", "e​"),
        ("t", "t’"),
        ("m", "m\U000e0101"),
        ("w", "w⁙"),
        ("q", "q…"),
        ("-", "—"),
        ("  ", " "),
    ]:
        e = f"replace({e}, {q(find)}, {q(repl)})"
    return (f"(CASE WHEN {id_col} % 7 = 0 THEN '﻿' || {e} "
            f"ELSE {e} END)")


def marked_docs_sql(dialect: str) -> str:
    """Shared FROM-clause: documents with an injected ``marked`` column."""
    return (f"(SELECT doc_id, source, lang, n_chars, "
            f"{marked_expr()} AS marked FROM documents)")


# Watermark-only injection for the composite curation pipeline: every
# injected marker is *exactly reversible* by full clean (hidden removal, IVS
# removal, homoglyph fold-back, leading BOM), so cleaning restores the
# pristine text and the downstream quality/lang/dedup stages see real
# content — the watermark-stripping story of a training-data pipeline.
# (marked_expr above also plants detect-only/dead-rule chars that survive
# cleaning; those would shred every English stopword and make the lang
# filter vacuously empty.)
def watermark_marked_expr(col: str = "text", id_col: str = "doc_id") -> str:
    e = f"translate({col}, 'ox', 'ох')"
    for find, repl in [
        ("e", "e​"),
        ("m", "m\U000e0101"),
    ]:
        e = f"replace({e}, {q(find)}, {q(repl)})"
    return (f"(CASE WHEN {id_col} % 7 = 0 THEN '﻿' || {e} "
            f"ELSE {e} END)")


def watermarked_docs_sql(dialect: str) -> str:
    return (f"(SELECT doc_id, source, lang, n_chars, "
            f"{watermark_marked_expr()} AS marked FROM documents)")
