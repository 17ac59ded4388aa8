"""Local mirror of the driver's correctness gate: every ``queries()`` entry
vs its ``oracle_sql()`` on the same parquet tables (sf0.001 for speed; the
driver runs sf0.01 — same generator, larger volume)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

import os as _os

SF_DIR = _os.environ.get("HCD_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _norm(v):
    if isinstance(v, float):
        return round(v, 6)
    return v


def _rows(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in data)


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_matches_oracle(spark, ddb, name):
    qs, os = entrymod.queries(), entrymod.oracle_sql()
    if name not in os:
        # non-SQL-expressible op: the driver records a rows-only check;
        # mirror that (runs, stable schema, deterministic row count)
        sdf = qs[name](spark, SF_DIR)
        n1 = sdf.count()
        n2 = qs[name](spark, SF_DIR).count()
        assert n1 == n2
        assert len(sdf.columns) >= 2
        return
    sdf = qs[name](spark, SF_DIR)
    scols = sdf.columns
    srows = _rows(scols, [tuple(r) for r in sdf.collect()])
    ores = ddb.sql(os[name])
    ocols = ores.columns
    orows = _rows(ocols, ores.fetchall())
    assert sorted(scols) == sorted(ocols), (scols, ocols)
    assert len(srows) == len(orows), f"{name}: {len(srows)} vs {len(orows)}"
    if srows != orows:
        for a, b in zip(srows, orows):
            assert a == b, f"{name}: first diff\n spark={a}\n duck ={b}"
    assert srows == orows


def test_fixture_single_line_assumption(ddb):
    """The clean/count oracles treat documents.text as single-line (per-doc
    == per-line); fail fast if a fixture ever embeds a newline so the
    assumption can't silently rot (the multiline path is exercised
    separately by line_reports' explicit newline injection)."""
    n = ddb.sql("SELECT count(*) FROM documents "
                "WHERE text LIKE '%' || chr(10) || '%'").fetchone()[0]
    assert n == 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert {"source", "n_docs", "total_detected"} <= set(df.columns)
