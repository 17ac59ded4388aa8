"""As-of join operator semantics + plan shape."""

from __future__ import annotations

import datetime as dt

import pytest

from hidden_characters_detector_spark.operators.asof import (
    asof_join_broadcast)

T = dt.datetime(2024, 1, 1)


def _m(mins):
    return T + dt.timedelta(minutes=mins)


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame(
        [("e1", "k1", _m(0)),       # before any version -> no match
         ("e2", "k1", _m(10)),      # inside v1
         ("e3", "k1", _m(20)),      # exactly at v2 start -> v2 (>=)
         ("e4", "k1", _m(500)),     # long after last -> open-ended v2
         ("e5", "k2", _m(30)),      # other key, single version
         ("e6", "kX", _m(30))],     # key absent from right -> no match
        "ev string, k string, t timestamp")
    right = spark.createDataFrame(
        [("k1", _m(5), "v1"), ("k1", _m(20), "v2"), ("k2", _m(0), "w1")],
        "k string, vf timestamp, payload string")
    return left, right


def test_asof_backward_latest_version_wins(spark, sides):
    left, right = sides
    out = {r["ev"]: (r["payload"], r["vf"]) for r in
           asof_join_broadcast(left, right, on=["k"], left_time="t",
                               right_time="vf").collect()}
    assert out == {
        "e2": ("v1", _m(5)),
        "e3": ("v2", _m(20)),      # boundary: vf == t matches that version
        "e4": ("v2", _m(20)),      # open-ended latest
        "e5": ("w1", _m(0)),
    }                               # e1 (too early) and e6 (no key) drop


def test_asof_tolerance_bounds_staleness(spark, sides):
    left, right = sides
    out = {r["ev"]: r["payload"] for r in
           asof_join_broadcast(left, right, on=["k"], left_time="t",
                               right_time="vf",
                               tolerance="1 hour").collect()}
    # e4 is 480 min after v2's start — staler than the tolerance
    assert out == {"e2": "v1", "e3": "v2", "e5": "w1"}


def test_asof_exactly_one_match_per_left_row(spark, sides):
    left, right = sides
    out = asof_join_broadcast(left, right, on=["k"], left_time="t",
                              right_time="vf")
    assert out.groupBy("ev").count().where("count > 1").count() == 0


def test_asof_rejects_column_collisions(spark, sides):
    left, right = sides
    with pytest.raises(ValueError, match="collision"):
        asof_join_broadcast(left, right.withColumnRenamed("payload", "ev"),
                            on=["k"], left_time="t", right_time="vf")


def test_asof_plan_broadcasts_and_never_shuffles_left(spark, sides):
    """The scale contract: the window runs on the (tiny) right side only
    and the join broadcasts it — no sort-merge join, no exchange on the
    left branch."""
    left, right = sides
    out = asof_join_broadcast(left, right, on=["k"], left_time="t",
                              right_time="vf")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the only Exchange in the plan feeds the right-side window + broadcast
    # (left branch: scan -> filter -> join, no repartitioning)
    bhj = plan.split("BroadcastHashJoin", 1)[1]
    left_branch = bhj.split("BroadcastExchange", 1)[0]
    assert "Exchange hashpartitioning" not in left_branch
