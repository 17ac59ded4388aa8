"""As-of (point-in-time) join: each left row ⋈ the LATEST right row whose
time is <= the left row's time, per key.

The confusable-dict interval join (``streaming.pipeline
.confusable_dict_join``) answers "which dictionary versions were valid when
this event happened" — an event can match several overlapping versions.
The as-of join answers the SCD-2 question a backfill actually asks: "which
single version was CURRENT at event time".  Spark has no built-in as-of
join; the naive formulations are both wrong at scale:

* join-all-then-argmax needs a groupBy over the (huge) left side's row
  identity — a full event shuffle plus a wide aggregate;
* a window over the union (the pandas ``merge_asof`` shape) needs a global
  sort of events per key.

The scale-correct formulation: CLOSE the right side's validity intervals
first — ``valid_to = lead(time) over (partition by key order by time)`` —
which makes versions non-overlapping, so the as-of match becomes a plain
inner join with at most ONE match per left row.  The window runs on the
right side only (a rule/dimension table, tiny at any corpus scale), and the
join broadcasts it: the left side never shuffles, never sorts, never
aggregates.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_VALID_TO = "_asof_valid_to"


def asof_join_broadcast(left: DataFrame, right: DataFrame, *,
                        on: list[str], left_time: str, right_time: str,
                        tolerance: str | None = None,
                        tiebreak: str | None = None) -> DataFrame:
    """Inner as-of join (backward direction, pandas ``merge_asof``
    semantics): for each left row the single right row with the greatest
    ``right_time <= left_time`` for the same ``on`` keys.

    ``right`` must be broadcast-small (a dimension/rule table); ``on``
    columns must exist under the same names on both sides, and the
    remaining column names must not collide.  ``tolerance`` (an SQL
    interval string, e.g. ``'2 hours'``) additionally requires
    ``left_time - right_time <= tolerance`` — a left row whose nearest
    version is older than the tolerance matches nothing.

    ``(on, right_time)`` must be UNIQUE on the right side: a tie makes the
    ``lead()`` interval close one of the tied rows with an empty ``[t, t)``
    validity window, so which version wins is nondeterministic run to run.
    If the right side can carry ties (e.g. two dict versions in the same
    second), pass ``tiebreak`` — a right-side column (e.g. a version
    number) appended to the window order; the HIGHEST tiebreak value wins
    the instant (its predecessors get empty windows deterministically).

    Returns all left columns plus the right side's non-key columns
    (including ``right_time``, which tells the caller WHICH version won).
    """
    overlap = (set(left.columns) & set(right.columns)) - set(on)
    if overlap:
        raise ValueError(
            f"column name collision outside the join keys: "
            f"{sorted(overlap)}; rename before joining")
    order = [right_time] if tiebreak is None else [right_time, tiebreak]
    w = Window.partitionBy(*on).orderBy(*order)
    r2 = right.withColumn(_VALID_TO, F.lead(right_time).over(w))
    lt = F.col(f"l.{left_time}")
    rt = F.col(f"r.{right_time}")
    cond = functools.reduce(
        operator.and_,
        [F.col(f"l.{k}") == F.col(f"r.{k}") for k in on])
    cond = cond & (lt >= rt) & (F.col(f"r.{_VALID_TO}").isNull()
                                | (lt < F.col(f"r.{_VALID_TO}")))
    if tolerance is not None:
        cond = cond & (lt <= rt + F.expr(f"interval {tolerance}"))
    out_cols = ([F.col(f"l.{c}") for c in left.columns]
                + [F.col(f"r.{c}") for c in right.columns
                   if c not in on])
    return (left.alias("l")
            .join(F.broadcast(r2).alias("r"), cond, "inner")
            .select(*out_cols))
