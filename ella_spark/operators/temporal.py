"""Reusable temporal join operators: as-of and interval (range) joins.

The reference inherits only equi/theta joins from DataFusion
(SURVEY.md §2.B); as-of and interval joins are the two temporal-join
shapes every TSDB workload needs (pandas merge_asof / kdb aj are the
single-node precedents). The registry queries q_asof_join /
q_asof_join_forward / q_range_join are instances of these operators.

Scale design:

- ``asof_join`` is the union-window plan: tag both sides, union, one
  window pass partitioned by the key — ONE shuffle on the by-keys,
  never a per-row subquery and never a theta join. Works at any right-
  side density because the window carries only the right-side payload
  struct, not a join fanout. NOTE: when left and right derive from the
  SAME table (e.g. two event-type filters of one stream), don't
  instantiate this operator — its two DataFrame inputs plan as two
  scans of the table; tag in one scan and window directly instead
  (see q_asof_join for the pattern).
- ``interval_join`` equi-joins on coarse time buckets that each
  interval explodes into (bounded fanout = interval_len/granularity),
  then applies the exact range residual. Shuffle volume is linear in
  points + interval-buckets — a broadcast-nested-loop theta join (what
  a naive BETWEEN join plans to) is O(points x intervals) and dead at
  100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "time",
    by: list[str] | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the nearest right row at-or-before
    (``backward``) or at-or-after (``forward``) its ``on`` value,
    optionally within ``tolerance`` (same units as ``on``).

    ``by``: equality keys (e.g. series id) — the shuffle keys.
    ``right_cols``: right-side payload columns to attach (default: all
    non-key, non-time columns), suffixed with ``suffix``.

    Plan: union both sides with a side tag, one window over
    (by, on, tag) carrying the last (or next) right payload struct.
    Exactly one shuffle, on the by-keys.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by]

    payload = F.struct(
        F.col(on).alias("__t"), *[F.col(c) for c in right_cols]
    )
    # Right rows sort before left rows at the same timestamp so that
    # an exact-tie right row is visible to the left row in BACKWARD
    # mode (<=); in FORWARD mode (>=) left rows must see same-time
    # right rows too, so the right side again sorts first within the
    # reversed frame below.
    r = right.select(
        *by,
        F.col(on).alias("__on"),
        F.lit(0).alias("__side"),
        payload.alias("__p"),
    )
    l_cols = [c for c in left.columns]
    l = left.select(
        *[F.col(c) for c in l_cols],
        F.col(on).alias("__on"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    if direction == "backward":
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__on").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        nearest = F.last("__p", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__on").asc(), F.col("__side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        nearest = F.first("__p", ignorenulls=True).over(w)

    matched = unioned.withColumn("__m", nearest).where(F.col("__side") == 1)
    if tolerance is not None:
        gap = (
            (F.col("__on") - F.col("__m.__t"))
            if direction == "backward"
            else (F.col("__m.__t") - F.col("__on"))
        )
        matched = matched.withColumn(
            "__m", F.when(gap <= tolerance, F.col("__m"))
        )
    out_cols = [F.col(c) for c in l_cols]
    out_cols += [
        F.col(f"__m.{c}").alias(f"{c}{suffix}" if c in l_cols else c)
        for c in right_cols
    ]
    return matched.select(*out_cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    granularity: int,
    how: str = "inner",
) -> DataFrame:
    """Join point rows into [start, end) interval rows without an
    equi key: each interval explodes into its covered coarse buckets
    (bounded fanout = ceil(len/granularity)+1), points map to ONE
    bucket, the join is an equi-join on the bucket plus the exact
    range residual. All time columns are numeric (epoch-ns longs).

    ``granularity`` trades fanout vs selectivity: pick ~= typical
    interval length so fanout stays O(1) while each bucket matches
    few intervals. The output keeps all point and interval columns.
    """
    if how != "inner":
        raise ValueError("only inner interval joins are supported")
    # Integer division on the long columns: epoch-ns values exceed 2^53,
    # so a double round-trip ((col / g).cast('long')) can misassign
    # boundary-adjacent points to the wrong bucket — and since the exact
    # range residual below only REMOVES false positives, a misbucketed
    # true match would be silently dropped.
    g = int(granularity)
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"`{start_col}` div {g}"),
                F.expr(f"(`{end_col}` - 1) div {g}"),
            )
        ),
    )
    pt = points.withColumn("__bucket", F.expr(f"`{point_col}` div {g}"))
    return (
        pt.join(iv, "__bucket")
        .where(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("__bucket")
    )
