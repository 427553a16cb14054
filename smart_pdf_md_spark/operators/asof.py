"""As-of join — a native-operator gap in Spark, composed from primitives.

Technique (the shuffle-friendly formulation, no pandas): tag both streams,
union them, and for each right-stream row take the last left-stream value
seen at or before its timestamp with one window pass partitioned by key —
a single sort-based shuffle, no range explosion, skew handled by AQE like
any other window. Equivalent `pd.merge_asof`-per-group would move the data
through Arrow for no gain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each `right` row, attach the `value_cols` of the most recent
    `left` row with the same `by` key and `on` ≤ right.`on`
    (direction='backward'; 'forward' = next left row at/after).

    Ties on `on` resolve left-before-right (the left row is visible to a
    simultaneous right row) — deterministic via the stream tag sort key.
    """
    lt = left.select(
        F.col(by), F.col(on), F.lit(0).alias("_stream"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    rt = right.withColumn("_stream", F.lit(1))
    for c in value_cols:
        rt = rt.withColumn(f"_v_{c}", F.lit(None).cast(lt.schema[f"_v_{c}"].dataType))
    u = lt.unionByName(rt, allowMissingColumns=True)

    if direction == "backward":
        w = Window.partitionBy(by).orderBy(F.col(on).asc(), F.col("_stream").asc()) \
            .rowsBetween(Window.unboundedPreceding, 0)
        picked = [F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
                  for c in value_cols]
    elif direction == "forward":
        w = Window.partitionBy(by).orderBy(F.col(on).asc(), F.col("_stream").desc()) \
            .rowsBetween(0, Window.unboundedFollowing)
        picked = [F.first(f"_v_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
                  for c in value_cols]
    else:
        raise ValueError(f"unknown direction: {direction}")

    out = u.select("*", *picked).filter(F.col("_stream") == 1)
    return out.drop("_stream", *[f"_v_{c}" for c in value_cols])


def range_join(points: DataFrame, intervals: DataFrame, *,
               point_col: str, start_col: str, end_col: str,
               by: str | None = None, bin_size: float | None = None) -> DataFrame:
    """Interval/range join — Spark's other native-operator gap: every
    (point, interval) pair with start ≤ point < end (optionally also
    matching a `by` key).

    Naive Spark plans this as BroadcastNestedLoopJoin (O(n·m) comparisons,
    and a detonation when neither side broadcasts). This is the standard
    BINNED formulation (the technique behind Databricks' range-join hints
    and interval joins in stream processors): quantize to width-`bin_size`
    bins, explode each interval to the bins it overlaps, equi-join on the
    bin (plus `by`), then apply the exact range predicate. The join becomes
    a hash shuffle; pair work is bounded by occupancy per bin, so pick
    `bin_size` near the TYPICAL interval length (default: exactly that,
    estimated with one tiny agg — at most ~2-3 bins per interval).

    Intervals are half-open [start, end). Columns must be NUMERIC (cast
    timestamps to epoch seconds first). Output = points columns + interval
    columns (bin housekeeping dropped)."""
    if bin_size is None:
        # estimate on the SAME rows the join will use (end > start — degenerate
        # intervals would drag the estimate toward 0), and take the median,
        # not the mean: one outlier-long interval must not widen every bin
        # (ADVICE r3)
        est = (intervals.filter(F.col(end_col) > F.col(start_col))
               .agg(F.percentile_approx(F.col(end_col) - F.col(start_col),
                                        0.5)).collect()[0][0])
        bin_size = float(est) if est and est > 0 else 1.0
    b = float(bin_size)

    # half-open [start, end): the last overlapped bin is ceil(end/b) - 1
    # (NOT floor(end/b) — an end exactly on a bin boundary belongs to the
    # previous bin). For end > start this is always ≥ the first bin.
    first = F.floor(F.col(start_col) / b).cast("long")
    last = (F.ceil(F.col(end_col) / b) - 1).cast("long")
    ivl = (intervals.filter(F.col(end_col) > F.col(start_col))
           .withColumn("_bin", F.explode(F.sequence(first, last))))
    pts = points.withColumn("_bin", F.floor(F.col(point_col) / b))
    keys = ["_bin"] + ([by] if by else [])
    out = (pts.join(ivl, keys)
           .filter((F.col(start_col) <= F.col(point_col)) &
                   (F.col(point_col) < F.col(end_col)))
           .drop("_bin"))
    return out
