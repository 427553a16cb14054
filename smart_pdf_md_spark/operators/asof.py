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
