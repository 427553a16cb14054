"""As-of join operator: hand-checkable semantics, both directions."""

from __future__ import annotations

from datetime import datetime

import pytest

from smart_pdf_md_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_backward_and_forward(spark):
    left = spark.createDataFrame(
        [("u1", _ts("2024-01-01T10:00"), 100),
         ("u1", _ts("2024-01-01T12:00"), 200),
         ("u2", _ts("2024-01-01T11:00"), 300)],
        ["user", "ts", "val"])
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01T09:00"), "a"),   # before any left → null
         ("u1", _ts("2024-01-01T11:00"), "b"),   # after 10:00 → 100
         ("u1", _ts("2024-01-01T12:00"), "c"),   # tie → left visible → 200
         ("u2", _ts("2024-01-01T23:00"), "d"),   # after 11:00 → 300
         ("u3", _ts("2024-01-01T11:00"), "e")],  # no left for key → null
        ["user", "ts", "tag"])

    back = {r.tag: r.asof_val for r in
            asof_join(left, right, on="ts", by="user",
                      value_cols=["val"]).collect()}
    assert back == {"a": None, "b": 100, "c": 200, "d": 300, "e": None}

    fwd = {r.tag: r.asof_val for r in
           asof_join(left, right, on="ts", by="user", value_cols=["val"],
                     direction="forward").collect()}
    assert fwd == {"a": 100, "b": 200, "c": 200, "d": None, "e": None}


def test_asof_multiple_value_cols(spark):
    left = spark.createDataFrame([("k", 1, 10, "x")], ["by", "ts", "v1", "v2"])
    right = spark.createDataFrame([("k", 2, "r")], ["by", "ts", "tag"])
    row = asof_join(left, right, on="ts", by="by",
                    value_cols=["v1", "v2"]).collect()[0]
    assert (row.asof_v1, row.asof_v2) == (10, "x")


@pytest.mark.slow
def test_range_join_exact_vs_bruteforce(spark):
    """Binned range join == the O(n·m) cross-join predicate, including
    boundary bins (end exactly on a bin edge), empty intervals, keyed and
    keyless variants, and bin sizes smaller/larger than the intervals."""
    import random

    from pyspark.sql import functions as F

    from smart_pdf_md_spark.operators.asof import range_join

    rng = random.Random(5)
    pts = [(i, rng.choice("ab"), round(rng.uniform(0, 100), 3))
           for i in range(300)]
    ivs = []
    for j in range(60):
        s = round(rng.uniform(0, 95), 3)
        ivs.append((j, rng.choice("ab"), s, round(s + rng.uniform(0, 8), 3)))
    ivs += [(97, "a", 10.0, 10.0),   # empty interval -> matches nothing
            (98, "a", 20.0, 25.0),   # integer boundaries
            (99, "b", 0.0, 100.0)]   # interval spanning everything
    points = spark.createDataFrame(pts, ["pid", "k", "x"])
    intervals = spark.createDataFrame(ivs, ["iid", "k", "lo", "hi"])

    def brute(by):
        cond = (F.col("lo") <= F.col("x")) & (F.col("x") < F.col("hi"))
        if by:
            cond = cond & (points["k"] == intervals["k"])
        return {(r.pid, r.iid) for r in
                points.join(intervals, cond).select("pid", "iid").collect()}

    for by, bin_size in [("k", None), ("k", 1.0), ("k", 50.0), (None, 4.0)]:
        got_df = range_join(points, intervals.withColumnsRenamed({"k": "ik"})
                            if by is None else intervals,
                            point_col="x", start_col="lo", end_col="hi",
                            by=by, bin_size=bin_size)
        got = {(r.pid, r.iid) for r in got_df.select("pid", "iid").collect()}
        want = brute(by)
        assert got == want, f"by={by} bin={bin_size}: " \
            f"missing={want - got} phantom={got - want}"
    # the plan is an equi-join (hash-joinable), not a nested-loop range scan
    plan = range_join(points, intervals, point_col="x", start_col="lo",
                      end_col="hi", by="k")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "NestedLoop" not in plan


def test_range_join_default_bin_ignores_degenerate_intervals(spark):
    """The auto bin_size estimate must use the median over VALID intervals
    only (ADVICE r3): planted end<=start rows and one outlier-long interval
    would otherwise skew an avg-over-everything estimate; either way the
    result must equal the brute-force predicate."""
    from pyspark.sql import functions as F

    from smart_pdf_md_spark.operators.asof import range_join

    pts = spark.createDataFrame([(i, float(i)) for i in range(50)],
                                ["pid", "x"])
    ivs = spark.createDataFrame(
        # typical length 2; planted: zero-length, inverted, one 10_000-long
        [(0, 3.0, 5.0), (1, 10.0, 12.0), (2, 20.0, 22.0),
         (3, 7.0, 7.0), (4, 9.0, 4.0), (5, 0.0, 10_000.0)],
        ["iid", "s", "e"])
    got = sorted((r.pid, r.iid) for r in range_join(
        pts, ivs, point_col="x", start_col="s", end_col="e").collect())
    want = sorted((r.pid, r.iid) for r in pts.crossJoin(ivs).filter(
        (F.col("s") <= F.col("x")) & (F.col("x") < F.col("e"))).collect())
    assert got == want and len(got) > 0
