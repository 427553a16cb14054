"""As-of join operator: hand-checkable semantics, both directions."""

from __future__ import annotations

from datetime import datetime

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
