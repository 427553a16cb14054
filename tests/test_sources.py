"""Source-format breadth: json/csv repo_files ingest produce identical
mentions to parquet; pred-partitioned triple sink prunes on read."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from smart_pdf_md_spark.plans.pipeline import build_mentions, triples_from_mentions
from smart_pdf_md_spark.operators.extract import mentions_only
from smart_pdf_md_spark.sources.tables import load_repo_files, write_triples


def test_json_and_csv_sources_equal_parquet(spark, corpus_sdf, tmp_path):
    pq = str(tmp_path / "c.parquet")
    js = str(tmp_path / "c.json")
    corpus_sdf.write.parquet(pq)
    corpus_sdf.write.json(js)

    cols = ["file_id", "kind", "name", "line"]
    base = mentions_only(build_mentions(spark, load_repo_files(spark, pq))) \
        .select(*cols).toPandas().sort_values(cols).reset_index(drop=True)
    from_json = mentions_only(build_mentions(spark, load_repo_files(spark, js))) \
        .select(*cols).toPandas().sort_values(cols).reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(base, from_json)
    # csv with embedded newlines round-trips via multiLine+escape
    cs = str(tmp_path / "c.csv")
    corpus_sdf.write.option("header", "true").option("escape", '"').csv(cs)
    from_csv = mentions_only(build_mentions(
        spark, load_repo_files(spark, cs).na.fill({"content": ""}))) \
        .select(*cols).toPandas().sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(base, from_csv)


def test_pred_partitioned_sink_prunes(spark, corpus_sdf, tmp_path):
    out = str(tmp_path / "triples")
    triples = triples_from_mentions(
        mentions_only(build_mentions(spark, corpus_sdf)))
    write_triples(triples, out, partition_by_pred=True)
    assert os.path.isdir(os.path.join(out, "pred=IMPORTS"))
    back = spark.read.parquet(out).filter(F.col("pred") == "CALLS")
    # partition pruning: the plan's PartitionFilters reference pred
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "pred" in plan
    assert back.count() == triples.filter("pred = 'CALLS'").count()
