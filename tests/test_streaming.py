"""Streaming incremental extraction: exactly-once over a growing directory."""

from __future__ import annotations

import os

from smart_pdf_md_spark.corpus import corpus_pandas
from smart_pdf_md_spark.oracle import oracle_mentions
from smart_pdf_md_spark.plans.manifests import read_manifest, read_stage
from smart_pdf_md_spark.streaming.incremental import run_incremental


def test_incremental_stream_extracts_exactly_once(spark, tmp_path, corpus_pdf):
    corpus_dir = str(tmp_path / "corpus")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(corpus_dir)

    half = len(corpus_pdf) // 2
    a, b = corpus_pdf.iloc[:half], corpus_pdf.iloc[half:]
    a.to_parquet(os.path.join(corpus_dir, "part-a.parquet"), index=False)

    run_incremental(spark, corpus_dir, out_dir, ckpt, once=True)
    got1 = read_stage(spark, out_dir, "mentions").filter("kind != '__file__'")
    golden_a = oracle_mentions(a)
    assert got1.count() == len(golden_a)
    # micro-batches commit through the SAME snapshot protocol as batch runs
    m = read_manifest(spark, out_dir, "mentions").toPandas()
    assert m["row_count"].sum() == read_stage(spark, out_dir, "mentions").count()

    # new files land; restart processes ONLY them (checkpoint dedupe)
    b.to_parquet(os.path.join(corpus_dir, "part-b.parquet"), index=False)
    run_incremental(spark, corpus_dir, out_dir, ckpt, once=True)
    got2 = read_stage(spark, out_dir, "mentions").filter("kind != '__file__'")
    golden_all = oracle_mentions(corpus_pandas(len(corpus_pdf)))
    assert got2.count() == len(golden_all)  # no duplicates, nothing missed

    # third drain with nothing new: output unchanged
    run_incremental(spark, corpus_dir, out_dir, ckpt, once=True)
    n_all = read_stage(spark, out_dir, "mentions") \
        .filter("kind != '__file__'").count()
    assert n_all == len(golden_all)

    # a batch-mode run can resume ON TOP of the streamed commits: nothing
    # pending, stage served from the committed snapshot
    from smart_pdf_md_spark.plans.driver import extract_incremental
    corpus_sdf_all = spark.createDataFrame(corpus_pandas(len(corpus_pdf)))
    _, n_new = extract_incremental(spark, corpus_sdf_all, out_dir)
    assert n_new == 0
