"""dedup_content extraction path: identical output, fewer UDF invocations."""

from __future__ import annotations

from smart_pdf_md_spark.plans.pipeline import build_mentions


def test_dedup_content_path_row_identical(spark, corpus_sdf):
    cols = ["file_id", "kind", "name", "line", "enclosing", "status", "rc",
            "route_used", "content_sha256", "sha_match"]
    direct = build_mentions(spark, corpus_sdf).select(*cols).toPandas() \
        .sort_values(cols).reset_index(drop=True)
    deduped = build_mentions(spark, corpus_sdf, dedup_content=True) \
        .select(*cols).toPandas().sort_values(cols).reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(direct, deduped)


def test_dedup_content_actually_dedups(spark, corpus_sdf):
    """The representative set is strictly smaller than the corpus
    (vendored duplicates collapse)."""
    from pyspark.sql import functions as F
    n_files = corpus_sdf.count()
    n_reps = corpus_sdf.select(F.sha2("content", 256), "lang").distinct().count()
    assert n_reps < n_files
