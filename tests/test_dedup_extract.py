"""dedup_content extraction path: identical output, fewer UDF invocations."""

from __future__ import annotations

from smart_pdf_md_spark.plans.pipeline import build_mentions


def test_dedup_content_path_row_identical(spark, corpus_sdf):
    """FULL-schema comparison (incl. span + mention_id): the r3 column
    additions silently never reached the dedup_content fan-out path, and
    the old column-subset compare masked it — never project before
    comparing two paths that claim identical output."""
    import pandas as pd

    direct_df = build_mentions(spark, corpus_sdf)
    deduped_df = build_mentions(spark, corpus_sdf, dedup_content=True)
    assert sorted(direct_df.columns) == sorted(deduped_df.columns)
    cols = sorted(direct_df.columns)
    sort_keys = [c for c in cols if c != "span"]  # lists don't sort

    def canon(df):
        pdf = df.select(*cols).toPandas()
        pdf["span"] = pdf["span"].map(
            lambda v: None if v is None else tuple(v))
        return pdf.sort_values(sort_keys).reset_index(drop=True)

    pd.testing.assert_frame_equal(canon(direct_df), canon(deduped_df))


def test_dedup_content_actually_dedups(spark, corpus_sdf):
    """The representative set is strictly smaller than the corpus
    (vendored duplicates collapse)."""
    from pyspark.sql import functions as F
    n_files = corpus_sdf.count()
    n_reps = corpus_sdf.select(F.sha2("content", 256), "lang").distinct().count()
    assert n_reps < n_files


def test_extraction_memo_is_partitioning_invariant(spark, corpus_sdf):
    """The per-partition extraction memo must be invisible in the output:
    coalesce(1) colocates EVERY vendored duplicate (max memo hits) and must
    produce byte-identical rows to an 8-way split (mostly misses)."""
    def rows(df):
        return sorted(
            tuple(tuple(v) if isinstance(v, list) else v for v in r)
            for r in build_mentions(spark, df).collect())

    assert rows(corpus_sdf.coalesce(1)) == rows(corpus_sdf.repartition(8))
