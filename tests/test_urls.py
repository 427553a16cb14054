"""URL filtering gate (RefinedWeb §3.1-style): normalization parity with
DuckDB, suffix-matched domain blocking, weighted keyword scores."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from smart_pdf_md_spark.operators.urls import (
    filter_blocked_domains,
    host_suffixes,
    url_host,
    url_keyword_score,
    url_normalize,
)

_URLS = [
    "HTTPS://WWW.Example.COM:443/Path/Sub/?utm_source=x&q=1#frag",
    "http://news.site.org:80/a/b/",
    "https://cdn.spam.example/dl?gclid=abc",
    "https://example.com/?utm_campaign=z&utm_term=y",
    "http://plain.example/keep?a=1&fbclid=zz&b=2",
    "https://ok.example/path",
]


def test_url_normalize_semantics(spark):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(_URLS)],
                               ["i", "url"])
    got = {r.i: r.n for r in
           df.select("i", url_normalize(F.col("url")).alias("n")).collect()}
    assert got[0] == "https://example.com/Path/Sub?q=1"
    assert got[1] == "http://news.site.org/a/b"
    assert got[2] == "https://cdn.spam.example/dl"
    assert got[3] == "https://example.com/"
    assert got[4] == "http://plain.example/keep?a=1&b=2"
    assert got[5] == "https://ok.example/path"


def test_url_normalize_duckdb_parity(spark):
    """The same normalization pipeline expressed in DuckDB regexps
    matches byte-for-byte (board-candidate shape)."""
    import duckdb

    pd_df = pd.DataFrame({"i": range(len(_URLS)), "url": _URLS})
    docs = spark.createDataFrame(pd_df)
    got = (docs.select("i", url_normalize(F.col("url")).alias("n"))
           .toPandas().sort_values("i").reset_index(drop=True))
    con = duckdb.connect()
    con.register("u", pd_df)
    want = con.execute(r"""
    WITH s0 AS (SELECT i, trim(url) AS u FROM u),
    s1 AS (
      SELECT i, lower(regexp_extract(u,
               '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)) ||
             u[length(regexp_extract(u,
               '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)) + 1:] AS u
      FROM s0
    ), s2 AS (SELECT i, regexp_replace(u, '#.*$', '') AS u FROM s1),
    s3 AS (SELECT i, regexp_replace(u, '^(https?://)www\.', '\1') AS u
           FROM s2),
    s4 AS (SELECT i, regexp_replace(u,
             '^(http://[^/:?#]*):80(/|\?|$)', '\1\2') AS u FROM s3),
    s5 AS (SELECT i, regexp_replace(u,
             '^(https://[^/:?#]*):443(/|\?|$)', '\1\2') AS u FROM s4),
    s6 AS (
      SELECT i,
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(u,
          '([?&])utm_source=[^&#]*&?', '\1'),
          '([?&])utm_medium=[^&#]*&?', '\1'),
          '([?&])utm_campaign=[^&#]*&?', '\1'),
          '([?&])utm_term=[^&#]*&?', '\1'),
          '([?&])utm_content=[^&#]*&?', '\1'),
          '([?&])gclid=[^&#]*&?', '\1'),
          '([?&])fbclid=[^&#]*&?', '\1'),
          '([?&])ref=[^&#]*&?', '\1') AS u
      FROM s5
    ), s7 AS (SELECT i, regexp_replace(u, '[?&]+$', '') AS u FROM s6),
    s8 AS (SELECT i, regexp_replace(u, '\?&', '?') AS u FROM s7)
    SELECT i, regexp_replace(u, '(://[^/?#]+/[^?#]*?)/+(\?|$)', '\1\2')
             AS n
    FROM s8 ORDER BY i
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_domain_blocking_suffix_match(spark):
    docs = spark.createDataFrame(
        [(i, u, f"t{i}") for i, u in enumerate(_URLS)],
        ["doc_id", "url", "text"])
    blocked = spark.createDataFrame(
        [("spam.example",), ("News.Site.ORG",)], ["domain"])
    kept = {r.doc_id
            for r in filter_blocked_domains(docs, blocked).collect()}
    # cdn.spam.example blocked via parent suffix; news.site.org directly
    assert kept == {0, 3, 4, 5}
    hosts = {r.doc_id: r.h for r in docs.select(
        "doc_id", url_host(F.col("url")).alias("h")).collect()}
    assert hosts[0] == "www.example.com" and hosts[2] == "cdn.spam.example"
    sufs = docs.filter("doc_id = 2").select(
        F.explode(host_suffixes(url_host(F.col("url")))).alias("s")) \
        .collect()
    assert [r.s for r in sufs] == ["cdn.spam.example", "spam.example",
                                   "example"]


def test_url_keyword_score(spark):
    import pytest

    docs = spark.createDataFrame(
        [(1, "https://free-casino.example/win-bitcoin"),
         (2, "https://news.example/politics")],
        ["doc_id", "url"])
    w = {"casino": 2.0, "bitcoin": 1.0, "win": 0.5}
    got = {r.doc_id: r.s for r in docs.select(
        "doc_id", url_keyword_score(F.col("url"), w).alias("s")).collect()}
    assert got[1] == 3.5 and got[2] == 0.0
    with pytest.raises(ValueError, match="keyword"):
        url_keyword_score(F.col("url"), {})


def test_curation_urlgate_stage(spark, tmp_path):
    """blocked_domains: the URL gate runs FIRST (committed stage), drops
    blocked-domain docs before any content work, resumes on an unchanged
    blocklist, rebuilds when the blocklist content changes, and refuses
    docs without the url column."""
    import pytest

    from smart_pdf_md_spark.plans.curation import run_curation

    good = ("the story of it is on a hill and for the day it was a good "
            "one in the end " + " ".join(f"w{j}" for j in range(40)))
    docs = spark.createDataFrame(
        [(1, good, "en", "https://ok.example/a"),
         (2, good + " two", "en", "https://cdn.spam.example/x"),
         (3, good + " three", "en", "https://fine.org/b")],
        ["doc_id", "text", "lang", "url"])
    blocked = spark.createDataFrame([("spam.example",)], ["domain"])

    run_dir = str(tmp_path / "cur")
    kw = dict(dup_ngram_max=None, dedup_threshold=1.01)
    res = run_curation(spark, docs, run_dir, blocked_domains=blocked, **kw)
    assert res["summary"]["after_urlgate"] == 2
    ids = {r.doc_id for r in res["urlgate"].select("doc_id").collect()}
    assert ids == {1, 3}
    kept = {r.doc_id for r in res["kept"].select("doc_id").collect()}
    assert 2 not in kept

    res2 = run_curation(spark, docs, run_dir, blocked_domains=blocked,
                        **kw)
    assert res2["resumed"]["urlgate"] is True
    assert res2["resumed"]["scrubbed"] is True

    blocked2 = spark.createDataFrame(
        [("spam.example",), ("fine.org",)], ["domain"])
    res3 = run_curation(spark, docs, run_dir, blocked_domains=blocked2,
                        **kw)
    assert res3["resumed"]["urlgate"] is False       # blocklist changed
    assert res3["resumed"]["scrubbed"] is False      # dep run_id moved
    assert res3["summary"]["after_urlgate"] == 1

    with pytest.raises(ValueError, match="url"):
        run_curation(spark, docs.drop("url"), run_dir,
                     blocked_domains=blocked, **kw)


def test_dedup_by_url_keeps_min_id_per_canonical_url(spark):
    """Normalization variants of one URL collapse to the min-id copy;
    distinct URLs survive; the exchange keys on the 8-byte hash."""
    docs = spark.createDataFrame(
        [(1, "https://www.a.com/x/?utm_source=z", "one"),
         (2, "https://a.com/x", "two"),
         (3, "https://a.com/y", "three"),
         (7, "HTTPS://A.com:443/x#frag", "four")],
        ["doc_id", "url", "text"])
    from smart_pdf_md_spark.operators.urls import dedup_by_url

    got = {r.doc_id: r for r in dedup_by_url(docs).collect()}
    assert got[1].is_url_keeper and got[1].url_dup_count == 3
    assert not got[2].is_url_keeper and not got[7].is_url_keeper
    assert got[3].is_url_keeper and got[3].url_dup_count == 1
    assert got[2].url_norm == got[7].url_norm == "https://a.com/x"

    plan = dedup_by_url(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    for ln in plan.splitlines():
        if "hashpartitioning" in ln:
            assert "url_norm#" not in ln.replace(" ", "").split(
                "hashpartitioning(")[1].split(")")[0], ln


def test_curation_urlgate_url_dedup(spark, tmp_path):
    """url_dedup=True: the gate also collapses canonical-URL duplicates
    (with or without a blocklist); the knob rides the params digest."""
    from smart_pdf_md_spark.plans.curation import run_curation

    good = ("the story of it is on a hill and for the day it was a good "
            "one in the end " + " ".join(f"w{j}" for j in range(40)))
    docs = spark.createDataFrame(
        [(1, good, "en", "https://www.a.com/x/?utm_source=z"),
         (2, good + " two", "en", "https://a.com/x"),
         (3, good + " three", "en", "https://b.org/y"),
         (4, good + " four", "en", "https://cdn.spam.example/z")],
        ["doc_id", "text", "lang", "url"])
    blocked = spark.createDataFrame([("spam.example",)], ["domain"])

    run_dir = str(tmp_path / "cur")
    kw = dict(dup_ngram_max=None, dedup_threshold=1.01)
    res = run_curation(spark, docs, run_dir, url_dedup=True, **kw)
    ids = {r.doc_id for r in res["urlgate"].select("doc_id").collect()}
    assert ids == {1, 3, 4}                 # url dup 2 collapses into 1
    assert res["summary"]["after_urlgate"] == 3

    res2 = run_curation(spark, docs, run_dir, url_dedup=True,
                        blocked_domains=blocked, **kw)
    assert res2["resumed"]["urlgate"] is False    # blocklist appeared
    ids2 = {r.doc_id for r in res2["urlgate"].select("doc_id").collect()}
    assert ids2 == {1, 3}                   # blocked 4 AND deduped 2
