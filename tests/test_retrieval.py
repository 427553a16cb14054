"""BM25 lexical retrieval: known-ordering semantics + DuckDB parity."""

from __future__ import annotations

from smart_pdf_md_spark.operators.retrieval import bm25_topk


def _frames(spark):
    import pandas as pd

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "spark shuffle join optimizer",                    # on-topic, short
            "spark spark spark spark unrelated filler words here",  # tf-saturated
            "the optimizer rewrites the join order for spark queries",
            "completely different content about cooking pasta",
            "",                                                # empty → no terms
        ],
    })
    queries = pd.DataFrame({
        "query_id": [10, 20],
        "query": ["spark join optimizer", "pasta"],
    })
    return spark.createDataFrame(docs), spark.createDataFrame(queries), docs, queries


def test_bm25_semantics(spark):
    docs, queries, _, _ = _frames(spark)
    out = bm25_topk(docs, queries, k=3)
    rows = {(r.query_id, r.rank): r for r in out.collect()}

    # query 10: docs 1 and 3 carry all three terms; doc 2 only 'spark'
    # (saturated) — the multi-term docs must outrank it
    top2_q10 = {rows[(10, 1)].doc_id, rows[(10, 2)].doc_id}
    assert top2_q10 == {1, 3}
    assert rows[(10, 3)].doc_id == 2
    # query 20 matches only the pasta doc
    q20 = [r for (q, _), r in rows.items() if q == 20]
    assert len(q20) == 1 and q20[0].doc_id == 4
    # k respected, ranks contiguous from 1, scores positive & descending
    assert all(r.rank <= 3 and r.score > 0 for r in rows.values())
    assert rows[(10, 1)].score >= rows[(10, 2)].score >= rows[(10, 3)].score


def test_bm25_prebuilt_index_matches_inline(spark):
    """Scoring against bm25_index() postings/stats is bit-identical to the
    inline path — the repeated-query serving mode never re-reads text."""
    from smart_pdf_md_spark.operators.retrieval import bm25_index

    docs, queries, _, _ = _frames(spark)
    postings, stats = bm25_index(docs)
    inline = bm25_topk(docs, queries, k=3).toPandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    indexed = bm25_topk(None, queries, k=3, postings=postings,
                        corpus_stats=stats).toPandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(inline, indexed)


def test_bm25_duckdb_parity(spark):
    """Full-frame parity with an ANSI formulation of the same scoring — the
    operator is deliberately SQL-expressible (board-rotation candidate)."""
    import duckdb
    import pandas as pd

    docs, queries, docs_pd, queries_pd = _frames(spark)
    got = bm25_topk(docs, queries, k=3).toPandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)

    con = duckdb.connect()
    con.register("documents", docs_pd)
    con.register("queries", queries_pd)
    want = con.execute(r"""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
      FROM documents
    ), d AS (
      SELECT doc_id, len(toks) AS dl, unnest(toks) AS term
      FROM base WHERE len(toks) > 0
    ), tf AS (
      SELECT doc_id, dl, term, count(*) AS tf FROM d GROUP BY doc_id, dl, term
    ), stats AS (
      SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl
      FROM base WHERE len(toks) > 0
    ), dfreq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ), qterms AS (
      SELECT query_id, unnest(list_distinct(
        regexp_split_to_array(trim(query), '\s+'))) AS term FROM queries
    ), scored AS (
      SELECT q.query_id, tf.doc_id,
             round(sum(
               ln(1.0 + (s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * (tf.tf * (1.2 + 1)) /
                 (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / s.avgdl))
             ) + 1e-9, 4) AS score
      FROM tf JOIN qterms q USING (term)
              JOIN dfreq USING (term)
              CROSS JOIN stats s
      GROUP BY q.query_id, tf.doc_id
    )
    SELECT query_id, doc_id, score, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id) AS rank
      FROM scored)
    WHERE rank <= 3
    ORDER BY query_id, rank
    """).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-9)


def test_bm25_half_supplied_index_pair_raises(spark):
    """ADVICE r6: postings without corpus_stats used to fall into the
    inline branch yet keep `tf = hits` (unresolved-column crash at scoring
    time); corpus_stats without postings was silently discarded and
    recomputed. Both half-supplied states now fail loudly at call time."""
    import pytest
    from smart_pdf_md_spark.operators.retrieval import bm25_index

    docs, queries, _, _ = _frames(spark)
    postings, stats = bm25_index(docs)
    with pytest.raises(ValueError, match="supplied together"):
        bm25_topk(docs, queries, k=3, postings=postings)
    with pytest.raises(ValueError, match="supplied together"):
        bm25_topk(docs, queries, k=3, corpus_stats=stats)


def test_tfidf_keywords_semantics_and_duckdb_parity(spark, ddb=None):
    """Top-k distinctive terms per doc: corpus-wide words (df=N) rank below
    doc-specific ones; full DuckDB parity on the smoothed-idf formula;
    prebuilt bm25_index pair ≡ inline; half-supplied pair raises."""
    import duckdb
    import pandas as pd
    import pytest

    from smart_pdf_md_spark.operators.retrieval import bm25_index, tfidf_keywords

    docs, _, docs_pd, _ = _frames(spark)
    out = tfidf_keywords(docs, k=3)
    rows = {(r.doc_id, r.rank): r.term for r in out.collect()}
    # 'spark' appears in 3 of 4 non-empty docs — never the #1 keyword of
    # doc 1, whose uniquer terms (shuffle) outrank it
    assert rows[(1, 1)] == "shuffle"
    # the pasta doc's terms all tie (df=1, tf=1) → term-ASC break
    assert rows[(4, 1)] == "about"
    assert (5, 1) not in rows                      # empty doc: no row

    con = duckdb.connect()
    con.register("docs", docs_pd)
    want = con.execute(r"""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
      FROM docs
    ), tf AS (
      SELECT doc_id, dl, term, count(*) AS tf FROM (
        SELECT doc_id, len(toks) AS dl, unnest(toks) AS term
        FROM base WHERE len(toks) > 0)
      GROUP BY doc_id, dl, term
    ), dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    stats AS (SELECT count(*) AS n_docs FROM base WHERE len(toks) > 0),
    scored AS (
      SELECT doc_id, term,
             round((tf * 1.0 / dl) * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0)
                   + 1e-9, 4) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN stats
    )
    SELECT doc_id, term, tfidf,
           CAST(row_number() OVER (PARTITION BY doc_id
                ORDER BY tfidf DESC, term) AS INT) AS rank
    FROM scored QUALIFY rank <= 3
    """).df().sort_values(["doc_id", "rank"]).reset_index(drop=True)
    got = out.toPandas().sort_values(["doc_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-9)

    postings, stats = bm25_index(docs)
    prebuilt = tfidf_keywords(None, k=3, postings=postings,
                              corpus_stats=stats).toPandas() \
        .sort_values(["doc_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, prebuilt, check_dtype=False)

    with pytest.raises(ValueError, match="supplied together"):
        tfidf_keywords(docs, postings=postings)
