"""Round-6 training-data operators: CCNet-style unigram LM scoring +
perplexity buckets, per-domain caps, cross-document n-gram novelty."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from smart_pdf_md_spark.operators import dedup as D
from smart_pdf_md_spark.operators import lm as LM
from smart_pdf_md_spark.operators import textstats as TS


def test_unigram_logprob_known_values(spark):
    """Hand-checked corpus: p(a)=4/8, p(b)=2/8, p(c)=p(d)=1/8; per-doc
    means follow; the empty doc emits no row."""
    docs = spark.createDataFrame(
        [(1, "a a b c"), (2, "a a b d"), (3, "")], ["doc_id", "text"])
    got = {r.doc_id: r for r in LM.unigram_logprob(docs).collect()}
    assert set(got) == {1, 2}
    lp = lambda p: math.log10(p)  # noqa: E731
    want1 = (2 * lp(0.5) + lp(0.25) + lp(0.125)) / 4
    assert got[1].n_tokens == 4
    assert abs(got[1].avg_logprob - round(want1 + 1e-9, 4)) < 5e-5
    assert got[1].avg_logprob == got[2].avg_logprob  # symmetric docs


def test_unigram_logprob_duckdb_parity_and_partitioning_invariance(spark):
    """Full-frame DuckDB parity on a mixed corpus (board-rotation
    candidate) and identical output at 1-way vs 8-way input."""
    import duckdb
    import pandas as pd

    rows = [(i, " ".join(f"w{j % (3 + i % 5)}" for j in range(10 + i)))
            for i in range(30)] + [(98, ""), (99, "unique tokens only here")]
    docs_pd = pd.DataFrame(rows, columns=["doc_id", "text"])
    docs = spark.createDataFrame(docs_pd)
    got = LM.unigram_logprob(docs).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.register("documents", docs_pd)
    want = con.execute(r"""
    WITH terms AS (
      SELECT doc_id, unnest(toks) AS term FROM (
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
        FROM documents)
    ), per_doc AS (
      SELECT doc_id, term, count(*) AS cnt FROM terms GROUP BY doc_id, term
    ), tf AS (
      SELECT term, sum(cnt) AS tf FROM per_doc GROUP BY term
    ), total AS (SELECT sum(tf) AS total FROM tf)
    SELECT doc_id, CAST(sum(cnt) AS INT) AS n_tokens,
           round(sum(cnt * log10(tf / total)) / sum(cnt) + 1e-9, 4)
             AS avg_logprob
    FROM per_doc JOIN tf USING (term) CROSS JOIN total
    GROUP BY doc_id ORDER BY doc_id
    """).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-9)

    a = LM.unigram_logprob(docs.repartition(1)).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = LM.unigram_logprob(docs.repartition(8)).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_unigram_logprob_prebuilt_postings_matches_inline(spark):
    """The docstring's "materialize once and feed both" promise (r6
    VERDICT next-round #4): scoring against retrieval.bm25_index's
    postings table is bit-identical to the inline path, for both
    unigram_logprob and ppl_buckets; docs=None without postings raises."""
    import pandas as pd

    from smart_pdf_md_spark.operators.retrieval import bm25_index

    rows = [(i, " ".join(f"w{j % (3 + i % 5)}" for j in range(10 + i)),
             "en" if i % 2 else "pt")
            for i in range(30)] + [(98, "", "en"), (99, "only here", "pt")]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    postings, _ = bm25_index(docs)

    inline = LM.unigram_logprob(docs).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    prebuilt = LM.unigram_logprob(None, postings=postings).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(inline, prebuilt)

    b_inline = LM.ppl_buckets(docs).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b_prebuilt = LM.ppl_buckets(docs, postings=postings).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(b_inline, b_prebuilt)

    with pytest.raises(ValueError, match="docs is required"):
        LM.unigram_logprob(None)


def test_ppl_buckets_exact_split(spark):
    """Head/middle/tail per stratum: rare-vocab docs land in the tail,
    head-vocab docs in the head; bucket shares follow the cut points; the
    token-less doc is excluded (no LM signal)."""
    rows = []
    for i in range(9):  # doc i repeats common tokens, rarer with i
        body = " ".join(["the common words"] * (9 - i) +
                        [f"rare{i}_{j}" for j in range(i * 3)])
        rows.append((i, body, "en"))
    rows.append((9, "", "en"))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = LM.ppl_buckets(docs, by="lang")
    got = {r.doc_id: r.ppl_bucket for r in out.collect()}
    assert 9 not in got                      # empty doc has no LM row
    assert got[0] == "head" and got[8] == "tail"
    # buckets are contiguous in rank order
    order = [got[i] for i in range(9)]
    assert order == sorted(order, key=("head", "middle", "tail").index)


def test_cap_per_group_keeps_best_n(spark):
    """Top-n per domain by (quality desc, doc_id): a 20-doc mega-domain is
    cut to n, small domains survive whole, ranks are audit-ready, and the
    kept set is the deterministic best."""
    rows = [(i, "mega.example", float(i % 7)) for i in range(20)]
    rows += [(100 + i, "small.example", float(i)) for i in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "quality"])
    out = TS.cap_per_group(df, "source", n=5, order_col="quality").collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r.source, []).append(r)
    assert len(by_dom["mega.example"]) == 5
    assert len(by_dom["small.example"]) == 3
    # best-first: i%7 puts two 6s (i=6,13) and three 5s (i=5,12,19) on top
    kept_q = sorted((r.quality for r in by_dom["mega.example"]), reverse=True)
    assert kept_q == [6.0, 6.0, 5.0, 5.0, 5.0]
    assert all(r.group_rank <= 5 for r in out)


def test_cap_per_group_plan_uses_window_group_limit(spark):
    """The rank<=n filter must push into the window sort (top-n per key,
    never a full-group materialization) — the property that makes a
    mega-domain cost its heap, not its row count."""
    import io
    from contextlib import redirect_stdout

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("source"),
        F.rand(1).alias("quality"))
    buf = io.StringIO()
    with redirect_stdout(buf):
        TS.cap_per_group(df, "source", n=5).explain("formatted")
    assert "WindowGroupLimit" in buf.getvalue()


def test_ngram_novelty_known_values_and_duckdb_parity(spark):
    """Planted corpus: a fully-copied doc scores novelty 0, a unique doc
    1.0, a half-boilerplate doc in between; counts match a DuckDB oracle
    over string grams; sub-n-token docs emit n_grams=0, novelty 1.0."""
    import duckdb
    import pandas as pd

    boiler = "standard header used by every page here today ok"
    docs_pd = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [boiler,                                  # copy A
                 boiler,                                  # copy B
                 boiler + " plus original analysis of the results",
                 " ".join(f"u{j}" for j in range(12)),    # fully novel
                 "too short"],                            # < 3 tokens
    })
    docs = spark.createDataFrame(docs_pd)
    got = {r.id: r for r in D.ngram_novelty(docs).collect()}
    assert got[1].novelty == 0.0 and got[2].novelty == 0.0
    assert got[4].novelty == 1.0 and got[4].shared_grams == 0
    assert got[5].n_grams == 0 and got[5].novelty == 1.0
    assert 0.0 < got[3].novelty < 1.0

    con = duckdb.connect()
    con.register("docs", docs_pd)
    want = con.execute(r"""
    WITH g AS (
      SELECT doc_id, CASE WHEN len(tk) < 3 THEN []::VARCHAR[]
             ELSE list_distinct(list_transform(range(1, len(tk) - 1),
                  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) END AS grams
      FROM (SELECT doc_id,
              CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                   ELSE regexp_split_to_array(trim(text), '\s+') END AS tk
            FROM docs)
    ), post AS (
      SELECT gram, count(*) AS pn FROM (
        SELECT doc_id, unnest(grams) AS gram FROM g) GROUP BY gram
    ), shared_set AS (
      SELECT coalesce(list(gram) FILTER (pn > 1), []::VARCHAR[]) AS sg
      FROM post
    )
    SELECT g.doc_id, len(grams) AS n_grams,
           len(list_filter(grams, x -> list_contains(sg, x))) AS shared
    FROM g CROSS JOIN shared_set
    """).df().set_index("doc_id")
    for did, r in got.items():
        assert want.loc[did, "n_grams"] == r.n_grams, did
        assert want.loc[did, "shared"] == r.shared_grams, did


def test_ngram_novelty_plan_is_linear(spark):
    """No self-join, no pair generation: the plan contains exactly the
    postings aggregation joins — no CartesianProduct and only inner joins
    on the shingle/posting relation."""
    import io
    from contextlib import redirect_stdout

    from smart_pdf_md_spark.sources.tables import load_table
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    buf = io.StringIO()
    with redirect_stdout(buf):
        D.ngram_novelty(docs).explain("formatted")
    p = buf.getvalue()
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_bigram_logprob_order_sensitivity_and_duckdb_parity(spark):
    """The interpolated bigram LM ranks fluent (corpus-typical bigram)
    text above its own word salad — the signal unigram_logprob cannot
    see (identical token multiset) — and matches a DuckDB recomputation
    of the Jelinek-Mercer formula bit-for-bit."""
    import duckdb
    import pandas as pd

    from smart_pdf_md_spark.operators.lm import bigram_logprob, unigram_logprob

    fluent = "the quick brown fox jumps over the lazy dog"
    salad = "dog the over quick lazy jumps fox brown the"  # same multiset
    rows = [(i, fluent) for i in range(6)]
    rows.append((100, salad))
    rows.append((101, "one"))        # sub-2-token → no row
    docs_pd = pd.DataFrame(rows, columns=["doc_id", "text"])
    docs = spark.createDataFrame(docs_pd)

    got = {r.doc_id: r for r in bigram_logprob(docs).collect()}
    assert 101 not in got
    assert got[0].avg_logprob > got[100].avg_logprob     # order matters
    uni = {r.doc_id: r for r in unigram_logprob(docs).collect()}
    assert uni[0].avg_logprob == uni[100].avg_logprob    # blind to order

    con = duckdb.connect()
    con.register("docs", docs_pd)
    want = con.execute(r"""
    WITH tk AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+') END AS t
      FROM docs
    ), per_doc AS (
      SELECT doc_id, w1, w2, count(*) AS cnt FROM (
        SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        FROM tk, UNNEST(range(1, len(t))) AS u(i)
        WHERE len(t) >= 2)
      GROUP BY doc_id, w1, w2
    ), bi AS (SELECT w1, w2, sum(cnt) AS c12 FROM per_doc GROUP BY w1, w2),
    ctx AS (SELECT w1, sum(c12) AS c1 FROM bi GROUP BY w1),
    uni AS (SELECT w2, sum(cnt) AS cu FROM per_doc GROUP BY w2),
    tot AS (SELECT sum(cu) AS total FROM uni)
    SELECT doc_id, CAST(sum(cnt) AS INT) AS n_bigrams,
           round(sum(cnt * log10(0.7 * c12 / c1 + 0.3 * cu / total))
                 / sum(cnt) + 1e-9, 4) AS avg_logprob
    FROM per_doc JOIN bi USING (w1, w2) JOIN ctx USING (w1)
         JOIN uni USING (w2) CROSS JOIN tot
    GROUP BY doc_id ORDER BY doc_id
    """).df()
    got_pd = bigram_logprob(docs).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_pd, want, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-9)


def test_ppl_buckets_bigram_model_demotes_word_salad(spark):
    """model='bigram': the order-sensitive ranking sends a scrambled doc
    to the tail where the unigram model (blind to order) cannot separate
    it from its fluent twin; unigram behavior is unchanged by default;
    postings= is rejected under the bigram model."""
    import pytest

    from smart_pdf_md_spark.operators.lm import ppl_buckets

    fluent = "the quick brown fox jumps over the lazy dog"
    rows = [(i, fluent, "en") for i in range(8)]
    rows.append((100, "dog the over quick lazy jumps fox brown the", "en"))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])

    bi = {r.doc_id: r for r in ppl_buckets(docs, model="bigram").collect()}
    assert bi[100].ppl_bucket == "tail"
    assert all(bi[i].avg_logprob > bi[100].avg_logprob for i in range(8))

    uni = {r.doc_id: r for r in ppl_buckets(docs).collect()}
    assert uni[100].avg_logprob == uni[0].avg_logprob   # order-blind

    with pytest.raises(ValueError, match="postings"):
        ppl_buckets(docs, model="bigram", postings=docs)
    with pytest.raises(ValueError, match="unknown model"):
        ppl_buckets(docs, model="trigram")


def test_domain_divergence_numpy_and_duckdb_parity(spark):
    """KL(P_domain || P_corpus): a domain sampled from the corpus head
    scores near 0, a disjoint-vocabulary domain scores far higher; the
    absent-word decomposition equals a brute-force numpy KL over the
    full vocabulary (1e-9), and the same decomposition in DuckDB matches
    bit-for-bit (board-candidate SQL twin)."""
    import math

    import duckdb
    import numpy as np
    import pandas as pd

    from smart_pdf_md_spark.operators.lm import domain_divergence

    common = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, common, "typical") for i in range(8)]
    rows += [(100 + i, common + f" extra{i} words{i}", "near") for i in range(4)]
    rows += [(200 + i, " ".join(f"alien{i}x{j}" for j in range(12)), "far")
             for i in range(4)]
    docs_pd = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    docs = spark.createDataFrame(docs_pd)
    sm = 0.5

    got = {r.domain: r for r in domain_divergence(docs, smooth=sm).collect()}
    assert got["typical"].kl < got["near"].kl < got["far"].kl
    assert got["typical"].kl < 0.05

    # brute-force numpy KL over the FULL vocabulary
    from collections import Counter
    all_c: Counter = Counter()
    dom_c: dict = {}
    for _, text, dom in rows:
        toks = text.split()
        all_c.update(toks)
        dom_c.setdefault(dom, Counter()).update(toks)
    vocab = sorted(all_c)
    v, n_tot = len(vocab), sum(all_c.values())
    pw = np.array([(all_c[w] + sm) / (n_tot + sm * v) for w in vocab])
    for dom, c in dom_c.items():
        n_d = sum(c.values())
        pd_arr = np.array([(c[w] + sm) / (n_d + sm * v) for w in vocab])
        want = float((pd_arr * (np.log(pd_arr) - np.log(pw))).sum())
        assert abs(got[dom].kl - round(want + 1e-9, 4)) <= 1e-4, dom
        assert got[dom].n_tokens == n_d

    con = duckdb.connect()
    con.register("docs", docs_pd)
    want_df = con.execute(rf"""
    WITH toks AS (
      SELECT source AS domain, unnest(regexp_split_to_array(trim(text),
             '\s+')) AS word
      FROM docs WHERE length(trim(text)) > 0
    ), dw AS (
      SELECT domain, word, count(*) AS c_dw FROM toks GROUP BY 1, 2
    ), vocab AS (SELECT word, sum(c_dw) AS c_w FROM dw GROUP BY word),
    dn AS (SELECT domain, sum(c_dw) AS n_d, count(*) AS n_types
           FROM dw GROUP BY domain),
    tot AS (SELECT sum(c_w) AS n_tot, count(*) AS v FROM vocab),
    pw AS (SELECT word, ln((c_w + {sm}) / (n_tot + {sm} * v)) AS ln_pw
           FROM vocab CROSS JOIN tot),
    sall AS (SELECT sum(ln_pw) AS s_all FROM pw),
    pres AS (
      SELECT domain,
             sum(((c_dw + {sm}) / (n_d + {sm} * v)) *
                 (ln((c_dw + {sm}) / (n_d + {sm} * v)) - ln_pw))
               AS kl_present,
             sum(ln_pw) AS s_present, count(*) AS n_present
      FROM dw JOIN pw USING (word) JOIN dn USING (domain) CROSS JOIN tot
      GROUP BY domain
    )
    SELECT domain, CAST(n_d AS BIGINT) AS n_tokens,
           CAST(n_types AS INT) AS n_types,
           round(kl_present +
                 ({sm} / (n_d + {sm} * v)) *
                 ((v - n_present) * ln({sm} / (n_d + {sm} * v))
                  - (s_all - s_present)) + 1e-9, 4) AS kl
    FROM dn JOIN pres USING (domain) CROSS JOIN tot CROSS JOIN sall
    ORDER BY domain
    """).df()
    got_df = (domain_divergence(docs, smooth=sm).toPandas()
              .sort_values("domain").reset_index(drop=True))
    pd.testing.assert_frame_equal(got_df, want_df, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-9)


def test_domain_divergence_plan_no_vocab_blowup(spark):
    """Scale pin: the absent-word decomposition must not build a
    domain x vocabulary relation — no CartesianProduct /
    BroadcastNestedLoopJoin except against 1-row broadcast stats."""
    import io
    from contextlib import redirect_stdout

    from smart_pdf_md_spark.operators.lm import domain_divergence

    docs = spark.createDataFrame(
        [(1, "a b c d", "x"), (2, "c d e f", "y")],
        ["doc_id", "text", "source"])
    buf = io.StringIO()
    with redirect_stdout(buf):
        domain_divergence(docs).explain("formatted")
    assert "CartesianProduct" not in buf.getvalue()
    # the only nested-loop joins are against the broadcast 1-row stats
    # frames (tot / s_all) — count PLAN NODES (tree string, not the
    # formatted details which repeat each node name)
    tree = domain_divergence(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    # every BNLJ here has a 1-row aggregated build side (tot appears in
    # three consumers, s_all in one; no reuse across them) — bounded by
    # the number of stats crossJoins, never data-dependent
    assert tree.count("BroadcastNestedLoopJoin") <= 6
    assert "CartesianProduct" not in tree
