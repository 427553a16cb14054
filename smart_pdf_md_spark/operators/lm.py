"""Corpus language-model scoring — the CCNet-style quality signal (Wenzek
et al., "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data", LREC 2020): score every document by how well a language model of the
corpus predicts it, then split each language into head/middle/tail
perplexity buckets. CCNet trains a 5-gram KenLM; this operator family is
the distributed unigram formulation of the same signal — exact, two
DataFrame passes, no external model artifact — which is the proxy a
100 TB pipeline can afford to recompute per snapshot.

Spark-first shape:
- the term-frequency table is ONE explode + groupBy over the scan (the
  same postings shape as BM25's index — at 10^12 files write it once and
  reuse);
- per-document scoring joins the exploded token stream against the
  frequency table on `term` — vocabulary-sized right side, plain
  equi-shuffle, no UDF anywhere;
- bucket assignment is an exact per-stratum percent_rank (the
  adaptive_quality_filter discipline: deterministic at any parallelism,
  doc_id tie-break, ANSI-expressible for the DuckDB oracle).

All scores are rounded with the repo's +1e-9 epsilon so the oracle
compares bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import tokens_col


def unigram_logprob(docs: DataFrame | None, text_col: str = "text",
                    id_col: str = "doc_id",
                    postings: DataFrame | None = None) -> DataFrame:
    """→ (doc_id, n_tokens, avg_logprob) — the mean log10 unigram
    probability of the document's tokens under the corpus' own empirical
    unigram distribution (maximum-likelihood, no smoothing needed: every
    scored token was counted, so p > 0 by construction).

    Lower (more negative) = rarer vocabulary = farther from the corpus
    head; CCNet's "perplexity" ordering with ppl = 10^(−avg_logprob).
    Empty docs emit no row (no tokens to score — the sub-token rule).

    Shuffle accounting: the first groupBy's map-side combine collapses
    the exploded token stream to per-document DISTINCT term counts before
    its exchange (documents are contiguous within scan partitions), the
    corpus tf table aggregates that already-reduced relation, and the
    scoring join + weighted mean move per-doc-distinct rows — the token
    stream itself never crosses the wire. The (doc_id, term, cnt) shape
    is exactly retrieval.bm25_index's postings table: at 10^12 files
    materialize it once and feed both — pass that table as ``postings``
    (its ``tf`` column is the count; ``docs`` is then unused and may be
    None) and the corpus is never re-exploded for a repeat scoring run."""
    if postings is not None:
        per_doc = postings.select("doc_id", "term",
                                  F.col("tf").alias("cnt"))
    else:
        if docs is None:
            raise ValueError("docs is required when postings is not "
                             "supplied (see retrieval.bm25_index)")
        toks = tokens_col(F.col(text_col))
        per_doc = (docs.select(F.col(id_col).alias("doc_id"),
                               F.explode(toks).alias("term"))
                   .groupBy("doc_id", "term").agg(F.count("*").alias("cnt")))
    tf = per_doc.groupBy("term").agg(F.sum("cnt").alias("tf"))
    total = tf.agg(F.sum("tf").alias("total"))
    return (per_doc.join(tf, "term")
            .crossJoin(F.broadcast(total))
            .groupBy("doc_id")
            .agg(F.sum("cnt").cast("int").alias("n_tokens"),
                 F.round((F.sum(F.col("cnt") *
                                F.log10(F.col("tf") / F.col("total")))
                          / F.sum("cnt")) + 1e-9, 4).alias("avg_logprob")))


def ppl_buckets(docs: DataFrame, by: str = "lang",
                head: float = 0.33, middle: float = 0.66,
                text_col: str = "text", id_col: str = "doc_id",
                postings: DataFrame | None = None,
                model: str = "unigram") -> DataFrame:
    """→ input columns + (avg_logprob, ppl_rank, ppl_bucket) — CCNet's
    head/middle/tail split, exact: within each `by` stratum, rank docs by
    avg_logprob DESC (least surprising first; ties by doc_id) and label
    percent_rank ≤ head as 'head', ≤ middle as 'middle', else 'tail'.
    Downstream recipes keep head+middle, or sample tail at a discount.
    Token-less docs score no LM signal and are excluded (inner join back
    to docs), matching unigram_logprob's sub-token rule.

    Plan shape: ranking runs over the SLIM (id, stratum, score) relation
    — the document stream (text and friends) never enters the window
    sort's exchange and crosses the wire exactly once, in the final
    label-reattachment join (which AQE broadcasts whenever the label side
    fits). A prebuilt ``postings`` table (retrieval.bm25_index) skips the
    corpus re-explosion exactly as in :func:`unigram_logprob`; ``docs``
    is still needed for the stratum column and the final reattach.

    ``model="bigram"`` ranks by the Jelinek-Mercer interpolated bigram LM
    instead (:func:`bigram_logprob` — order-sensitive: word salad falls
    to the tail even with a corpus-typical token multiset; ``postings``
    does not apply there, the bigram table is its own one-pass build).
    Sub-2-token docs are excluded under the bigram model (nothing to
    score), matching each scorer's own sub-token rule."""
    if model == "unigram":
        scored = unigram_logprob(docs, text_col, id_col,
                                 postings=postings).drop("n_tokens")
    elif model == "bigram":
        if postings is not None:
            raise ValueError("postings does not apply to model='bigram'")
        scored = bigram_logprob(docs, text_col, id_col).drop("n_bigrams")
    else:
        raise ValueError(f"unknown model: {model!r}")
    slim = (scored.withColumnRenamed("doc_id", id_col)
            .join(docs.select(id_col, by), id_col))
    w = Window.partitionBy(by).orderBy(F.desc("avg_logprob"), id_col)
    rk = F.round(F.percent_rank().over(w) + 1e-9, 4)
    bucket = F.when(F.col("ppl_rank") <= head, F.lit("head")) \
        .when(F.col("ppl_rank") <= middle, F.lit("middle")) \
        .otherwise(F.lit("tail"))
    labels = (slim.withColumn("ppl_rank", rk)
              .withColumn("ppl_bucket", bucket)
              .drop(by))
    return docs.join(labels, id_col)


def bigram_logprob(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   lam: float = 0.7) -> DataFrame:
    """→ (doc_id, n_bigrams, avg_logprob) — mean log10 probability of the
    document's token BIGRAMS under a Jelinek-Mercer-interpolated bigram
    model of the corpus itself:

        p(w2|w1) = lam · c(w1,w2)/c(w1,·)  +  (1−lam) · p_uni(w2)

    The order-sensitive upgrade of :func:`unigram_logprob`: shuffled or
    word-salad text scores near its unigram mass, fluent text gains the
    bigram term — the closer-to-KenLM half of the CCNet signal that the
    unigram proxy misses. Interpolation with the unigram distribution
    keeps every probability > 0 (the corpus contains each scored token),
    so no discounting bookkeeping is needed. Docs with < 2 tokens emit
    no row (no bigram to score — the sub-token rule).

    Plan shape mirrors unigram_logprob: the exploded bigram stream
    collapses map-side to per-doc distinct (w1, w2, cnt) rows before its
    exchange; the corpus bigram table and the w1-context totals aggregate
    that reduced relation; scoring is two vocabulary-sized equi-joins +
    one broadcast total — no UDF, ANSI-expressible (DuckDB parity pinned
    in tests/test_lm_novelty.py)."""
    toks = tokens_col(F.col(text_col))
    big = F.expr(
        f"transform(slice({'_tk'}, 1, size(_tk) - 1), "
        f"(t, i) -> struct(t as w1, _tk[i + 1] as w2))")
    # NOTE (r10, measured): localCheckpoint'ing per_doc for its five
    # consumers was A/B'd at sf0.1 and is timing-neutral (ratio 0.97) —
    # AQE's runtime stage reuse already dedupes the identical map-side
    # exchanges, so only cheap reduce-side re-aggregations remain. Kept
    # lazy (composability; ppl_buckets wraps this).
    per_doc = (docs.select(F.col(id_col).alias("doc_id"),
                           toks.alias("_tk"))
               .filter(F.size("_tk") >= 2)
               .select("doc_id", F.explode(big).alias("b"))
               .groupBy("doc_id", "b.w1", "b.w2")
               .agg(F.count("*").alias("cnt")))
    bi = per_doc.groupBy("w1", "w2").agg(F.sum("cnt").alias("c12"))
    ctx = bi.groupBy("w1").agg(F.sum("c12").alias("c1"))
    # unigram distribution over the SCORED positions (second tokens),
    # consistent with the bigram stream so both terms share support
    uni = per_doc.groupBy("w2").agg(F.sum("cnt").alias("cu"))
    tot = uni.agg(F.sum("cu").alias("total"))
    p = (F.lit(lam) * F.col("c12") / F.col("c1") +
         F.lit(1.0 - lam) * F.col("cu") / F.col("total"))
    return (per_doc
            .join(bi, ["w1", "w2"]).join(ctx, "w1").join(uni, "w2")
            .crossJoin(F.broadcast(tot))
            .groupBy("doc_id")
            .agg(F.sum("cnt").cast("int").alias("n_bigrams"),
                 F.round(F.sum(F.col("cnt") * F.log10(p)) / F.sum("cnt")
                         + 1e-9, 4).alias("avg_logprob")))


def domain_divergence(docs: DataFrame, by: str = "source",
                      text_col: str = "text",
                      smooth: float = 0.5) -> DataFrame:
    """→ (domain, n_tokens, n_types, kl) — KL(P_domain ‖ P_corpus) of
    each domain's Laplace-smoothed unigram distribution against the whole
    corpus': the corpus-drift / typicality audit a mixture designer reads
    before setting weights (a domain with tiny KL adds little diversity;
    a huge-KL domain shifts the model — the signal behind DSIR's
    KL-reduction objective, Xie et al. 2023). Smoothing (+``smooth`` per
    vocabulary type) keeps every log finite, so KL is defined even for a
    domain that misses most of the vocabulary.

    100 TB shape — the absent-word trick: naively KL sums over
    |vocabulary| × |domains| terms (10^8 × 10^3 rows). Split the sum at
    words PRESENT in the domain: present words are a domain-sized join
    against the vocabulary table; the absent remainder has constant
    domain probability p0 = smooth/(N_d + smooth·V), so it collapses to
      p0 · [ n_absent·ln p0  −  (S_all − S_present) ]
    with S_all = Σ_w ln P_corpus(w) ONE corpus-level scalar and
    S_present a per-domain join-sized agg — no domain×vocabulary
    blow-up, ANSI-expressible (DuckDB parity pinned in tests; the same
    decomposition runs on both engines)."""
    toks = (docs.select(F.col(by).alias("domain"),
                        F.explode(tokens_col(F.col(text_col)))
                        .alias("word")))
    dom_w = toks.groupBy("domain", "word").agg(F.count("*").alias("c_dw"))
    vocab = dom_w.groupBy("word").agg(F.sum("c_dw").alias("c_w"))
    dom_n = dom_w.groupBy("domain").agg(
        F.sum("c_dw").alias("n_d"),
        F.count("*").alias("n_types"))
    tot = vocab.agg(
        F.sum("c_w").alias("n_tot"),
        F.count("*").alias("v")).withColumn("_j", F.lit(1))

    # corpus log-prob of every word, once; S_all is one scalar
    pw = vocab.crossJoin(F.broadcast(tot)).select(
        "word", "c_w",
        F.log((F.col("c_w") + smooth) /
              (F.col("n_tot") + smooth * F.col("v"))).alias("ln_pw"))
    s_all = pw.agg(F.sum("ln_pw").alias("s_all")).withColumn("_j", F.lit(1))

    present = (dom_w.join(pw, "word")
               .join(F.broadcast(dom_n), "domain")
               .crossJoin(F.broadcast(tot.select("v")))
               .select(
                   "domain",
                   ((F.col("c_dw") + smooth) /
                    (F.col("n_d") + smooth * F.col("v"))).alias("p_dw"),
                   "ln_pw")
               .groupBy("domain")
               .agg(F.sum(F.col("p_dw") *
                          (F.log("p_dw") - F.col("ln_pw")))
                    .alias("kl_present"),
                    F.sum("ln_pw").alias("s_present"),
                    F.count("*").alias("n_present")))

    out = (dom_n.join(present, "domain")
           .crossJoin(F.broadcast(tot.join(s_all, "_j").drop("_j"))))
    p0 = smooth / (F.col("n_d") + smooth * F.col("v"))
    n_absent = F.col("v") - F.col("n_present")
    kl_absent = p0 * (n_absent * F.log(p0) -
                      (F.col("s_all") - F.col("s_present")))
    return out.select(
        "domain",
        F.col("n_d").cast("bigint").alias("n_tokens"),
        F.col("n_types").cast("int").alias("n_types"),
        F.round(F.col("kl_present") + kl_absent + 1e-9, 4).alias("kl"))
