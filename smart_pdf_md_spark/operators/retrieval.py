"""Lexical retrieval over the documents table: BM25 top-k search.

The embedding side of similarity search lives in operators/similarity.py
(brute-force / LSH / IVF); this is its sparse counterpart — the classic
probabilistic ranking function (Robertson & Spärck Jones; the Okapi BM25
formulation, TREC-3 1994) a corpus user runs to find training documents
matching a query set, to spot-check dedup clusters, or to mine hard
negatives for retrieval training.

Spark-first shape, no UDFs anywhere:
- per-document term frequencies are one explode + groupBy over the scan;
- corpus statistics (N, avgdl) ride along as a broadcast 1-row frame —
  no driver collect;
- document frequencies join broadcast (vocabulary-sized);
- the query side is tiny → its term table broadcasts, so scoring touches
  only postings of query terms (hits-sized), never the full corpus;
- top-k per query is one window over the hits.

Semantics are deliberately ANSI-expressible (the DuckDB parity pin lives
in tests): tokens = whitespace split of trimmed text, scores rounded to 4
decimals with the repo's +1e-9 epsilon, ties broken by doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import tokens_col


def bm25_topk(docs: DataFrame, queries: DataFrame, k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id",
              query_text_col: str = "query", query_id_col: str = "query_id",
              ) -> DataFrame:
    """→ (query_id, doc_id, score, rank) — the k best documents per query
    under BM25 with idf = ln(1 + (N − df + 0.5)/(df + 0.5)) (the
    non-negative "+1" variant Lucene uses) and the standard tf saturation
    tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).

    Documents sharing no term with a query simply don't appear (no zero
    rows at corpus scale); a query with fewer than k matches returns what
    exists."""
    toks = tokens_col(F.col(text_col))
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks")) \
               .select("doc_id", "toks", F.size("toks").alias("dl")) \
               .filter(F.col("dl") > 0)

    tf = (base.select("doc_id", "dl", F.explode("toks").alias("term"))
          .groupBy("doc_id", "dl", "term")
          .agg(F.count("*").alias("tf")))

    stats = base.agg(F.count("*").alias("n_docs"),
                     F.avg("dl").alias("avgdl"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))

    qterms = (queries.select(F.col(query_id_col).alias("query_id"),
                             F.explode(F.array_distinct(
                                 tokens_col(F.col(query_text_col))))
                             .alias("term")))

    idf = F.log(F.lit(1.0) +
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    sat = (F.col("tf") * (k1 + 1)) / \
        (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    scored = (tf.join(F.broadcast(qterms), "term")
              .join(F.broadcast(df_.join(F.broadcast(qterms.select("term").distinct()),
                                         "term")), "term")
              .crossJoin(F.broadcast(stats))
              .groupBy("query_id", "doc_id")
              .agg(F.round(F.sum(idf * sat) + 1e-9, 4).alias("score")))

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
