"""DSIR-style importance weighting — Data Selection via Importance
Resampling (Xie et al., NeurIPS 2023): score every raw document by how
much more likely its hashed n-gram features are under a small TARGET
corpus (the distribution you want more of — e.g. curated reference text)
than under the raw corpus itself, then resample the raw pool toward the
target. The standard recipe for tilting a 100 TB crawl toward a quality
distribution without training a classifier.

Features are hashed unigrams + bigrams (the paper's choice) bucketed into
``n_buckets`` — gram identity comes from textstats.gram_hash_arr (per-token
xxhash64 + rotate-xor combine, no gram strings ever built), so the whole
feature pass is scan-side Column work.

Spark-first shape:
- both bucket DISTRIBUTIONS are single groupBys bounded by ``n_buckets``
  rows (map-side combinable; the target corpus is small by definition);
- the per-bucket log ratio table is a ``n_buckets``-bounded broadcast —
  per-document scoring is one broadcast join + one groupBy, never a
  shuffle of anything corpus-sized beyond the doc→bucket feature counts;
- totals ride as broadcast 1-row frames (no driver collect anywhere);
- resampling is deterministic Gumbel-top-k on the slim (id, key) relation
  — a pure function of (doc_id, salt), so resumes and re-partitionings
  keep the exact sample (the weighted_sample contract).

No DuckDB oracle (xxhash64 has no DuckDB twin — the sketches.py rule);
parity is pinned in tests/test_importance.py by recomputing the log-ratio
arithmetic in numpy from the operator's own feature tables, plus
planted-signal and partitioning-invariance gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import gram_hash_arr

N_BUCKETS = 10_000


def dsir_features(docs: DataFrame, n_buckets: int = N_BUCKETS,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, bucket, cnt) — hashed unigram+bigram feature counts per
    document, bucketed by pmod into ``n_buckets``. One scan-side select
    (gram hashes are Columns) + one map-side-combinable groupBy."""
    text = F.col(text_col)
    grams = F.concat(gram_hash_arr(text, 1), gram_hash_arr(text, 2))
    return (docs.select(F.col(id_col).alias("doc_id"),
                        F.explode(grams).alias("g"))
            .select("doc_id", F.pmod("g", F.lit(n_buckets)).alias("bucket"))
            .groupBy("doc_id", "bucket").agg(F.count("*").alias("cnt")))


def _bucket_dist(feats: DataFrame) -> DataFrame:
    """(bucket, n) — corpus-level feature counts; ≤ n_buckets rows."""
    return feats.groupBy("bucket").agg(F.sum("cnt").alias("n"))


def dsir_logratio(raw: DataFrame, target: DataFrame,
                  n_buckets: int = N_BUCKETS, smoothing: float = 1.0,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, n_feats, log_ratio) for every raw doc with ≥1 feature:
    log_ratio = Σ_b cnt_b · ln(p_target(b) / p_raw(b)), with each
    distribution add-``smoothing`` smoothed over the full bucket space.
    Positive = looks more like the target than like the raw corpus; this
    is the log importance weight DSIR resamples by. Feature-less docs
    (empty text) emit no row — the unigram_logprob sub-token rule.

    The ratio table is built once (two ``n_buckets``-bounded aggs, full
    outer joined) and broadcast; raw-doc scoring touches only the
    (doc_id, bucket, cnt) relation."""
    raw_feats = dsir_features(raw, n_buckets, text_col, id_col)
    tgt_feats = dsir_features(target, n_buckets, text_col, id_col)
    raw_dist = _bucket_dist(raw_feats)
    tgt_dist = _bucket_dist(tgt_feats)
    raw_tot = raw_dist.agg(F.sum("n").alias("raw_tot"))
    tgt_tot = tgt_dist.agg(F.sum("n").alias("tgt_tot"))

    lr = (raw_dist.withColumnRenamed("n", "raw_n")
          .join(tgt_dist.withColumnRenamed("n", "tgt_n"), "bucket", "full")
          .crossJoin(F.broadcast(raw_tot)).crossJoin(F.broadcast(tgt_tot))
          .select(
              "bucket",
              (F.log((F.coalesce("tgt_n", F.lit(0)) + smoothing) /
                     (F.col("tgt_tot") + smoothing * n_buckets)) -
               F.log((F.coalesce("raw_n", F.lit(0)) + smoothing) /
                     (F.col("raw_tot") + smoothing * n_buckets)))
              .alias("lr")))
    return (raw_feats.join(F.broadcast(lr), "bucket")
            .groupBy("doc_id")
            .agg(F.sum("cnt").cast("int").alias("n_feats"),
                 F.round(F.sum(F.col("cnt") * F.col("lr")) + 1e-9, 4)
                 .alias("log_ratio")))


def dsir_resample(scored: DataFrame, n: int,
                  id_col: str = "doc_id", weight_col: str = "log_ratio",
                  temperature: float = 1.0,
                  salt: str = "dsir_v1") -> DataFrame:
    """Deterministic Gumbel-top-``n`` resample WITHOUT replacement from
    softmax(weight/temperature) — the DSIR selection step. Each row's key
    is weight/T + Gumbel noise derived from pmod(xxhash64(id, salt), 1e6)
    (a pure function of the row, so any cluster size, resume, or
    re-partitioning draws the SAME sample; distinct salts decorrelate
    successive draws). Returns the selected rows with their ``_gumbel_key``
    for auditing.

    The selection compiles to TakeOrderedAndProject (per-partition top-n
    heaps merged at the driver, n rows each) — NEVER a global
    single-partition window sort; only the n selected rows leave the
    executors."""
    u = (F.pmod(F.xxhash64(F.col(id_col).cast("string"), F.lit(salt)),
                F.lit(1_000_000)).cast("double") + 0.5) / 1_000_000.0
    gumbel = -F.log(-F.log(u))
    keyed = scored.withColumn(
        "_gumbel_key",
        F.round(F.col(weight_col) / temperature + gumbel + 1e-9, 6))
    return keyed.orderBy(F.desc("_gumbel_key"), id_col).limit(n)
