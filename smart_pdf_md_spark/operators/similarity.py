"""Similarity search over an embedding column (`array<float>`).

Two paths, same result shape (query_id, neighbor_id, cosine, rank):

- brute-force top-k — the exact baseline: broadcast the (small) query set,
  score every corpus vector with pure Column exprs (zip_with dot product —
  JVM-side, codegen'd), window top-k per query. At 100 TB: one scan, no
  shuffle except the final per-query top-k (tiny).
- LSH-bucketed (random hyperplanes) — the approximate scale path: sign-bit
  bucket both sides, join on bucket, score only in-bucket. Probing P
  hyperplane tables bounds recall loss; the candidate join is |bucket|²
  not n². Deterministic: hyperplanes are seeded.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DIM_SEED = 42


def _cosine(a, b) -> object:
    # compute in float64 regardless of storage type (float32 parquet) so the
    # result is engine-portable (matches a DOUBLE[]-cast DuckDB oracle)
    a = a.cast("array<double>")
    b = b.cast("array<double>")
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def topk_bruteforce(emb: DataFrame, queries: DataFrame, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    `queries` has the same schema as `emb` (typically a tiny filtered subset
    → broadcast). Self-matches excluded. Ties broken by neighbor id for
    determinism."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                F.round(_cosine(F.col("qv"), F.col("nv")) + 1e-9, 4).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def _hyperplanes(dim: int, n_planes: int, table: int) -> np.ndarray:
    rng = np.random.RandomState(_DIM_SEED + table)
    return rng.normal(size=(n_planes, dim)).astype("float64")


def _bucket_col(vec_col: str, planes: np.ndarray):
    """sign-bit bucket id as a Column expr: bit i = (v·plane_i) > 0.
    Planes enter the plan as array literals — no UDF, no broadcast var."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(F.zip_with(F.col(vec_col), plane, lambda x, y: x * y),
                          F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return bucket


def topk_lsh(emb: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_planes: int = 8, n_tables: int = 4, dim: int = 64) -> DataFrame:
    """Approximate top-k: candidates = union over hash tables of same-bucket
    vectors, then exact cosine + window top-k on the candidate set."""
    cand = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, t)
        c = emb.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("nv"),
                       _bucket_col(vec_col, planes).alias("bucket"))
        q = queries.select(F.col(id_col).alias("query_id"),
                           F.col(vec_col).alias("qv"),
                           _bucket_col(vec_col, planes).alias("bucket"))
        p = c.join(F.broadcast(q), "bucket").filter(
            F.col("neighbor_id") != F.col("query_id"))
        p = p.select("query_id", "neighbor_id", "qv", "nv")
        cand = p if cand is None else cand.unionByName(p)
    cand = cand.dropDuplicates(["query_id", "neighbor_id"])
    scored = cand.select(
        "query_id", "neighbor_id",
        F.round(_cosine(F.col("qv"), F.col("nv")) + 1e-9, 4).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def ann_recall(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """recall@k of the approximate result vs the exact baseline, per query."""
    e = exact.select("query_id", "neighbor_id")
    a = approx.select("query_id", F.col("neighbor_id").alias("got"))
    hit = e.join(a, (e.query_id == a.query_id) & (e.neighbor_id == a.got)) \
           .groupBy(e.query_id).agg(F.count("*").alias("hits"))
    tot = e.groupBy("query_id").agg(F.count("*").alias("total"))
    return (tot.join(hit, "query_id", "left")
            .select("query_id",
                    F.round(F.coalesce(F.col("hits"), F.lit(0)) /
                            F.col("total"), 4).alias("recall")))
