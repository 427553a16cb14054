"""Streaming sketch maintenance — cross-restart cardinality and
heavy-hitter telemetry over an unbounded key stream, in KB-sized committed
state, never re-reading history.

Three committed stages (plans/manifests protocol, same run_dir semantics
as every other pipeline here):

    stream_hll    (bucket, rho) HLL registers of DISTINCT keys ever seen
    stream_cms    (row, bucket, cnt) Count-Min table of key OCCURRENCES
    stream_cands  heavy-hitter CANDIDATE keys: the union of each
                  micro-batch's exact local top-k (the practical
                  SpaceSaving compromise — CMS alone cannot enumerate)
    stream_mg     (key, est) Misra-Gries summary — bounded-state heavy
                  hitters with the lower-bound + N/(k+1) guarantee,
                  merged per batch (additive → epoch-guarded like CMS)
    stream_bk     bottom-k/KMV uniform sample of distinct keys ever
                  seen — a fixed-size random sample of the stream that
                  never re-reads history (KMV merge; idempotent under
                  replay since the merge dedupes the row set)

Exactly-once discipline (streaming/incremental.py): the streaming
checkpoint stops source data from re-entering, and every foreachBatch
commit is epoch-keyed. The HLL is max-merge — idempotent under replay by
construction. The CMS is ADDITIVE, so a replayed epoch (crash between the
sink commit and the checkpoint write) must NOT re-add: each epoch
overwrites the merged snapshot with run_id = its epoch id, and a replay
that finds its own epoch already committed skips the merge.

Query side: :func:`heavy_hitters` reads the committed state and returns
candidates whose CMS estimate clears a threshold — estimates are one-sided
(never under the true count, overestimate ≤ e/w of stream length w.h.p.),
so the threshold filter has no false negatives AMONG the candidates; a key
that was never locally frequent in any micro-batch can be missed, which is
the documented candidate-set trade every bounded-state heavy-hitter scheme
makes (Misra-Gries/SpaceSaving included).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import (
    bottomk_merge,
    bottomk_sample,
    cms_merge,
    cms_query,
    cms_table,
    hll_estimate,
    hll_merge,
    hll_registers,
    mg_merge,
    mg_summary,
)
from .incremental import REPO_FILES_SCHEMA  # noqa: F401  (re-export for callers)

_HLL, _CMS, _CANDS = "stream_hll", "stream_cms", "stream_cands"
_MG, _BK = "stream_mg", "stream_bk"


def run_sketch_stream(stream_df: DataFrame, run_dir: str,
                      checkpoint_dir: str, key_cols: list[str],
                      d: int = 4, w: int = 1024, p: int = 12,
                      batch_topk: int = 32, mg_k: int = 64,
                      bk_k: int = 256, once: bool = True):
    """Start (and with once=True, drain) the sketch-maintenance query over
    a streaming DataFrame. Per micro-batch: merge the batch's HLL
    registers (max), add its CMS counts (sum, epoch-idempotent), and union
    its exact local top-``batch_topk`` keys into the candidate stage."""
    from ..plans.manifests import commit_stage, read_stage, stage_committed, stage_run_id

    # the replay guard compares the committed stage's run_id to this
    # epoch's — but foreachBatch epoch ids restart at 0 under a FRESH
    # checkpoint dir (or a second stream) over the same run_dir, and a
    # colliding run_id would make commit_batch silently skip merging real
    # new data (ADVICE r7). Namespace the epoch with the checkpoint dir:
    # a resumed stream (same checkpoint) keeps its namespace so replayed
    # epochs still dedupe; a fresh checkpoint gets a fresh namespace and
    # its epoch 0 merges like any new batch.
    import hashlib
    import os
    _ns = hashlib.sha256(
        os.path.realpath(checkpoint_dir).encode()).hexdigest()[:12]

    def commit_batch(batch_df: DataFrame, epoch_id: int) -> None:
        rid = f"{_ns}-epoch{epoch_id:06d}"
        spark = batch_df.sparkSession
        keys = batch_df.select(*key_cols)

        # HLL: max-merge — safe to re-apply on replay, but skip for symmetry
        if stage_run_id(run_dir, _HLL) != rid:
            regs = hll_registers(keys, key_cols, p=p)
            if stage_committed(run_dir, _HLL):
                regs = hll_merge(read_stage(spark, run_dir, _HLL), regs)
            commit_stage(regs.coalesce(1), run_dir, _HLL,
                         ["bucket", "rho"], run_id=rid)

        # CMS: ADDITIVE — the epoch guard is what makes replay exactly-once
        if stage_run_id(run_dir, _CMS) != rid:
            cms = cms_table(keys, key_cols, d=d, w=w)
            if stage_committed(run_dir, _CMS):
                cms = cms_merge(read_stage(spark, run_dir, _CMS), cms)
            commit_stage(cms.coalesce(1), run_dir, _CMS,
                         ["row", "bucket"], run_id=rid)

        # candidates: exact local top-k of THIS batch, unioned (distinct)
        if stage_run_id(run_dir, _CANDS) != rid:
            top = (keys.groupBy(*key_cols).agg(F.count("*").alias("n"))
                   .orderBy(F.desc("n"), *key_cols).limit(batch_topk)
                   .drop("n"))
            if stage_committed(run_dir, _CANDS):
                top = top.unionByName(
                    read_stage(spark, run_dir, _CANDS)).distinct()
            commit_stage(top.coalesce(1), run_dir, _CANDS,
                         key_cols, run_id=rid)

        # Misra-Gries: additive merge -> the epoch guard makes replay
        # exactly-once, same as CMS; state stays <= mg_k rows
        if stage_run_id(run_dir, _MG) != rid:
            key = (keys.select(F.concat_ws("\x1f", *key_cols)
                               .alias("mg_key"))
                   if len(key_cols) > 1 else
                   keys.select(F.col(key_cols[0]).alias("mg_key")))
            mg = mg_summary(key, "mg_key", mg_k)
            if stage_committed(run_dir, _MG):
                mg = mg_merge(mg_k, read_stage(spark, run_dir, _MG), mg)
            commit_stage(mg.coalesce(1), run_dir, _MG,
                         ["key"], run_id=rid)

        # bottom-k sample: KMV merge over the distinct-key set — the
        # merge dedupes, so replay is idempotent by construction
        if stage_run_id(run_dir, _BK) != rid:
            bk = bottomk_sample(keys.distinct(), bk_k, key_cols=key_cols)
            if stage_committed(run_dir, _BK):
                bk = bottomk_merge(bk_k, read_stage(spark, run_dir, _BK),
                                   bk)
            commit_stage(bk.coalesce(1), run_dir, _BK,
                         key_cols, run_id=rid)

    writer = (stream_df.writeStream.outputMode("append")
              .foreachBatch(commit_batch)
              .option("checkpointLocation", checkpoint_dir))
    if once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def heavy_hitters(spark: SparkSession, run_dir: str, key_cols: list[str],
                  min_count: int = 1, d: int = 4, w: int = 1024) -> DataFrame:
    """→ candidate keys + est_count (CMS point estimate, ≥ true count),
    filtered to est_count ≥ min_count, best-first. One read of the two
    KB-sized committed tables — no stream replay, no history scan."""
    from ..plans.manifests import read_stage

    cands = read_stage(spark, run_dir, _CANDS)
    cms = read_stage(spark, run_dir, _CMS)
    return (cms_query(cms, cands, key_cols, d=d, w=w)
            .filter(F.col("est_count") >= min_count)
            .orderBy(F.desc("est_count"), *key_cols))


def distinct_keys_estimate(spark: SparkSession, run_dir: str,
                           p: int = 12) -> float:
    """Cardinality of all keys ever streamed, from the committed HLL."""
    from ..plans.manifests import read_stage

    return hll_estimate(read_stage(spark, run_dir, _HLL), p=p)
