"""Incremental graph-statistics maintenance over the committed-snapshot
protocol — degrees today; the same delta-merge pattern fits any stat that
merges by key (triangle-per-node counts, component sizes).

A long-lived KG deployment appends triples continuously; recomputing
graph stats over the full corpus per batch is the anti-pattern this module
replaces. Formulation (all through plans/manifests — the Iceberg-shaped
commit layer the rest of the repo uses):

    edges_state    append-only DISTINCT (subj, obj) set. New batches
                   anti-join the committed state, so redelivery of a batch
                   (foreachBatch retries, at-least-once sources) appends
                   nothing — the merge is idempotent.
    degrees_state  per-node (out_degree, in_degree), updated by a
                   full-outer SUM with the batch's DELTA degrees. Records
                   its upstream edges_state run_id via the manifests dep
                   mechanism.

Crash safety: the edge append and the degree merge are two commits and
cannot be atomic together. A kill between them leaves degrees_state STALE
(dep run_id mismatch) — the next call detects that and rebuilds degrees
from the full committed edge set (exact self-heal), then resumes the
cheap delta path. Per-batch cost is O(batch + degree-table), never
O(total edges) on the healthy path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.manifests import (
    commit_stage,
    read_stage,
    stage_committed,
    stage_fresh,
)

_EDGES = "edges_state"
_DEGREES = "degrees_state"


def _degrees_of(edges: DataFrame) -> DataFrame:
    out_deg = edges.groupBy(F.col("subj").alias("node")) \
        .agg(F.count("*").alias("out_degree"))
    in_deg = edges.groupBy(F.col("obj").alias("node")) \
        .agg(F.count("*").alias("in_degree"))
    return (out_deg.join(in_deg, "node", "full_outer")
            .select("node",
                    F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
                    F.coalesce("in_degree", F.lit(0)).alias("in_degree")))


def _heal_if_stale(spark: SparkSession, run_dir: str) -> None:
    """Rebuild degrees_state from the full committed edge set when a prior
    run died between the edge append and the degree merge (or degrees were
    never committed despite committed edges)."""
    if not stage_committed(run_dir, _EDGES):
        return
    if stage_fresh(run_dir, _DEGREES, deps=[_EDGES]):
        return
    commit_stage(_degrees_of(read_stage(spark, run_dir, _EDGES)),
                 run_dir, _DEGREES, ["node"], deps=[_EDGES])


def update_degree_state(spark: SparkSession, run_dir: str,
                        batch_triples: DataFrame) -> DataFrame:
    """Merge one batch of triples into the persistent degree table; returns
    the committed degrees_state. Idempotent under redelivery."""
    _heal_if_stale(spark, run_dir)

    delta = batch_triples.select("subj", "obj").distinct()
    have_edges = stage_committed(run_dir, _EDGES)
    if have_edges:
        delta = delta.join(read_stage(spark, run_dir, _EDGES),
                           ["subj", "obj"], "left_anti")
    # materialize BEFORE the append commit — the lazy anti-join would
    # otherwise re-read the state it is about to extend and see nothing new
    delta = delta.localCheckpoint(eager=True)

    if delta.count() == 0:
        if stage_committed(run_dir, _DEGREES):
            return read_stage(spark, run_dir, _DEGREES)
        return commit_stage(_degrees_of(delta), run_dir, _DEGREES,
                            ["node"], deps=[_EDGES])

    commit_stage(delta, run_dir, _EDGES, ["subj", "obj"],
                 mode="append" if have_edges else "overwrite")

    delta_deg = _degrees_of(delta)
    if stage_committed(run_dir, _DEGREES):
        prev = read_stage(spark, run_dir, _DEGREES)
        merged = (prev.withColumnsRenamed(
                      {"out_degree": "o0", "in_degree": "i0"})
                  .join(delta_deg.withColumnsRenamed(
                      {"out_degree": "o1", "in_degree": "i1"}),
                      "node", "full_outer")
                  .select(
                      "node",
                      (F.coalesce("o0", F.lit(0)) +
                       F.coalesce("o1", F.lit(0))).alias("out_degree"),
                      (F.coalesce("i0", F.lit(0)) +
                       F.coalesce("i1", F.lit(0))).alias("in_degree")))
    else:
        merged = delta_deg
    return commit_stage(merged, run_dir, _DEGREES, ["node"], deps=[_EDGES])


def streaming_degrees(spark: SparkSession, run_dir: str, stream: DataFrame,
                      checkpoint_dir: str, available_now: bool = True):
    """foreachBatch composition: maintain degrees_state from a triple
    stream. Exactly-once EFFECT despite at-least-once batch delivery —
    the edge anti-join makes a redelivered batch a no-op."""
    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        update_degree_state(spark, run_dir, batch_df)

    writer = stream.writeStream.foreachBatch(_sink) \
        .option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


_CC = "cc_labels"


def update_cc_state(spark: SparkSession, run_dir: str,
                    batch_edges: DataFrame) -> DataFrame:
    """Incremental connected components — streaming entity canonicalization:
    maintain (name, component=min name) labels as edge batches arrive,
    without ever re-reading past edges.

    STAR COMPRESSION: the committed labels are a spanning star forest of
    everything seen so far (every name points at its component root), and a
    star forest connects exactly the same components as the full edge
    history. So each batch runs plain CC over (label star edges ∪ new batch
    edges) — transitively identical to CC over ALL edges ever seen, at
    O(state + batch) cost with star diameter ≤ 2, so the fixpoint converges
    in a couple of rounds regardless of how long the deployment has run.
    Min-label roots are stable: min(merged set) = min of the mins.

    One OVERWRITE commit per batch (labels double as the seen-name roster:
    isolated names keep component = self), so unlike the two-stage degree
    path there is no torn-commit window, and redelivery is idempotent —
    re-adding edges the labels already encode changes nothing."""
    from ..operators.cc import connected_components

    batch = batch_edges.select("name_a", "name_b").distinct()
    roster = batch.select(F.col("name_a").alias("name")).union(
        batch.select(F.col("name_b").alias("name"))).distinct()
    edges = batch
    if stage_committed(run_dir, _CC):
        prev = read_stage(spark, run_dir, _CC)
        star = prev.filter(F.col("name") != F.col("component")).select(
            F.col("component").alias("name_a"), F.col("name").alias("name_b"))
        edges = edges.unionByName(star)
        roster = roster.union(prev.select("name")).distinct()
    labels = connected_components(edges)
    out = (roster.join(labels, "name", "left")
           .select("name",
                   F.coalesce("component", F.col("name")).alias("component")))
    return commit_stage(out, run_dir, _CC, ["name", "component"])
