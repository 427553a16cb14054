"""Structured-Streaming incremental extraction.

`readStream` over the repo_files directory (file source tracks processed
files in the checkpoint — the streaming analogue of the J4 anti-join), the
SAME extraction stage as batch (mapInPandas is streaming-compatible), and
`foreachBatch` so each micro-batch commits through the manifest protocol.

This gives exactly-once extraction over a growing corpus without any change
to the operator code — the batch/streaming split is only at the source/sink
boundary, which is the Spark-idiomatic shape for it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

REPO_FILES_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("commit", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("content", T.StringType()),
])


def stream_mentions(spark: SparkSession, corpus_dir: str,
                    max_files_per_trigger: int = 64) -> DataFrame:
    """Streaming DataFrame of extracted mention/status rows."""
    from ..plans.pipeline import build_mentions

    stream = (
        spark.readStream.schema(REPO_FILES_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(corpus_dir)
    )
    return build_mentions(spark, stream)


def run_incremental(spark: SparkSession, corpus_dir: str, out_dir: str,
                    checkpoint_dir: str, once: bool = True):
    """Start (and with once=True, drain) the incremental extraction query.

    Each micro-batch appends to `out_dir` parquet; the streaming checkpoint
    guarantees a file is extracted exactly once across restarts — the
    streaming counterpart of plans/manifests.pending_inputs.
    """
    mentions = stream_mentions(spark, corpus_dir)

    def commit_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    writer = (
        mentions.writeStream.outputMode("append")
        .foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
