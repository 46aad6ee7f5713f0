"""Structured Streaming incremental index ingest.

The reference is batch-only (SURVEY §2.12); this is the Spark-native
extension for continuously-arriving transcripts: a file-source stream
over the transcripts directory, `foreachBatch` tokenizing each
micro-batch with the SAME Arrow kernel as the batch build and appending
postings under ``postings_stream/epoch=<id>``. Exactly-once per epoch:
the write goes to a tmp dir and is atomically renamed; a replayed epoch
(checkpoint restart) overwrites the same directory idempotently.

Dictionary/stats finalization stays a periodic batch job over
postings ∪ postings_stream (BM25 corpus constants must be pinned per
snapshot — SURVEY §7.3 — so they are NOT updated per micro-batch).
``trigger(availableNow=True)`` makes the same code a catch-up batch.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..index.tokenize import tokenize_turns

TRANSCRIPTS_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def start_incremental_ingest(
    spark: SparkSession,
    input_dir: str,
    index_root: str,
    ngrams: int = 1,
    analyzer: str = "reference",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start (or resume, via checkpoint) the streaming postings ingest.

    Returns the StreamingQuery; callers await ``awaitTermination()``.
    """
    out_root = os.path.join(index_root, "postings_stream")
    ckpt = os.path.join(index_root, "stream_checkpoint")
    os.makedirs(out_root, exist_ok=True)

    reader = spark.readStream.schema(TRANSCRIPTS_DDL)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        postings = tokenize_turns(batch_df, ngrams=ngrams, analyzer=analyzer)
        final_dir = os.path.join(out_root, f"epoch={epoch_id}")
        tmp_dir = os.path.join(out_root, f"._tmp_epoch_{epoch_id}")
        if os.path.isdir(tmp_dir):
            shutil.rmtree(tmp_dir)
        postings.write.mode("overwrite").parquet(tmp_dir)
        if os.path.isdir(final_dir):
            shutil.rmtree(final_dir)  # replayed epoch: idempotent rewrite
        os.replace(tmp_dir, final_dir)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", ckpt
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def load_stream_postings(spark: SparkSession, index_root: str) -> DataFrame:
    return spark.read.parquet(os.path.join(index_root, "postings_stream"))
