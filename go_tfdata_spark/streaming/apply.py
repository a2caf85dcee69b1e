"""Streaming ingest: readStream -> foreachBatch(apply_changes) -> lake MERGE.

Exactly-once layering (SURVEY.md §2.9):
- Spark's streaming checkpoint (offsets/commits under `checkpoint_dir`)
  guarantees each source file is assigned to exactly one batchId and that
  batchIds replay deterministically after a crash — but foreachBatch bodies
  re-EXECUTE at-least-once;
- the engine's ledger (the (job_id, epoch=batchId) summary inside the lake's
  atomic manifest commit) makes the re-execution idempotent: a replayed
  batchId finds itself committed and skips.

Together: exactly-once table state, resumable from checkpoint — the property
the reference's sink explicitly lacks (tfdata/core/tfrecord.go:62 documents
corruption on partial write; tfrecord.go:170-175 unordered async drain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from go_tfdata_spark.lake.table import LakeTable
from go_tfdata_spark.operators.merge import apply_changes


def start_ingest(
    table: LakeTable,
    stream_df: DataFrame,
    job_id: str,
    checkpoint_dir: str,
    available_now: bool = True,
    processing_time: str | None = None,
    on_batch=None,
    **apply_kwargs,
) -> StreamingQuery:
    """Start the ingest query. `available_now=True` drains all currently
    available input then stops (the batch-replay-shaped trigger); pass
    `processing_time` for a continuous micro-batch cadence. `on_batch`
    (optional) is called with each batch's ApplyResult AFTER its lake
    commit — a metrics/observability hook (also used by tests to inject a
    crash between the lake commit and Spark's checkpoint commit, the
    at-least-once window the ledger must absorb)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        r = apply_changes(table, batch_df, job_id=job_id, epoch=int(batch_id), **apply_kwargs)
        if on_batch is not None:
            on_batch(r)

    writer = stream_df.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
