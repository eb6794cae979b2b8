"""Structured-Streaming incremental ingestion into the lakehouse table.

The reference has no streams (SURVEY.md §2.3: batch-only decision for
the engine core) — but its append+compact habit
(/root/reference/fupi/embedders.py:124-128) maps naturally onto an
incremental micro-batch ingest: a file-source ``readStream`` feeds
``foreachBatch``, each micro-batch commits one atomic snapshot through
the metadata layer, and compaction runs periodically to fold the
resulting small files.

Semantics: exactly-once table state per micro-batch. The streaming
checkpoint records which source files each batch consumed; the sink
side is idempotent against re-delivery because a re-run of batch N
under the same job id finds its snapshot already committed (job-id
guard below) — the classic foreachBatch + transactional-sink recipe.

Scale notes: this is the 100 TB continuous-ingest path — executors
scale with source file arrival rate; the per-batch commit is O(files),
not O(rows); watermarking/windowed aggs compose upstream of
foreachBatch if the pipeline needs them (none of the reference's
semantics do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import meta
from .schema import CLIPS_SCHEMA


def stream_clips_into_table(
    spark: SparkSession,
    source_dir: str,
    table: meta.Table,
    checkpoint_dir: str,
    max_files_per_trigger: int = 16,
    available_now: bool = True,
):
    """Incrementally append parquet clip files landing in ``source_dir``
    into ``table``; one snapshot per micro-batch."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        job_id = f"stream-b{batch_id:08d}"
        # idempotence: if this batch already committed (failure between
        # commit and checkpoint advance), skip the re-delivery
        committed = {
            s["summary"].get("job_id") for s in table.lineage_chain()
        }
        if job_id in committed:
            return
        meta.append(table, batch_df, job_id=job_id)

    reader = (
        spark.readStream.schema(CLIPS_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
    )
    writer = reader.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
