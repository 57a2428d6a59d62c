"""Streaming crawl ingest — the continuously-arriving twin of the
batch WARC -> documents path (readers/warc.py + ops/text.html_extract).

A production crawl corpus GROWS: new .warc.gz archives land in a
directory (or bucket prefix) as fetchers finish. This operator watches
the directory with Structured Streaming's ``binaryFile`` file source
used purely as a FILE-ARRIVAL NOTIFIER — only the ``path`` column is
selected, so Spark's binaryFile column pruning never materializes
archive bytes in the stream; each micro-batch then hands the newly
arrived file list to the BATCH reader, which fans the bytes out across
the cluster with its byte-range gzip-member splits. That keeps the two
ingestion modes (backfill over an existing crawl, tail-ingest of a
live one) on ONE decode + extraction code path — the same twin
discipline as streaming/events.py.

Exactly-once: the extracted documents append to a Delta table through
``commit_batch_idempotent`` stamped with txn(app_id, epoch); an
at-least-once foreachBatch replay of an epoch is a no-op, proven by
the replay test. The driver only ever holds the micro-batch FILE LIST
(bounded, like Delta's per-file descriptors), never record data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def read_warc_arrivals(spark: SparkSession, src_dir: str,
                       max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming source of newly arrived archive paths (path-only
    projection — binaryFile prunes the content column away)."""
    reader = (
        spark.readStream.format("binaryFile")
        .schema(_BINARYFILE_SCHEMA)
        .option("pathGlobFilter", "*.warc*")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(src_dir).select("path")


def warc_batch_to_documents(spark: SparkSession, paths: list[str],
                            split_bytes: int = 32 << 20) -> DataFrame:
    """The shared batch pipeline: WARC response records -> HTML title +
    text columns. Used by both backfill callers and each micro-batch."""
    from drill_spark.ops.text import html_extract
    from drill_spark.readers.warc import read_warc

    recs = read_warc(spark, paths, split_bytes=split_bytes)
    pages = (
        recs.filter(F.col("warc_type") == "response")
        .select(
            F.col("target_uri").alias("url"),
            F.col("warc_date").alias("fetched_at"),
            F.decode(F.col("payload"), "UTF-8").alias("html"),
            F.col("file").alias("src_file"),
            "record_offset",
        )
    )
    return html_extract(pages, html_col="html").drop("html")


def stream_crawl_ingest(
    spark: SparkSession,
    src_dir: str,
    out_path: str,
    checkpoint_dir: str,
    app_id: str = "drill_spark_crawl_ingest",
    split_bytes: int = 32 << 20,
    trigger: dict | None = None,
    max_files_per_trigger: int | None = None,
):
    """Start the tail-ingest stream: new archives -> extracted document
    rows appended exactly-once to the Delta table at ``out_path``."""
    from drill_spark.streaming.events import commit_batch_idempotent

    def _commit(batch_df: DataFrame, epoch_id: int) -> None:
        # bounded driver materialization: the arrival FILE LIST only
        paths = [r["path"].removeprefix("file:")
                 for r in batch_df.select("path").collect()]
        if not paths:
            return
        docs = warc_batch_to_documents(spark, paths, split_bytes=split_bytes)
        commit_batch_idempotent(docs, out_path, app_id, epoch_id)

    return (
        read_warc_arrivals(spark, src_dir,
                           max_files_per_trigger=max_files_per_trigger)
        .writeStream.foreachBatch(_commit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger if trigger is not None else {"availableNow": True}))
        .start()
    )
