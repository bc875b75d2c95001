"""Batch/streaming sinks — where query and projection results land.

The reference's results live in Postgres tables (its storage *is*
Postgres). Spark-first, the same roles are: parquet/Delta tables for
analytical results, the event log itself for result streams
(``projections.batch.write_result_stream`` / ``streaming
.start_continuous``), and JDBC for pushing compact result sets back
into an operational database. This module covers the generic table
sinks; the log-append sinks live next to the projection engine.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame


def to_parquet(df: DataFrame, path: str, *, mode: str = "overwrite",
               partition_by: Optional[list[str]] = None,
               sort_within_partitions: Optional[list[str]] = None) -> None:
    """Write a result table as parquet. ``partition_by`` gives
    directory-level pruning for downstream readers; ``sort_within
    _partitions`` gives row-group min/max pruning (the same layout trick
    the event log uses for position ranges)."""
    out = df
    if sort_within_partitions:
        out = out.sortWithinPartitions(*sort_within_partitions)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def to_jdbc(df: DataFrame, url: str, table: str, *, mode: str = "append",
            batch_size: int = 10_000, num_partitions: Optional[int] = None,
            properties: Optional[dict] = None) -> None:
    """Push a (compact) result set to an operational database over JDBC
    — the "Structured Streaming + Postgres sink" leg of the design.

    Each partition opens one connection and writes ``batch_size``-row
    batches; cap ``num_partitions`` so a 1000-executor job doesn't open
    1000 connections against one Postgres. Results only — never route
    corpus-scale data through JDBC. Requires the JDBC driver jar on the
    Spark classpath (not bundled in this environment; the call is
    standard ``DataFrameWriter.jdbc``)."""
    out = df.coalesce(num_partitions) if num_partitions else df
    props = {"batchsize": str(batch_size)}
    props.update(properties or {})
    out.write.mode(mode).options(**props).jdbc(url, table, properties=props)


def stream_to_parquet(stream_df: DataFrame, path: str, *,
                      checkpoint_dir: str, trigger_once: bool = False):
    """Append a streaming DataFrame to a parquet table with exactly-once
    file-sink semantics (Spark's transactional file sink + checkpoint).
    Returns the started StreamingQuery."""
    writer = (stream_df.writeStream.format("parquet")
              .option("path", path)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
