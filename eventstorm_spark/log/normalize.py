"""Normalize an external event feed into the engine's envelope schema.

Maps the driver's ``events.parquet`` (event_id, ts, user_id, event_type,
value, props) onto the reference storage schema
(``internal/backend/backend.go:39-53``) exactly as specified in
FIXTURES.md §C: streams are per-user, position is the global (ts,
event_id) order, revision the per-stream order.

Scale note: the global ``row_number`` here is a *fixture bootstrap* — it
is how a batch dump acquires positions, and it implies a global sort
(single-partition window). In the live engine positions are assigned
incrementally at append time by the single-writer commit path
(``EventLog.append``), never recomputed globally; reads then rely on
(stream-bucket, position) layout for pruning. At 100 TB you would run
this bootstrap once as a sort-merge job (repartitionByRange on (ts,
event_id) + two-pass offset add), not as one window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from eventstorm_spark.functions.scalars import wallclock_micros
from eventstorm_spark.model import META_CONTENT_TYPE, META_CREATED, META_TYPE


def normalize_events(raw: DataFrame) -> DataFrame:
    """events.parquet feed -> envelope DataFrame (EVENT_SCHEMA order)."""
    w_all = W.orderBy("ts", "event_id")
    w_stream = W.partitionBy("stream").orderBy("ts", "event_id")
    # NTZ-safe: the driver parquet stores ts as timestamp[us] without tz
    created = (wallclock_micros("ts") * F.lit(10)).cast("long")
    return (
        raw.withColumn("stream", F.concat(F.lit("user-"), F.col("user_id").cast("string")))
        .withColumn("uuid", F.concat(F.lit("evt-"), F.col("event_id").cast("string")))
        .withColumn("data", F.col("props"))
        .withColumn("event_type", F.col("event_type"))
        .withColumn("content_type", F.lit("application/json"))
        .withColumn("created", created)
        .withColumn(
            "metadata",
            F.create_map(
                F.lit(META_TYPE), F.col("event_type"),
                F.lit(META_CONTENT_TYPE), F.lit("application/json"),
                F.lit(META_CREATED), created.cast("string"),
            ),
        )
        .withColumn("custom_metadata", F.lit(None).cast("binary"))
        .withColumn("position", F.row_number().over(w_all).cast("long"))
        .withColumn("revision", (F.row_number().over(w_stream) - F.lit(1)).cast("long"))
        .select(
            "stream", "uuid", "data", "metadata", "custom_metadata",
            "revision", "position", "event_type", "content_type", "created",
        )
    )


# The DuckDB-equivalent of normalize_events, used to build oracle SQL twins.
# Kept adjacent to the Spark code so the two stay in sync.
NORMALIZE_EVENTS_ORACLE_SQL = """
SELECT
    'user-' || CAST(user_id AS VARCHAR)  AS stream,
    'evt-' || CAST(event_id AS VARCHAR)  AS uuid,
    props                                AS data,
    CAST(epoch_us(ts) * 10 AS BIGINT)    AS created,
    event_type                           AS event_type,
    'application/json'                   AS content_type,
    CAST(row_number() OVER (ORDER BY ts, event_id) AS BIGINT) AS position,
    CAST(row_number() OVER (PARTITION BY 'user-' || CAST(user_id AS VARCHAR)
                            ORDER BY ts, event_id) - 1 AS BIGINT) AS revision
FROM events
"""
