"""System projections — EventStoreDB's built-in index projections.

EventStoreDB ships standard projections that maintain link-event index
streams: ``$by_category`` (events of stream ``a-b`` linked into
``$ce-a``), ``$by_event_type`` (into ``$et-<type>``), ``$streams`` (the
first event of every stream into ``$streams``) and ``$stream_by_category``
(one link per stream into ``$category-<cat>``). The reference implements
none of them (SURVEY §2.5 scope note: system projections absent;
``internal/projections/projection.go`` has no standard-projection code) —
but a user of the real product relies on them, so we provide the batch
materialization as pure DataFrame transforms.

Nothing here needs a stateful fold: every system projection is a
*stateless* mapping of the envelope plus a per-link-stream revision
assignment, so each lowers to a scan + window (one shuffle on the link
stream key) instead of an applyInPandas fold. At 100 TB the window
shuffles only the (slim) link rows — the payload columns are pruned
before the exchange, and the revision window runs per link stream, which
is exactly the partitioning the output will be written in.

The dense 0-based per-stream revision of the envelope (assigned at
append) is what makes ``$streams``/``$stream_by_category`` cheap: "first
event of a stream" is the literal predicate ``revision = 0`` — no
groupBy-min over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from eventstorm_spark.log.store import LINK_EVENT

# Default category separator. EventStoreDB's $by_category config defaults
# to splitting on the FIRST '-' ("first" mode).
SEPARATOR = "-"

_LINK_OUT = ["stream", "event_type", "data", "link_revision", "source_position"]


def _links(df: DataFrame, link_stream) -> DataFrame:
    """Envelope rows -> `$>` link rows into ``link_stream`` (a Column),
    with dense per-link-stream revisions in source-position order."""
    slim = df.select(
        link_stream.alias("__ls"),
        F.concat(F.col("revision").cast("string"), F.lit("@"), F.col("stream"))
        .alias("data"),
        F.col("position").alias("source_position"),
    )
    w = W.partitionBy("__ls").orderBy("source_position")
    return slim.select(
        F.col("__ls").alias("stream"),
        F.lit(LINK_EVENT).alias("event_type"),
        "data",
        (F.row_number().over(w) - 1).cast("long").alias("link_revision"),
        "source_position",
    )


def _user_streams(events: DataFrame) -> DataFrame:
    """System streams (`$...`) never feed system projections."""
    return events.where(~F.col("stream").startswith("$"))


def by_category(events: DataFrame, separator: str = SEPARATOR) -> DataFrame:
    """``$by_category``: every event of a categorizable stream
    (``<cat><sep>...``) linked into ``$ce-<cat>``."""
    src = _user_streams(events).where(F.instr(F.col("stream"), separator) > 0)
    cat = F.substring_index(F.col("stream"), separator, 1)
    return _links(src, F.concat(F.lit("$ce-"), cat))


def by_event_type(events: DataFrame) -> DataFrame:
    """``$by_event_type``: every event with a non-system type linked into
    ``$et-<type>``."""
    src = _user_streams(events).where(
        F.col("event_type").isNotNull() & ~F.col("event_type").startswith("$"))
    return _links(src, F.concat(F.lit("$et-"), F.col("event_type")))


def streams_index(events: DataFrame) -> DataFrame:
    """``$streams``: the first event (revision 0) of every stream linked
    into the single ``$streams`` stream."""
    src = _user_streams(events).where(F.col("revision") == 0)
    return _links(src, F.lit("$streams"))


def stream_by_category(events: DataFrame, separator: str = SEPARATOR) -> DataFrame:
    """``$stream_by_category``: one link per stream (its revision-0 event)
    into ``$category-<cat>``."""
    src = _user_streams(events).where(
        (F.col("revision") == 0) & (F.instr(F.col("stream"), separator) > 0))
    cat = F.substring_index(F.col("stream"), separator, 1)
    return _links(src, F.concat(F.lit("$category-"), cat))


def materialize(events: DataFrame, log, which=None) -> int:
    """Append the system-projection link streams to the log (the durable
    form EventStoreDB maintains continuously). Idempotence comes from the
    deterministic link uuids; at 100 TB you run each projection as its
    own job and write per link stream."""
    from eventstorm_spark.model import NewEvent

    builders = {
        "$by_category": by_category,
        "$by_event_type": by_event_type,
        "$streams": streams_index,
        "$stream_by_category": stream_by_category,
    }
    total = 0
    for name in (which or builders):
        rows = (builders[name](events)
                .orderBy("stream", "link_revision").collect())
        by_stream: dict[str, list] = {}
        for r in rows:
            by_stream.setdefault(r["stream"], []).append(NewEvent(
                uuid=f"{name}-{r['stream']}-{r['link_revision']}",
                event_type=LINK_EVENT,
                data=r["data"],
                content_type="application/octet-stream",
            ))
        for stream, evs in by_stream.items():
            log.append(stream, evs)
            total += len(evs)
    return total
