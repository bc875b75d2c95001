"""Batch replay of a projection over the event log.

Distributed equivalent of feeding every historical event through
``Projection.Update`` (``internal/projections/projection.go:399-414``) in
position order: the event table is filtered by the projection's selector,
shuffled once on the partition key, and each group is folded inside an
``applyInPandas`` UDF that sorts by ``position`` and replays the chain.

Scale properties:
- exactly ONE shuffle (the groupBy on the partition key); selector and
  column pruning happen before it, so only the envelope columns the fold
  needs cross the wire;
- state lives executor-side per group — the driver never sees events;
- the per-group sort happens inside the UDF because ``applyInPandas``
  does not guarantee intra-group order (SURVEY §7.4 risk 2);
- when the partition key is expressible as a SQL column
  (``partition_by(..., column=...)`` or ``foreach_stream``) the key is
  computed JVM-side; an arbitrary Python key fn falls back to a
  ``mapInPandas`` pass (Arrow-batched, still no extra shuffle).

An unpartitioned projection is a single global fold — inherently
sequential, exactly as in the reference; it is executed as one group.
"""

from __future__ import annotations

import json
from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eventstorm_spark.projections.dsl import ProjEvent, Projection

# Envelope columns the fold consumes — pruned before the shuffle.
# `revision` rides along so handlers see event.sequenceNumber (linkTo needs
# it); it is one long per row on top of an envelope that already carries
# the payload, so the shuffle-width cost is negligible.
_FOLD_COLUMNS = ["stream", "event_type", "data", "metadata", "content_type",
                 "position", "revision"]

FINAL_SCHEMA = "partition string, state string"
EMIT_SCHEMA = "partition string, position long, state string"
# Events produced by emit()/linkTo() during replay, tagged with the
# position of the input event that produced them plus the ordinal
# WITHIN that event's emissions — (source_position, emit_seq) is a
# total order, so two emits from one input event sort (and mint uuids)
# identically on every run; source_position alone ties and Spark's
# sort is not stable on ties.
EMITTED_SCHEMA = ("stream string, event_type string, data string, "
                  "metadata map<string,string>, content_type string, "
                  "source_position long, emit_seq long")


def _event_from_row(row: Any) -> ProjEvent:
    meta = row.metadata if isinstance(row.metadata, dict) else {}
    return ProjEvent.from_envelope(
        stream=row.stream,
        event_type=row.event_type,
        data=row.data,
        metadata=meta,
        content_type=row.content_type,
        revision=row.revision,
    )


def _dump_state(state: Any) -> str:
    return json.dumps(state, sort_keys=True, default=str)


def _keyed(spec: Projection, df: DataFrame) -> DataFrame:
    """Attach the partition key column ``__key``."""
    pruned = df.select(*_FOLD_COLUMNS)
    if not spec.is_partitioned:
        return pruned.withColumn("__key", F.lit(""))
    if spec.partition_column:
        return pruned.withColumn("__key", F.expr(spec.partition_column).cast("string"))

    fn = spec.partition_fn
    out_schema = ", ".join(
        [
            "stream string", "event_type string", "data string",
            "metadata map<string,string>", "content_type string",
            "position long", "revision long", "__key string",
        ]
    )

    def add_key(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys = [
                fn(_event_from_row(r)) or ""
                for r in pdf.itertuples(index=False)
            ]
            yield pdf.assign(__key=keys)

    return pruned.mapInPandas(add_key, schema=out_schema)


# Marker event type for incremental-replay state seed rows; never a real
# event type (real positions are >= 0, seeds use -1).
_STATE_SEED = "$state-seed"


def _make_fold(spec: Projection, emit_all: bool):
    """Build the per-group fold closure (cloudpickle ships it whole)."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("position", kind="mergesort")
        key = pdf["__key"].iloc[0] if len(pdf) else ""
        state: Any = None
        out_pos: list[int] = []
        out_state: list[str] = []
        for row in pdf.itertuples(index=False):
            if row.position < 0 and row.event_type == _STATE_SEED:
                # incremental replay: seed row carries the prior state
                # (sorts first — real positions are non-negative)
                state = json.loads(row.data) if row.data is not None else None
                continue
            e = _event_from_row(row)
            e.partition = key if spec.is_partitioned else ""
            # run_chain_collect so emit()/linkTo() stay legal in state-only
            # replays (their output is materialized by run_batch_emitted)
            state, forward, _ = spec.run_chain_collect(state, e)
            if emit_all and forward:
                out_pos.append(int(row.position))
                out_state.append(_dump_state(state))
        if emit_all:
            return pd.DataFrame({"partition": key, "position": out_pos, "state": out_state})
        return pd.DataFrame({"partition": [key], "state": [_dump_state(state)]})

    return fold


def _select(spec: Projection, events: DataFrame) -> DataFrame:
    sel = spec.selector
    if sel.streams is not None:
        return events.where(F.col("stream").isin(list(sel.streams)))
    if sel.category is not None:
        # startswith pushes down to the parquet scan, unlike rlike
        return events.where(F.col("stream").startswith(sel.category + "-"))
    if sel.pattern is not None:
        return events.where(F.col("stream").rlike(sel.pattern))
    return events


def _lower_native(spec: Projection, keyed: DataFrame):
    """Compile a pure ``when_agg`` fold to a native groupBy().agg().

    Valid only when the declarative step is the whole chain (no
    transform_by/filter_by after it). The win at scale: partial
    aggregation map-side means the shuffle carries one pre-combined row
    per (task, key) instead of every event, and no row ever enters
    Python. Field semantics must agree exactly with ``AggSpec.update``:
    sum/count start at 0 (coalesce), min/max of nothing is null, null
    JSON fields are skipped, numeric strings coerce via double.
    """
    if spec.lowered_aggs is None or len(spec.chain) != 1:
        return None
    cols = []
    for k in sorted(spec.lowered_aggs):
        a = spec.lowered_aggs[k]
        if a.kind == "count":
            base = (F.lit(1) if a.where_type is None
                    else F.when(F.col("event_type") == a.where_type, 1))
            cols.append(F.count(base).alias(k))
            continue
        v = (F.get_json_object(F.col("data"), f"$.{a.field}")
             .cast("double").cast(a.cast))
        if a.where_type is not None:
            v = F.when(F.col("event_type") == a.where_type, v)
        if a.kind in ("first", "last"):
            # null ordering key excludes rows whose value is null, so
            # first/last mean "first/last event CARRYING the field" —
            # matching AggSpec.update, which skips absent fields
            order = F.when(v.isNotNull(), F.col("position"))
            fn = F.min_by if a.kind == "first" else F.max_by
            cols.append(fn(v, order).alias(k))
            continue
        fn = {"sum": F.sum, "min": F.min, "max": F.max}[a.kind]
        agg = fn(v)
        if a.kind == "sum":
            agg = F.coalesce(agg, F.lit(0).cast(a.cast))
        cols.append(agg.alias(k))
    agged = keyed.groupBy("__key").agg(*cols)
    state = F.to_json(
        F.struct(*[F.col(k) for k in sorted(spec.lowered_aggs)]),
        {"ignoreNullFields": "false"},
    )
    return agged.select(F.col("__key").alias("partition"), state.alias("state"))


def run_batch(spec: Projection, events: DataFrame) -> DataFrame:
    """Replay all events; return one row per partition with the FINAL
    state (columns: partition string, state string-JSON)."""
    keyed = _keyed(spec, _select(spec, events))
    lowered = _lower_native(spec, keyed)
    if lowered is not None:
        return lowered
    return keyed.groupBy("__key").applyInPandas(_make_fold(spec, emit_all=False), FINAL_SCHEMA)


def partition_states(states: DataFrame, partitions: list) -> DataFrame:
    """Partition-keyed slice of a (partition, state) table — the
    relational half of the ``State(name, partition)`` RPC the reference
    declares but never serves (``projections.proto:115-126``; the
    Projections service is absent from ``cmd/main.go:31-34``). A plain
    pushed equality/IN filter: against a parquet-materialized state
    table the predicate reaches the scan (PushedFilters), so a point
    lookup reads only the matching row group(s) — no full-state scan,
    which is what makes the RPC shape serviceable when the state table
    itself is large (one row per stream at 100 TB)."""
    return states.where(F.col("partition").isin(list(partitions)))


def partition_state(states: DataFrame, partition: str):
    """Point form of :func:`partition_states`: the state JSON for ONE
    partition, or None when the projection holds no such partition —
    StateResp.state (``projections.proto:124-126``)."""
    rows = partition_states(states, [partition]).limit(1).collect()
    return rows[0]["state"] if rows else None


def run_batch_incremental(spec: Projection, events: DataFrame,
                          prev_state: DataFrame,
                          from_position: int) -> DataFrame:
    """Fold only events with ``position > from_position`` on top of the
    saved per-partition state — incremental materialization.

    ``prev_state`` is a prior ``run_batch`` result (partition, state)
    checkpointed at ``from_position``. The output is identical to a full
    ``run_batch`` over the whole log, but the cost is O(new events) +
    O(existing partitions): at 100 TB this is the difference between a
    daily full replay and folding one day's tail.

    Two paths, mirroring ``run_batch``:
    - declarative ``when_agg`` folds: the new tail is aggregated natively
      (map-side combined) and MERGED with the prior state column-wise —
      sum/count add, min/max take least/greatest. Nothing enters Python.
    - general folds: prior state rows are injected as seed pseudo-rows
      (position -1, sorts first) into each group, and the fold resumes
      from the decoded state. One shuffle, same as full replay, but only
      the tail crosses the wire.

    Partitions with no new events pass through unchanged; partitions
    first seen in the tail start from ``$init`` as usual.
    """
    new = events.where(F.col("position") > from_position)
    keyed = _keyed(spec, _select(spec, new))

    if spec.lowered_aggs is not None and len(spec.chain) == 1:
        tail = _lower_native(spec, keyed)  # (partition, state) of tail only
        aggs = spec.lowered_aggs
        fields = ", ".join(f"`{k}` {aggs[k].cast}" for k in sorted(aggs))
        p = F.from_json(prev_state["state"], fields).alias("p")
        t = F.from_json(tail["state"], fields).alias("t")
        joined = (prev_state.select(F.col("partition"), p)
                  .join(tail.select(F.col("partition"), t), "partition",
                        "full_outer"))
        merged = []
        for k in sorted(aggs):
            kind = aggs[k].kind
            a, b = F.col(f"p.{k}"), F.col(f"t.{k}")
            if kind in ("sum", "count"):
                zero = F.lit(0).cast(aggs[k].cast)
                m = F.coalesce(a, zero) + F.coalesce(b, zero)
            elif kind == "min":
                m = F.least(a, b)  # least/greatest skip nulls
            elif kind == "max":
                m = F.greatest(a, b)
            elif kind == "first":
                m = F.coalesce(a, b)  # prior value wins if it exists
            else:  # last
                m = F.coalesce(b, a)  # tail value wins if it exists
            merged.append(m.alias(k))
        state = F.to_json(F.struct(*merged), {"ignoreNullFields": "false"})
        return joined.select("partition", state.alias("state"))

    seeds = prev_state.select(
        F.lit(None).cast("string").alias("stream"),
        F.lit(_STATE_SEED).alias("event_type"),
        F.col("state").alias("data"),
        F.lit(None).cast("map<string,string>").alias("metadata"),
        F.lit("application/json").alias("content_type"),
        F.lit(-1).cast("long").alias("position"),
        F.lit(-1).cast("long").alias("revision"),
        F.col("partition").alias("__key"),
    )
    unioned = keyed.unionByName(seeds)
    return unioned.groupBy("__key").applyInPandas(
        _make_fold(spec, emit_all=False), FINAL_SCHEMA)


def run_batch_emissions(spec: Projection, events: DataFrame) -> DataFrame:
    """Replay all events; return every non-suppressed state snapshot —
    the batch-replay contents of the result stream
    (``$projections-{name}-result``, projection.go:136-141, S8).
    Columns: partition, position, state(JSON)."""
    keyed = _keyed(spec, _select(spec, events))
    return keyed.groupBy("__key").applyInPandas(_make_fold(spec, emit_all=True), EMIT_SCHEMA)


def run_batch_emitted(spec: Projection, events: DataFrame) -> DataFrame:
    """Replay all events and return every event the handlers produced via
    ``emit()`` / ``link_to()`` (EventStore's emit surface; absent from the
    reference whose goja VM binds neither, projection.go:435-450).

    Same single-shuffle plan as ``run_batch``: one groupBy on the
    partition key, fold inside applyInPandas in position order; each
    emitted event is tagged with the ``source_position`` of the input
    event that produced it, so output order is deterministic and
    replay-stable across any partitioning. Requires ``enable_emit()``.
    """
    if not spec.emit_enabled:
        raise RuntimeError(
            f"projection {spec.name!r} is not emit-enabled; call .enable_emit()")
    keyed = _keyed(spec, _select(spec, events))

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("position", kind="mergesort")
        key = pdf["__key"].iloc[0] if len(pdf) else ""
        state: Any = None
        out: dict[str, list] = {c: [] for c in
                                ("stream", "event_type", "data", "metadata",
                                 "content_type", "source_position",
                                 "emit_seq")}
        for row in pdf.itertuples(index=False):
            e = _event_from_row(row)
            e.partition = key if spec.is_partitioned else ""
            state, _forward, emitted = spec.run_chain_collect(state, e)
            for j, em in enumerate(emitted):
                out["stream"].append(em.stream)
                out["event_type"].append(em.event_type)
                out["data"].append(em.data)
                out["metadata"].append(em.metadata_dict())
                out["content_type"].append(em.content_type)
                out["source_position"].append(int(row.position))
                out["emit_seq"].append(j)
        return pd.DataFrame(out)

    return keyed.groupBy("__key").applyInPandas(fold, EMITTED_SCHEMA)


def write_emitted(spec: Projection, emitted: DataFrame, log) -> int:
    """Append ``run_batch_emitted`` output to the event log, per target
    stream in source-position order — the durable half of ``emit()``.
    Returns the number of events appended. Emitted volume is projection
    output (state-change scale, not corpus scale), so the driver collect
    here is the same single-writer commit bottleneck every append shares
    — at 100 TB you shard this by target stream across commits."""
    from eventstorm_spark.model import NewEvent

    rows = emitted.orderBy("source_position", "emit_seq").collect()
    by_stream: dict[str, list] = {}
    for r in rows:
        ev = NewEvent(
            # (source_position, emit_seq) is unique and replay-stable; a
            # collect-order ordinal would shift when ties sort
            # differently across runs, defeating uuid-based re-run
            # detection
            uuid=f"{spec.name}-emit-{r['source_position']}-{r['emit_seq']}",
            event_type=r["event_type"],
            data=r["data"],
            metadata=dict(r["metadata"] or {}),
            content_type=r["content_type"],
        )
        by_stream.setdefault(r["stream"], []).append(ev)
    for stream, evs in by_stream.items():
        log.append(stream, evs)
    return len(rows)


def write_result_stream(spec: Projection, emissions: DataFrame, log) -> None:
    """Append emissions to the event log under the projection's result
    stream (S8, projection.go:309-328). Emissions become events whose
    body is the state JSON."""
    from eventstorm_spark.model import NewEvent

    rows = emissions.orderBy("position").collect()
    events = [
        NewEvent(
            uuid=f"{spec.name}-{r['partition']}-{r['position']}",
            event_type="$projection-state",
            data=r["state"],
            metadata={"partition": r["partition"] or ""},
        )
        for r in rows
    ]
    if events:
        log.append(spec.result_stream(), events)
