"""Continuous projections — the fold as a stateful streaming query.

The reference's intended-but-unwired live path (subscription ->
``Projection.Update`` per event -> result-stream emission,
``internal/projections/projection.go:399-414`` + SURVEY §3.3) maps to
``applyInPandasWithState``: the projection state lives in Spark's state
store per partition key, each micro-batch folds its events in position
order, and the updated state is emitted downstream (to a memory sink or
``foreachBatch`` appending to the result stream — S8).

Note on ``reorderEvents``/``processingLag`` (T7): the reference parses
these options but never enforces them (projection.go:48-53 has no
consumer). We guarantee intra-batch position order by sorting inside the
fold; cross-batch order follows commit order of the single-writer log,
so fold ≡ sequential replay without extra buffering.
"""

from __future__ import annotations

import json
from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from eventstorm_spark.projections.batch import _event_from_row, _keyed, _select
from eventstorm_spark.projections.dsl import Projection

STREAM_OUT_SCHEMA = "partition string, state string"
STREAM_STATE_SCHEMA = "state string"


def run_streaming(spec: Projection, events_stream: DataFrame) -> DataFrame:
    """Continuous fold over a streaming envelope DataFrame.

    Returns a streaming DataFrame of (partition, state) updates — one row
    per key per micro-batch that touched the key (output mode `update`).
    Start it with ``.writeStream`` (memory sink for tests, foreachBatch →
    ``EventLog.append`` for result-stream parity).
    """
    keyed = _keyed(spec, _select(spec, events_stream))

    def fold(key: Tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            st: Any = json.loads(state.get[0])
        else:
            st = None
        touched = False
        for pdf in pdf_iter:
            pdf = pdf.sort_values("position", kind="mergesort")
            for row in pdf.itertuples(index=False):
                e = _event_from_row(row)
                e.partition = key[0] if spec.is_partitioned else ""
                # emit()/linkTo() output is not delivered live: continuous
                # mode folds state only; emitted events come from a
                # run_batch_emitted replay (idempotent via source_position)
                st, _forward, _emitted = spec.run_chain_collect(st, e)
                touched = True
        if touched:
            state.update((json.dumps(st, sort_keys=True, default=str),))
            yield pd.DataFrame({"partition": [key[0]], "state": [json.dumps(st, sort_keys=True, default=str)]})

    return keyed.groupBy("__key").applyInPandasWithState(
        fold,
        STREAM_OUT_SCHEMA,
        STREAM_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def start_continuous(spec: Projection, log, *, checkpoint_dir: str | None = None,
                     trigger_ms: int = 200):
    """Run a projection continuously against an EventLog, emitting every
    state update into its result stream (S8 live — the wiring the
    reference holds but never connects, SURVEY §3.3).

    Each state change becomes a ``$projection-state`` event appended to
    ``$projections-{name}-result`` through the ordinary single-writer
    append path, so result streams are themselves subscribable and
    CAS-protected like any other stream. Returns the StreamingQuery;
    call ``processAllAvailable()`` for deterministic replay in tests.
    """
    from pyspark.sql import functions as F

    from eventstorm_spark.model import EVENT_SCHEMA, NewEvent

    src = log.spark.readStream.schema(EVENT_SCHEMA).parquet(log.path)
    # result-stream events must not feed back into the fold
    src = src.where(F.col("stream") != spec.result_stream())
    updates = run_streaming(spec, src)

    def emit(batch_df: DataFrame, epoch_id: int) -> None:
        rows = batch_df.collect()
        events = [
            NewEvent(
                uuid=f"{spec.name}-{r['partition']}-{epoch_id}-{i}",
                event_type="$projection-state",
                data=r["state"],
                metadata={"partition": r["partition"] or ""},
            )
            for i, r in enumerate(rows)
        ]
        if events:
            log.append(spec.result_stream(), events)

    writer = (
        updates.writeStream.outputMode("update")
        .foreachBatch(emit)
        .trigger(processingTime=f"{trigger_ms} milliseconds")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
