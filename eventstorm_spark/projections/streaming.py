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
                st, _forward = spec.run_chain(st, e)
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
