from eventstorm_spark.projections.dsl import (
    EmittedEvent,
    Projection,
    ProjEvent,
    ProjectionOptions,
    emit,
    link_to,
    projection,
)
from eventstorm_spark.projections.materialize import Materializer
from eventstorm_spark.projections.batch import (
    run_batch,
    run_batch_emissions,
    run_batch_incremental,
    run_batch_emitted,
    write_emitted,
)
from eventstorm_spark.projections.registry import ProjectionRegistry

__all__ = [
    "EmittedEvent",
    "Projection",
    "ProjEvent",
    "ProjectionOptions",
    "emit",
    "link_to",
    "projection",
    "Materializer",
    "run_batch",
    "run_batch_emissions",
    "run_batch_incremental",
    "run_batch_emitted",
    "write_emitted",
    "ProjectionRegistry",
]
