from eventstorm_spark.projections.dsl import Projection, ProjEvent, ProjectionOptions, projection
from eventstorm_spark.projections.batch import run_batch, run_batch_emissions
from eventstorm_spark.projections.registry import ProjectionRegistry

__all__ = [
    "Projection",
    "ProjEvent",
    "ProjectionOptions",
    "projection",
    "run_batch",
    "run_batch_emissions",
    "ProjectionRegistry",
]
