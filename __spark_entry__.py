"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (SURVEY §7.2): normalize the
raw event feed into the event-log envelope, run a filtered ``$all`` read,
and fold per-stream projection state — exercising ingest-shape, filters,
order/limit and the projection engine in one plan. ``queries()`` /
``oracle_sql()`` expose the full operator inventory (SURVEY §2) with
DuckDB twins; see ``eventstorm_spark/inventory.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from eventstorm_spark import inventory

    sf_dir = "/root/testdata/sf0.001"
    counts = inventory.q_proj_count_by_stream(spark, sf_dir)
    heads = inventory.q_head_revisions(spark, sf_dir)
    return (
        counts.join(heads, counts.partition == heads.stream)
        .select(
            F.col("stream"),
            F.col("count").alias("n_events"),
            F.col("head_revision"),
            F.col("head_position"),
        )
        .orderBy("stream")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from eventstorm_spark import inventory

    return inventory.queries()


def oracle_sql() -> dict[str, str]:
    from eventstorm_spark import inventory

    return inventory.oracle_sql()
