"""Distributed sketches built as plain aggregations.

Beyond the built-ins (HLL++ `approx_count_distinct`, KLL-ish
`percentile_approx`), this module hand-builds a Count-Min Sketch as an
ordinary groupBy — demonstrating the pattern for ANY mergeable sketch on
Spark: express the sketch cells as (row, bucket) keys and the update as
a map-side-combinable aggregate. The "sketch" that reaches the driver is
width x depth counters, independent of stream size.

CMS guarantees: estimate >= true count, and with width w, depth d,
estimate <= true + (e/w) * N with probability 1 - e^-d.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_build(df: DataFrame, col: str, *, width: int = 1024,
              depth: int = 5) -> DataFrame:
    """Build a Count-Min Sketch over ``col``: one row per non-empty
    (row, bucket) cell. Construction is a single groupBy over d
    replicated hashes — partial aggregation combines cells map-side, so
    the shuffle carries at most width*depth rows per task regardless of
    input size. Sketches of different inputs union+sum to merge."""
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row")
    cells = df.select(F.col(col).cast("string").alias("__v"), rows)
    bucket = F.pmod(F.xxhash64("__v", F.col("row")), F.lit(width))
    return (cells.select("row", bucket.alias("bucket"))
            .groupBy("row", "bucket")
            .agg(F.count(F.lit(1)).alias("count")))


def cms_estimate(sketch: DataFrame, values: list, *, width: int = 1024,
                 depth: int = 5) -> DataFrame:
    """Point-query the sketch for ``values``: min over the d cells each
    value hashes to. The probe set is tiny — broadcast it against the
    (already tiny) sketch."""
    spark = sketch.sparkSession
    probes = spark.createDataFrame([(str(v),) for v in values], ["value"])
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row")
    keyed = probes.select("value", rows).withColumn(
        "bucket", F.pmod(F.xxhash64("value", F.col("row")), F.lit(width)))
    joined = keyed.join(sketch, ["row", "bucket"], "left_outer")
    return (joined.groupBy("value")
            .agg(F.min(F.coalesce(F.col("count"), F.lit(0)))
                 .alias("estimate")))
