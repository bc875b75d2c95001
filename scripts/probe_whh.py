"""Phase probe for the streaming replay harnesses (round 18): split
feed-write / stream-execution wall time and count micro-batches and
state partitions, at the session's $SPARK_GRAFT_CPUS width.

Usage: python scripts/probe_whh.py [state_partitions]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from eventstorm_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("eventstorm_probe_whh")
    from eventstorm_spark.extensions.sketches import streaming_heavy_hitters
    from eventstorm_spark.inventory import load

    override = sys.argv[1] if len(sys.argv) > 1 else None

    ev = load(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"), "event_type")
    for rep in range(3):
        tmp = tempfile.mkdtemp(prefix="eshh_probe_")
        try:
            src = os.path.join(tmp, "src")
            t0 = time.perf_counter()
            ev.repartition(
                max(1, spark.sparkContext.defaultParallelism // 4)
            ).write.parquet(src)
            t1 = time.perf_counter()
            latest: dict = {}
            n_batches = [0]

            def on_batch(bdf, _e):
                n_batches[0] += 1
                rows = (bdf.select(
                    F.date_format("window_start", "yyyy-MM-dd").alias("day"),
                    "value", "mg_count", "n_window").collect())
                for r in rows:
                    latest[(r.day, r.value)] = (int(r.mg_count),
                                                int(r.n_window))

            old_sp = spark.conf.get("spark.sql.shuffle.partitions")
            if override:
                spark.conf.set("spark.sql.shuffle.partitions", override)
            try:
                q = (streaming_heavy_hitters(
                        spark.readStream.schema(
                            spark.read.parquet(src).schema).parquet(src),
                        "event_type", threshold=0.01, window="1 day",
                        ts_col="ts", watermark_delay="40 days")
                     .writeStream.outputMode("update")
                     .foreachBatch(on_batch).start())
                t2 = time.perf_counter()
                try:
                    q.processAllAvailable()
                finally:
                    t3 = time.perf_counter()
                    q.stop()
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", old_sp)
            t4 = time.perf_counter()
            print(f"rep{rep}: feed_write={t1-t0:.3f}s plan+start={t2-t1:.3f}s "
                  f"stream_run={t3-t2:.3f}s stop={t4-t3:.3f}s "
                  f"batches={n_batches[0]} rows={len(latest)} "
                  f"state_parts={override or old_sp}")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
