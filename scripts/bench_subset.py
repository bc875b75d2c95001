"""Bench a subset of headline queries with bench.py's exact methodology
(1 untimed warm run, then median of 3 timed noop-sink runs).

Usage: python scripts/bench_subset.py <query> [query ...]
Honors $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventstorm_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("eventstorm_bench_subset")

    import bench
    from eventstorm_spark import inventory

    qs = dict(inventory.queries())
    for n, kw in bench.SCALE_FORMS.items():
        fn = qs[n]
        qs[n] = (lambda f, k: lambda spark, d: f(spark, d, **k))(fn, kw)
    names = sys.argv[1:]

    bench.materialize(qs["head_revisions"](spark, sf_dir))  # JVM warm
    if any(n in ("phrase_search", "proximity_search", "hashed_tfidf_knn",
                 "kmv_distinct_tokens", "heavy_hitter_tokens",
                 "token_pmi_pairs") for n in names):
        inventory._doc_postings(spark, sf_dir)

    timings = {}
    for name in names:
        bench.materialize(qs[name](spark, sf_dir))  # warm
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            bench.materialize(qs[name](spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        timings[name] = round(sorted(samples)[1], 3)
    print(json.dumps({"queries": timings,
                      "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
