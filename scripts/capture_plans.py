"""Capture .explain('formatted') for headline queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> [query ...]
Writes plans/<tag>/<query>.txt for each named query (default: the full
bench HEADLINE list). Plans are captured on the same session config the
bench uses (get_spark), at $SPARK_GRAFT_SF_DIR (default sf0.1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventstorm_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "plans"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("eventstorm_plan_capture")

    import bench
    from eventstorm_spark import inventory

    qs = dict(inventory.queries())
    for n, kw in bench.SCALE_FORMS.items():
        fn = qs[n]
        qs[n] = (lambda f, k: lambda spark, d: f(spark, d, **k))(fn, kw)
    names = sys.argv[2:] or [n for n in bench.HEADLINE if n in qs]

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
        except Exception as e:  # capture the failure, keep going
            plan = f"PLAN CAPTURE FAILED: {type(e).__name__}: {e}"
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        print(f"captured {name} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
