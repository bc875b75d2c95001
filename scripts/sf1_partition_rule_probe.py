"""Round-18 probe: what the size-driven memoized-frame partition rule
picks at sf1 (10x bench scale), and whether the postings consumers stay
balanced at that width.

Reuses sf1_probe's synthetic sf1 documents table. Reports, for
``_doc_postings`` and ``_span_candidate_pairs``: the rule's chosen
n_parts, the realized per-partition row counts (max/median balance),
and warm consumer timings at sf0.1 vs sf1. The 128 MB size term
engages at 4*input_bytes > 128 MB, i.e. ~sf50 for this ~0.6 MB/sf0.1
table — at sf1 the cores/4 floor still governs BY DESIGN; the probe's
job is to show the rule's arithmetic and the balance, not to force the
term. Usage: python scripts/sf1_partition_rule_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from scripts.sf1_probe import SF1_DIR, generate_sf1  # noqa: E402


def main() -> None:
    generate_sf1()
    from eventstorm_spark import inventory
    from eventstorm_spark.session import get_spark

    spark = get_spark("eventstorm_sf1_rule_probe")
    par = spark.sparkContext.defaultParallelism
    out = {"defaultParallelism": par}
    for sf_dir, tag in ((SF01, "sf0.1"), (SF1_DIR, "sf1")):
        b = inventory._table_bytes(sf_dir, "documents")
        rule = max(1, par // 4, int(4 * b // (128 << 20)))
        p = inventory._doc_postings(spark, sf_dir)
        sizes = sorted(
            p.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect())
        pairs, _ = inventory._span_candidate_pairs(spark, sf_dir)
        psz = sorted(pairs.rdd.mapPartitions(
            lambda it: [sum(1 for _ in it)]).collect())
        qs = dict(inventory.queries())
        timings = {}
        for q in ("hashed_tfidf_knn", "tf_idf_top_terms",
                  "doc_unigram_logprob", "exact_substring_spans"):
            df = qs[q](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()  # warm
            t0 = time.perf_counter()
            qs[q](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            timings[q] = round(time.perf_counter() - t0, 3)
        out[tag] = {
            "documents_bytes": b,
            "rule_n_parts": rule,
            "postings_parts": len(sizes),
            "postings_rows_min_med_max": [
                sizes[0], sizes[len(sizes) // 2], sizes[-1]],
            "span_pairs_parts": len(psz),
            "span_pairs_rows_min_med_max": [
                psz[0], psz[len(psz) // 2], psz[-1]],
            "warm_consumer_sec": timings,
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
