"""sf1 scale probe: run the most expensive headline queries at 10x the
bench scale and table wall-time vs sf0.1 (SCALE.md section 10).

The driver ships sf0.001/0.01/0.1 only, so this generates a synthetic
sf1 ``documents`` table (the only input the probed queries read) with
the SAME structure as the driver's generator, learned from sf0.1:

- 31-word vocabulary (uniform draw; the rare ``dup`` marker excluded
  from the base draw), word counts uniform in [10, 100];
- lang multinomial (en ~41%, zh/es/fr/de ~15% each), source uniform
  over src0..src19, ``n_chars = len(text)``;
- ~5% near-duplicate docs: copy an earlier doc's text and insert one
  ``dup`` token at a random position (matches the 250/5000 docs
  containing ``dup`` at sf0.1 — this is what gives the dedup queries a
  realistic positive class).

Output parquet lands under ``.scale_probe/sf1/`` (gitignored).
Timing: one untimed warm run then a single timed run per (query, sf) —
the probe hunts order-of-magnitude super-linear blowups, not
sub-second JIT noise.

Usage: python scripts/sf1_probe.py [--queries q1,q2] [--skip-gen]
Prints one JSON line per query:
  {"query": ..., "sf01_sec": ..., "sf1_sec": ..., "ratio": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF01 = "/root/testdata/sf0.1"
SF1_DIR = os.path.join(ROOT, ".scale_probe", "sf1")

TARGETS = [
    "dedup_clusters",
    "winnow_matches",
    "exact_substring_spans",
    "training_mix_pipeline",
    "bm25_top_docs",
    "multimodal_png_decode",
]

VOCAB = ["spark", "window", "merge", "table", "column", "vector",
         "stream", "value", "data", "small", "join", "filter", "big",
         "group", "hash", "customer", "sort", "order", "slow", "line",
         "part", "fast", "the", "row", "agg", "key", "query", "a",
         "scan", "batch"]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]


def generate_sf1(n_docs: int = 50_000, dup_frac: float = 0.05,
                 seed: int = 42) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(SF1_DIR, "documents.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(SF1_DIR, exist_ok=True)
    rng = np.random.default_rng(seed)
    lens = rng.integers(10, 101, size=n_docs)
    texts: list[str] = []
    for i in range(n_docs):
        words = rng.choice(VOCAB, size=lens[i])
        texts.append(" ".join(words))
    # near-dup injection: later docs copy an earlier doc + one 'dup'
    n_dup = int(n_docs * dup_frac)
    dup_ids = rng.choice(n_docs, size=n_dup, replace=False)
    for d in dup_ids:
        src = int(rng.integers(0, n_docs))
        if src == d:
            continue
        w = texts[src].split(" ")
        w.insert(int(rng.integers(0, len(w) + 1)), "dup")
        texts[int(d)] = " ".join(w)
    langs = rng.choice(LANGS, size=n_docs, p=LANG_P)
    sources = [f"src{int(s)}" for s in rng.integers(0, 20, size=n_docs)]
    tbl = pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array([str(x) for x in langs], pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, out)
    return out


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    names = TARGETS
    for arg in sys.argv[1:]:
        if arg.startswith("--queries"):
            names = arg.split("=", 1)[1].split(",")
    if "--skip-gen" not in sys.argv:
        generate_sf1()

    from eventstorm_spark import inventory
    from eventstorm_spark.session import get_spark

    spark = get_spark("sf1_probe")
    qs = inventory.queries()

    for name in names:
        row = {"query": name}
        for label, sf_dir in (("sf01_sec", SF01), ("sf1_sec", SF1_DIR)):
            materialize(qs[name](spark, sf_dir))  # warm
            t0 = time.perf_counter()
            materialize(qs[name](spark, sf_dir))
            row[label] = round(time.perf_counter() - t0, 3)
        row["ratio"] = round(row["sf1_sec"] / max(row["sf01_sec"], 1e-9), 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
