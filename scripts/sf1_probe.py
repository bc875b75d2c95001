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


def generate_sf1_events(n_rows: int = 1_000_000, seed: int = 7) -> str:
    """10x the sf0.1 events table, same structure: 30 days, ~15k users
    (10x), 5 event types, value uniform [0, 100) — enough for the
    gapfill grid and the KMV daily rollup to scale realistically."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(SF1_DIR, "events.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(SF1_DIR, exist_ok=True)
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    span = np.timedelta64(30 * 24 * 3600 * 1_000_000, "us")
    ts = base + (rng.random(n_rows) * span.astype("int64")).astype(
        "timedelta64[us]")
    types = np.array(["click", "view", "purchase", "signup", "error"])
    tbl = pa.table({
        "event_id": pa.array(range(n_rows), pa.int64()),
        "ts": pa.array(np.sort(ts)),
        "user_id": pa.array(rng.integers(0, 15_000, n_rows), pa.int64()),
        "event_type": pa.array(types[rng.integers(0, 5, n_rows)]),
        "value": pa.array(rng.random(n_rows) * 100.0, pa.float64()),
        "props": pa.array(["{}"] * n_rows, pa.string()),
    })
    pq.write_table(tbl, out)
    return out


def generate_sf1_embeddings(n_vecs: int = 20_000, dim: int = 64,
                            n_labels: int = 10, seed: int = 11) -> str:
    """10x the sf0.1 embeddings table: label-clustered unit-ish vectors
    (cluster center + noise), so same-label neighbors are close and
    cross-label LSH collisions exist — the structure triplet mining
    needs."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(SF1_DIR, "embeddings.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(SF1_DIR, exist_ok=True)
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_labels, dim))
    labels = rng.integers(0, n_labels, n_vecs)
    vecs = centers[labels] + 0.35 * rng.normal(size=(n_vecs, dim))
    tbl = pa.table({
        "vec_id": pa.array(range(n_vecs), pa.int64()),
        # float32 + int32: the driver table's exact physical types
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([int(x) for x in labels], pa.int32()),
    })
    pq.write_table(tbl, out)
    return out


def generate_sf1_tpch(seed: int = 13) -> None:
    """10x the sf0.1 lineitem/orders pair — only the columns the
    probed queries touch (dq_gate: l_orderkey/l_quantity referential +
    bound checks; column pruning means the missing columns never
    matter): 6M lineitem rows over 1.5M order keys."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    li_out = os.path.join(SF1_DIR, "lineitem.parquet")
    ord_out = os.path.join(SF1_DIR, "orders.parquet")
    if os.path.exists(li_out) and os.path.exists(ord_out):
        return
    os.makedirs(SF1_DIR, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_orders, n_li = 1_500_000, 6_000_000
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(n_orders), pa.int64()),
    }), ord_out)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_orders, n_li), pa.int64()),
        "l_quantity": pa.array(rng.integers(1, 51, n_li).astype("float64")),
    }), li_out)


ZIPF_V = 10_000  # vocabulary size for the realistic-vocabulary fixture
ZIPF_S = 1.1     # Zipf exponent (natural-language-like head/tail)
BOILER = " ".join(f"b{i}" for i in range(12))  # 12-token boilerplate run


def generate_zipf(out_dir: str, n_docs: int, *, boiler_frac: float = 0.0,
                  dup_frac: float = 0.05, seed: int = 42) -> str:
    """Realistic-vocabulary fixture (r8 verdict task 2): the uniform
    31-word vocabulary of :func:`generate_sf1` makes every doc pair
    share 6-token runs — the worst case for the ``min_shared=1``
    candidate stage and unrepresentative of web text. This one draws
    from a ``ZIPF_V``-word Zipf(``ZIPF_S``) vocabulary (head words
    common, long tail), keeps the ~5% near-dup copies (the genuine
    positive class), and optionally plants a fixed 12-token boilerplate
    run in ``boiler_frac`` of docs — the license-header adversary the
    ``scale=True`` fingerprint cap exists for. Same schema as the
    driver documents table."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, ZIPF_V + 1, dtype=np.float64)
    p = ranks ** -ZIPF_S
    p /= p.sum()
    lens = rng.integers(10, 101, size=n_docs)
    draws = rng.choice(ZIPF_V, size=int(lens.sum()), p=p)
    words = np.array([f"w{i}" for i in range(ZIPF_V)])
    texts: list[str] = []
    off = 0
    for L in lens:
        texts.append(" ".join(words[draws[off:off + L]]))
        off += L
    n_dup = int(n_docs * dup_frac)
    for d in rng.choice(n_docs, size=n_dup, replace=False):
        src = int(rng.integers(0, n_docs))
        if src == d:
            continue
        w = texts[src].split(" ")
        w.insert(int(rng.integers(0, len(w) + 1)), "dup")
        texts[int(d)] = " ".join(w)
    if boiler_frac > 0:
        n_b = int(n_docs * boiler_frac)
        for d in rng.choice(n_docs, size=n_b, replace=False):
            w = texts[int(d)].split(" ")
            at = int(rng.integers(0, len(w) + 1))
            texts[int(d)] = " ".join(w[:at] + BOILER.split(" ") + w[at:])
    langs = rng.choice(LANGS, size=n_docs, p=LANG_P)
    tbl = pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array([str(x) for x in langs], pa.string()),
        "source": pa.array([f"src{int(s)}" for s in
                            rng.integers(0, 20, size=n_docs)], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, out)
    return out


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def zipf_probe() -> None:
    """Re-table exact_substring_spans / scrubbed_corpus on the
    realistic-vocabulary corpus at two scales (5k vs 50k docs = the
    same 10x step as sf0.1 -> sf1).

    What round 9 actually measured (SCALE.md section 10): the r8 claim
    "candidates collapse on a realistic vocabulary" is FALSE — a Zipf
    head makes frequent trigrams winnow-selected in thousands of docs
    (measured fingerprint-pair mass: 278k at 5k docs -> 28.75M at 50k,
    103x at 10x data), and the raw shingle-value join blows up the
    same way (the first uncapped 50k run OOM'd the executor heap
    under value-first matching). So the UNCAPPED configurations run at
    the small scale only (documenting the quadratic class), and the
    scale=True cap rows carry the 10x comparison — the configuration
    a 100 TB caller actually runs.
    """
    base = os.path.join(ROOT, ".scale_probe")
    dirs = {}
    for tag, n, bf in (("zipf_small", 5_000, 0.0), ("zipf_big", 50_000, 0.0),
                       ("zipfb_small", 5_000, 0.02), ("zipfb_big", 50_000, 0.02)):
        d = os.path.join(base, tag)
        generate_zipf(d, n, boiler_frac=bf)
        dirs[tag] = d

    from eventstorm_spark import inventory
    from eventstorm_spark.extensions.text import (exact_substring_spans,
                                                  exact_substring_scrub_text)
    from eventstorm_spark.session import get_spark

    spark = get_spark("zipf_probe")
    qs = inventory.queries()

    def timed(fn):
        materialize(fn())  # warm
        t0 = time.perf_counter()
        materialize(fn())
        return round(time.perf_counter() - t0, 2)

    # all runs call the OPERATOR directly (not the session-memoized
    # query form) so every configuration prices the full pipeline
    # including the winnow candidate stage — comparable across rows.
    # big=None: uncapped at 50k docs is the measured quadratic blowup
    # (value-first OOM'd; pair-first is a 1.5B-row intermediate), so
    # only the small scale is timed for those rows.
    runs = [
        ("spans_zipf_uncapped", "zipf_small", None,
         lambda d: exact_substring_spans(
             inventory.load(spark, d, "documents"), portable=True)),
        ("spans_boiler_uncapped", "zipfb_small", None,
         lambda d: exact_substring_spans(
             inventory.load(spark, d, "documents"), portable=True)),
        ("spans_zipf_scale", "zipf_small", "zipf_big",
         lambda d: exact_substring_spans(
             inventory.load(spark, d, "documents"),
             portable=True, scale=True)),
        ("scrub_zipf_scale", "zipf_small", "zipf_big",
         lambda d: exact_substring_scrub_text(
             inventory.load(spark, d, "documents"),
             portable=True, scale=True)),
        ("spans_boiler_scale", "zipfb_small", "zipfb_big",
         lambda d: exact_substring_spans(
             inventory.load(spark, d, "documents"),
             portable=True, scale=True)),
    ]
    for name, small, big, f in runs:
        row = {"query": name}
        row["small_sec"] = timed(lambda: f(dirs[small]))
        row["rows_small"] = f(dirs[small]).count()
        if big is not None:
            row["big_sec"] = timed(lambda: f(dirs[big]))
            row["ratio"] = round(row["big_sec"] / max(row["small_sec"], 1e-9), 1)
            row["rows_big"] = f(dirs[big]).count()
        print(json.dumps(row), flush=True)


def main() -> None:
    if "--zipf" in sys.argv:
        zipf_probe()
        return
    names = TARGETS
    for arg in sys.argv[1:]:
        if arg.startswith("--queries"):
            names = arg.split("=", 1)[1].split(",")
    if "--skip-gen" not in sys.argv:
        generate_sf1()
        generate_sf1_events()
        generate_sf1_embeddings()
        generate_sf1_tpch()

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
