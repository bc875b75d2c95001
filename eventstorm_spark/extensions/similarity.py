"""Similarity search over the ``embeddings`` table (array<float> column).

Two tiers:
- brute-force cosine top-k — exact baseline; dot product and norms as
  one JVM expression chain (zip_with + aggregate), TakeOrderedAndProject
  for the top-k. At 100 TB this is the per-partition scan you fall back
  to inside each IVF/LSH cell.
- random-hyperplane LSH — signature = sign-bit string of dot products
  with H fixed pseudo-random hyperplanes; candidate set = same-bucket
  rows, searched exactly. Hyperplanes are generated deterministically
  (seeded) and shipped as literals, so there is no fit step and no
  driver-side state; bucket join replaces the all-pairs scan.
"""

from __future__ import annotations

import math
import random
from typing import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from eventstorm_spark.localframe import local_frame


def _as_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _lit_vec(vec: Sequence[float]) -> Column:
    return F.array([F.lit(float(x)) for x in vec])


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_scores(embeddings: DataFrame, query_vec: Sequence[float],
                  *, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Cosine similarity of every row against the query vector — a single
    projection over the scan, no shuffle, no limit.

    The kernel is an Arrow-batched numpy matvec (one GEMV per batch):
    per-row ``zip_with``/``aggregate`` expressions are higher-order
    functions that Spark interprets element-by-element, ~100x slower on
    wide vectors. The Column-expression form remains available as
    ``cosine()`` for composition inside JVM-only plans.
    """
    from pyspark.sql.functions import pandas_udf

    q = np.asarray(list(query_vec), dtype=np.float64)
    qn = np.linalg.norm(q)

    @pandas_udf("double")
    def score(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=float)
        m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        norms = np.linalg.norm(m, axis=1)
        denom = np.where(norms == 0, 1.0, norms * (qn if qn else 1.0))
        return pd.Series(np.round((m @ q) / denom, 6))

    return embeddings.select(F.col(id_col), score(F.col(vec_col)).alias("cosine_sim"))


def brute_force_topk(embeddings: DataFrame, query_vec: Sequence[float], k: int = 10,
                     *, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k. Ties broken by id for determinism; the
    physical plan is a single scan + TakeOrderedAndProject (no shuffle
    of the full table). ``k`` must be small (takeOrdered holds k rows
    per task in memory) — for unbounded scoring use ``cosine_scores``."""
    return (
        cosine_scores(embeddings, query_vec, vec_col=vec_col, id_col=id_col)
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, num_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)]


def _portable_planes(dim: int, num_planes: int) -> list[list[float]]:
    """Hyperplanes derivable in plain SQL: coordinate (p, d) is the
    60-bit md5 hash of ``"p:d"`` scaled to [-1, 1) —
    ``hash60("p:d") / 2^59 - 1.0``. Uniform rather than gaussian
    coordinates, which sign-LSH tolerates (only the direction
    distribution matters, and the bias is mild at dim >= 8); the payoff
    is that an external engine (the DuckDB oracle) can regenerate the
    identical planes and therefore the identical buckets. The division
    and subtraction are exact-input IEEE-double ops, so Python, the JVM
    and DuckDB all produce bit-identical coordinates."""
    import hashlib

    return [
        [int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:15], 16) / 2.0 ** 59 - 1.0
         for d in range(dim)]
        for p in range(num_planes)
    ]


def lsh_signature(vec_col: Column, planes: list[list[float]]) -> Column:
    """Bit-packed sign signature: bit_i = (v . h_i) >= 0."""
    emb = _as_double_array(vec_col)
    bits = [
        F.when(dot(emb, _lit_vec(h)) >= 0,
               F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        for i, h in enumerate(planes)
    ]
    sig = bits[0]
    for b in bits[1:]:
        sig = sig.bitwiseOR(b)
    return sig


def lsh_topk(embeddings: DataFrame, query_vec: Sequence[float], k: int = 10,
             *, num_planes: int = 6, hamming: int = 2, seed: int = 42,
             planes: list[list[float]] | None = None,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: multiprobe LSH — scan only rows whose bucket is
    within ``hamming`` bit flips of the query's bucket, then exact cosine.

    ``num_planes`` trades prune ratio against recall and must grow with
    corpus size (2^planes buckets); the multiprobe set is
    sum(C(planes, i) for i <= hamming) buckets. This is the
    bucket-join scale path when the corpus is billions of vectors;
    for clustered corpora prefer ``ivf_topk``.
    """
    from itertools import combinations

    dim = len(query_vec)
    if planes is None:
        planes = _hyperplanes(dim, num_planes, seed)
    num_planes = len(planes)
    qsig = 0
    for i, h in enumerate(planes):
        if sum(q * x for q, x in zip(query_vec, h)) >= 0:
            qsig |= 1 << i
    near_buckets = set()
    for d in range(hamming + 1):
        for flips in combinations(range(num_planes), d):
            s = qsig
            for f in flips:
                s ^= 1 << f
            near_buckets.add(s)
    from pyspark.sql.functions import pandas_udf

    pm = np.asarray(planes, dtype=np.float64)
    weights = (1 << np.arange(num_planes)).astype(np.int64)

    @pandas_udf("long")
    def sig_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        return pd.Series(((m @ pm.T) >= 0) @ weights)

    pruned = (
        embeddings
        .withColumn("__sig", sig_udf(F.col(vec_col)))
        .where(F.col("__sig").isin(list(near_buckets)))
    )
    return (
        cosine_scores(pruned, query_vec, vec_col=vec_col, id_col=id_col)
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def kmeans_centroids(embeddings: DataFrame, *, k: int = 16, iters: int = 5,
                     metric: str = "cosine", vec_col: str = "embedding",
                     id_col: str = "vec_id") -> list[list[float]]:
    """Distributed k-means training — spherical (``metric="cosine"``,
    the IVF cell-routing default) or plain Euclidean (``metric="l2"``,
    what PQ codebooks need: centroids must preserve subvector
    magnitudes, so neither inputs nor centroids are normalized).

    Lloyd iterations expressed as DataFrame ops — nothing corpus-sized
    ever reaches the driver:

    - **E step** (assignment): one Arrow-batched GEMM per batch against
      the broadcast centroid matrix (argmax cosine — the same kernel
      ``ivf_topk`` routes with — or argmin L2 via the dot-product
      expansion ``argmax(x·c - |c|²/2)``);
    - **M step** (update): ``posexplode`` to (cell, dim, x) rows and a
      map-side-combinable avg — the ``embedding_centroids`` shape — then
      (cosine only) re-normalized driver-side (k x dim floats, the only
      collect).

    Init is deterministic: the k vectors with the smallest
    ``portable_hash60(id)`` — a seedless pseudo-random spread, so
    training is reproducible across runs and partitionings (up to
    floating-point summation order in the avg, which only matters for
    near-tied assignments). Empty cells keep their previous centroid.
    At 100 TB you train on a sampled slice (k-means needs only a
    representative sample) and route the full corpus with the result.
    """
    from eventstorm_spark.extensions.dedup import portable_hash60

    if metric not in ("cosine", "l2"):
        raise ValueError(f"unknown metric {metric!r}")
    spherical = metric == "cosine"
    seeds = (embeddings
             .select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"),
                     portable_hash60(F.col(id_col).cast("string")).alias("__h"))
             .orderBy("__h", "__id").limit(k).collect())
    cents = np.array([np.asarray(r["__v"], dtype=np.float64) for r in seeds])
    if spherical:
        norms = np.linalg.norm(cents, axis=1, keepdims=True)
        cents = cents / np.where(norms == 0, 1.0, norms)

    from pyspark.sql.functions import pandas_udf

    vecs = embeddings.select(F.col(id_col).alias("__id"),
                             _as_double_array(F.col(vec_col)).alias("__v"))
    vecs = vecs.localCheckpoint(eager=False)  # reused every iteration

    for _ in range(iters):
        cm = cents  # capture for the UDF closure

        @pandas_udf("int")
        def assign(vs: pd.Series) -> pd.Series:
            if len(vs) == 0:
                return pd.Series([], dtype="int32")
            m = np.array([np.asarray(v, dtype=np.float64) for v in vs])
            if spherical:
                n = np.linalg.norm(m, axis=1, keepdims=True)
                m = m / np.where(n == 0, 1.0, n)
                scores = m @ cm.T
            else:
                # argmin ||x-c||² == argmax (x·c - |c|²/2); x² is
                # row-constant and drops out
                scores = m @ cm.T - 0.5 * (cm * cm).sum(axis=1)[None, :]
            return pd.Series(np.argmax(scores, axis=1).astype("int32"))

        assigned = vecs.withColumn("__cell", assign(F.col("__v")))
        means = (assigned
                 .select("__cell", F.posexplode("__v").alias("__dim", "__x"))
                 .groupBy("__cell", "__dim").agg(F.avg("__x").alias("__m"))
                 .collect())
        new = cents.copy()
        per_cell: dict[int, dict[int, float]] = {}
        for r in means:
            per_cell.setdefault(r["__cell"], {})[r["__dim"]] = r["__m"]
        for c, dims in per_cell.items():
            v = np.array([dims[d] for d in sorted(dims)], dtype=np.float64)
            if spherical:
                n = np.linalg.norm(v)
                if n > 0:
                    new[c] = v / n
            else:
                new[c] = v
        cents = new
    return cents.tolist()


def ivf_topk(embeddings: DataFrame, query_vec: Sequence[float], k: int = 10,
             *, n_centroids: int = 16, n_probe: int = 4,
             centroids: list[list[float]] | None = None,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """IVF-style approximate top-k: partition the corpus by
    nearest-of-C sampled centroids, probe only the ``n_probe`` cells
    nearest the query, exact-search inside them.

    Default centroids are the C lowest-id vectors (deterministic, no
    training step — which keeps the driver query oracle-expressible);
    pass ``centroids=kmeans_centroids(...)`` for trained routing. Cell
    assignment is an Arrow-batched GEMM; at scale the assignment is
    precomputed once as a partition column, making the probe a
    partition-pruned scan.
    """
    if centroids is not None:
        cents = [[float(x) for x in c] for c in centroids]
    else:
        cent_rows = (embeddings.orderBy(id_col).limit(n_centroids)
                     .select(id_col, vec_col).collect())
        cents = [[float(x) for x in r[vec_col]] for r in cent_rows]

    def _cos_py(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na and nb else 0.0

    probe = sorted(range(len(cents)),
                   key=lambda i: (-_cos_py(query_vec, cents[i]), i))[:n_probe]

    from pyspark.sql.functions import pandas_udf

    cm = np.asarray(cents, dtype=np.float64)
    cm = cm / np.where(np.linalg.norm(cm, axis=1, keepdims=True) == 0, 1.0,
                       np.linalg.norm(cm, axis=1, keepdims=True))

    @pandas_udf("int")
    def cell_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        m = m / np.where(norms == 0, 1.0, norms)
        return pd.Series(np.argmax(m @ cm.T, axis=1).astype("int32"))

    pruned = (
        embeddings
        .withColumn("__cell", cell_udf(F.col(vec_col)))
        .where(F.col("__cell").isin(probe))
    )
    return (
        cosine_scores(pruned, query_vec, vec_col=vec_col, id_col=id_col)
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def pairwise_topk_per_label(embeddings: DataFrame, k: int = 3,
                            *, vec_col: str = "embedding", id_col: str = "vec_id",
                            label_col: str = "label") -> DataFrame:
    """Within-label exact nearest neighbor (blocking by label): the
    bounded all-pairs pattern — join key = label, window top-k per row."""
    from pyspark.sql import Window as W

    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(label_col).alias("lbl"),
                          F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(label_col).alias("lbl"),
                          F.col(vec_col).alias("vb"))
    pairs = (
        a.join(b, ["lbl"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("lbl", "id_a", "id_b",
                F.round(cosine(_as_double_array(F.col("va")),
                               _as_double_array(F.col("vb"))), 6).alias("cosine_sim"))
    )
    w = W.partitionBy("lbl").orderBy(F.col("cosine_sim").desc(), F.col("id_a"), F.col("id_b"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("lbl", "id_a", "id_b", "cosine_sim", "rank")
    )


def write_ivf_index(embeddings: DataFrame, path: str, *,
                    centroids: list[list[float]] | None = None,
                    n_centroids: int = 16, train_iters: int = 4,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> list[list[float]]:
    """Materialize the corpus as an IVF-partitioned parquet table:
    cell assignment (argmax cosine against the centroids) becomes a
    PARTITION COLUMN, so serving a query is a partition-pruned scan of
    the n_probe nearest cells — no per-row cell filter, the files for
    unprobed cells are never opened. This is the at-rest form of
    ``ivf_topk`` for 100 TB serving; returns the centroids used (store
    them with the index). Default centroids are TRAINED
    (:func:`kmeans_centroids`, ``train_iters`` Lloyd passes — r8
    verdict task 4: an at-rest index is built once and served forever,
    so the writer, unlike the oracle-replayable query paths, should
    not default to the poor lowest-id routing); pass explicit
    ``centroids`` to pin routing (e.g. to append-match an old index,
    or ``train_iters=0`` seeds for the untrained layout)."""
    if centroids is None:
        centroids = kmeans_centroids(embeddings, k=n_centroids,
                                     iters=train_iters, vec_col=vec_col,
                                     id_col=id_col)
    (embeddings.withColumn("cell", _ivf_cell_udf(centroids)(F.col(vec_col)))
     .write.partitionBy("cell").mode("overwrite").parquet(path))
    return [list(map(float, c)) for c in centroids]


def _ivf_cell_udf(centroids):
    """Arrow-batched cell router (argmax cosine against the normalized
    centroids, ties to the lowest cell) shared by the IVF index writer
    and its append path — one expression, so the two can never drift."""
    from pyspark.sql.functions import pandas_udf

    cm = np.asarray(centroids, dtype=np.float64)
    nn = np.linalg.norm(cm, axis=1, keepdims=True)
    cmn = cm / np.where(nn == 0, 1.0, nn)

    @pandas_udf("int")
    def cell_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        n = np.linalg.norm(m, axis=1, keepdims=True)
        m = m / np.where(n == 0, 1.0, n)
        return pd.Series(np.argmax(m @ cmn.T, axis=1).astype("int32"))

    return cell_udf


def append_ivf_index(embeddings: DataFrame, path: str,
                     centroids: list[list[float]], *,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id") -> None:
    """Append-only maintenance for :func:`write_ivf_index`: new vectors
    land in their cell partition directories — no read-modify-write,
    same recurring-ingest contract as ``curation.append_digest_index``
    and friends. Pass the SAME centroids the index was built with
    (routing with different ones silently sends rows to cells queries
    won't probe); ids must be new. The cell expression is shared with
    the writer, so build and append can never drift."""
    (embeddings.withColumn("cell", _ivf_cell_udf(centroids)(F.col(vec_col)))
     .write.partitionBy("cell").mode("append").parquet(path))


def ivf_index_topk(spark, path: str, centroids: list[list[float]],
                   query_vec: Sequence[float], k: int = 10, *,
                   n_probe: int = 4, vec_col: str = "embedding",
                   id_col: str = "vec_id") -> DataFrame:
    """Serve a top-k query from a :func:`write_ivf_index` table: route
    the query to its ``n_probe`` nearest cells driver-side (k x dim
    work), then exact-search ONLY those partitions — the ``cell IN
    (...)`` predicate is a partition filter, so unprobed cells cost
    zero I/O (plan-pinned by ``tests/test_plans.py``)."""

    def _cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na and nb else 0.0

    probe = sorted(range(len(centroids)),
                   key=lambda i: (-_cos(query_vec, centroids[i]), i))[:n_probe]
    pruned = spark.read.parquet(path).where(F.col("cell").isin(probe))
    return (cosine_scores(pruned, query_vec, vec_col=vec_col, id_col=id_col)
            .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
            .limit(k))


# ---------------------------------------------------------------------------
# product quantization (IVF-PQ's compression tier)
# ---------------------------------------------------------------------------


def _check_subspace_divisibility(dim: int, num_subspaces: int) -> None:
    """PQ slices assume ``dim == num_subspaces * (dim // num_subspaces)``;
    a non-divisible dim would silently DROP the trailing
    ``dim % num_subspaces`` dimensions from both encoding and ADC
    scoring — refuse instead of truncating."""
    if num_subspaces <= 0 or dim % num_subspaces != 0:
        raise ValueError(
            f"embedding dim {dim} is not divisible by num_subspaces "
            f"{num_subspaces}; the trailing {dim % num_subspaces} "
            "dimensions would be silently dropped from PQ encoding and "
            "ADC scoring — pick a divisor of the dimension (or pad the "
            "vectors)")


def pq_codebooks(embeddings: DataFrame, *, num_subspaces: int = 8,
                 num_codes: int = 16, vec_col: str = "embedding",
                 id_col: str = "vec_id") -> np.ndarray:
    """Deterministic PQ codebooks: the ``num_codes`` lowest-id vectors,
    L2-normalized and split into ``num_subspaces`` contiguous subvector
    groups — shape (M, K, dim/M). The same no-training-step determinism
    trick the IVF routing uses (so the SQL oracle can regenerate the
    codebooks exactly); at scale you'd train per-subspace k-means
    (``kmeans_centroids`` on subvector frames) on a sample instead."""
    rows = (embeddings.orderBy(id_col).limit(num_codes)
            .select(vec_col).collect())
    m = np.array([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    n = np.linalg.norm(m, axis=1, keepdims=True)
    m = m / np.where(n == 0, 1.0, n)
    dim = m.shape[1]
    _check_subspace_divisibility(dim, num_subspaces)
    sub = dim // num_subspaces
    return np.stack([m[:, s * sub:(s + 1) * sub]
                     for s in range(num_subspaces)])  # (M, K, sub)


def pq_codebooks_trained(embeddings: DataFrame, *, num_subspaces: int = 8,
                         num_codes: int = 16, iters: int = 4,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id") -> np.ndarray:
    """Trained PQ codebooks: per-subspace Euclidean k-means over the
    L2-normalized corpus's subvectors (the standard PQ fit — L2, not
    spherical, because codebook entries must preserve subvector
    magnitude for ADC dot products to approximate the full dot).
    Deterministic init (portable-hash spread), so training reproduces
    across runs; at 100 TB fit on a sample. Returns (M, K, dim/M)."""
    dim = len(embeddings.select(vec_col).first()[0])
    _check_subspace_divisibility(dim, num_subspaces)
    sub = dim // num_subspaces
    emb_n = normalize_embeddings(embeddings, vec_col=vec_col, out_col="__nv")
    emb_n = emb_n.localCheckpoint(eager=False)  # reused per subspace
    books = []
    for s in range(num_subspaces):
        frame = emb_n.select(
            F.col(id_col).alias("vec_id"),
            F.slice("__nv", s * sub + 1, sub).alias("embedding"))
        books.append(kmeans_centroids(frame, k=num_codes, iters=iters,
                                      metric="l2"))
    return np.asarray(books)


def pq_encode(embeddings: DataFrame, codebooks: np.ndarray, *,
              vec_col: str = "embedding",
              id_col: str = "vec_id") -> DataFrame:
    """Encode every vector as ``M`` one-byte codes (nearest codebook
    entry per subspace, L2 on the normalized vector, ties to the lowest
    code). This is the storage representation that makes billion-scale
    ANN memory-feasible: M bytes per vector instead of 4·dim — 32x
    smaller than float32 at (M=8, dim=64). One Arrow-batched numpy pass
    over the scan, no shuffle."""
    from pyspark.sql.functions import pandas_udf

    cb = np.asarray(codebooks, dtype=np.float64)  # (M, K, sub)
    n_sub, _, sub = cb.shape

    @pandas_udf("array<tinyint>")
    def encode(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        if m.shape[1] != n_sub * sub:
            raise ValueError(
                f"embedding dim {m.shape[1]} does not match codebook "
                f"shape {n_sub}x{sub}: {m.shape[1] - n_sub * sub} trailing "
                "dimensions would be silently dropped")
        nn = np.linalg.norm(m, axis=1, keepdims=True)
        m = m / np.where(nn == 0, 1.0, nn)
        codes = np.empty((len(m), n_sub), dtype=np.int8)
        for s in range(n_sub):
            seg = m[:, s * sub:(s + 1) * sub]          # (n, sub)
            d2 = (((seg[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2))
            codes[:, s] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    return embeddings.select(F.col(id_col),
                             encode(F.col(vec_col)).alias("pq_codes"))


def pq_adc_topk(codes: DataFrame, codebooks: np.ndarray,
                query_vec: Sequence[float], k: int = 10, *,
                id_col: str = "vec_id") -> DataFrame:
    """Asymmetric distance computation over PQ codes: the query builds
    one (M x K) lookup table of subspace dot products against the
    codebooks; each database vector's approximate cosine is then M
    table lookups summed — no raw vectors are touched, which is the
    whole point (the codes table is the only corpus-sized input, at M
    bytes per row). Top-k is TakeOrderedAndProject on the rounded
    score with id tie-breaks, same contract as the exact tiers."""
    from pyspark.sql.functions import pandas_udf

    cb = np.asarray(codebooks, dtype=np.float64)
    n_sub, _, sub = cb.shape
    q = np.asarray(list(query_vec), dtype=np.float64)
    qn = np.linalg.norm(q)
    q = q / (qn if qn else 1.0)
    lut = np.stack([cb[s] @ q[s * sub:(s + 1) * sub]
                    for s in range(n_sub)])  # (M, K)

    @pandas_udf("double")
    def adc(code_arrs: pd.Series) -> pd.Series:
        if len(code_arrs) == 0:
            return pd.Series([], dtype=float)
        c = np.array([np.asarray(x, dtype=np.int64) for x in code_arrs])
        return pd.Series(
            np.round(lut[np.arange(n_sub)[None, :], c].sum(axis=1), 6))

    return (codes.select(F.col(id_col), adc(F.col("pq_codes")).alias("adc_sim"))
            .orderBy(F.col("adc_sim").desc(), F.col(id_col))
            .limit(k))


def pq_topk(embeddings: DataFrame, query_vec: Sequence[float], k: int = 10,
            *, num_subspaces: int = 8, num_codes: int = 16,
            vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Encode + ADC in one call (the query form; production stores
    ``pq_encode`` output once and serves many queries from it —
    :func:`write_pq_index` / :func:`pq_index_topk`)."""
    cb = pq_codebooks(embeddings, num_subspaces=num_subspaces,
                      num_codes=num_codes, vec_col=vec_col, id_col=id_col)
    return pq_adc_topk(pq_encode(embeddings, cb, vec_col=vec_col,
                                 id_col=id_col),
                       cb, query_vec, k, id_col=id_col)


def write_pq_index(embeddings: DataFrame, path: str, *,
                   codebooks: np.ndarray | None = None,
                   num_subspaces: int = 8, num_codes: int = 16,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id") -> np.ndarray:
    """Materialize the corpus as an at-rest PQ index — the storage twin
    of :func:`write_ivf_index` for the compression tier. Two parquet
    outputs under ``path``:

    - ``codes/``      — (id, pq_codes array<tinyint>): M bytes per
      vector, the ONLY corpus-sized table a query ever scans.
    - ``codebooks/``  — (subspace, code, center array<double>): M×K
      rows, the codebooks needed to rebuild the ADC lookup table.

    Serving (:func:`pq_index_topk`) then never touches raw vectors:
    the scan reads M-byte codes instead of 4·dim floats (~32× less I/O
    at M=8, dim=64), which is what makes billion-scale ANN scans
    feasible. Pass ``pq_codebooks_trained(...)`` output for trained
    codebooks; default is the deterministic lowest-id construction.
    Returns the codebooks used (also persisted alongside the codes)."""
    if codebooks is None:
        codebooks = pq_codebooks(embeddings, num_subspaces=num_subspaces,
                                 num_codes=num_codes, vec_col=vec_col,
                                 id_col=id_col)
    cb = np.asarray(codebooks, dtype=np.float64)
    (pq_encode(embeddings, cb, vec_col=vec_col, id_col=id_col)
     .write.mode("overwrite").parquet(f"{path}/codes"))
    spark = embeddings.sparkSession
    cb_rows = [(s, c, [float(x) for x in cb[s, c]])
               for s in range(cb.shape[0]) for c in range(cb.shape[1])]
    (local_frame(spark, 
        cb_rows, "subspace int, code int, center array<double>")
     .coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks"))
    return cb


def write_ivfpq_index(embeddings: DataFrame, path: str, *,
                      centroids: list[list[float]] | None = None,
                      n_centroids: int = 16, train_iters: int = 4,
                      codebooks: np.ndarray | None = None,
                      num_subspaces: int = 8, num_codes: int = 16,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id") -> tuple[list, np.ndarray]:
    """The combined billion-scale layout: IVF cells as a PARTITION
    column over PQ codes. Serving prunes to ``n_probe`` cell partitions
    (unprobed cells cost zero I/O, like :func:`write_ivf_index`) and
    scans M-byte codes instead of raw vectors inside them (like
    :func:`write_pq_index`) — I/O shrinks multiplicatively:
    (probed fraction) × (M / 4·dim). Under ``path``:

    - ``codes/cell=N/``  — (id, pq_codes), partitioned by IVF cell
    - ``centroids/``     — (cell, center) routing table
    - ``codebooks/``     — (subspace, code, center) ADC codebooks

    Returns (centroids, codebooks); both are also persisted so serving
    needs only the path. Default centroids are TRAINED
    (:func:`kmeans_centroids` — the writer default, like
    :func:`write_ivf_index`; serving reads whatever the centroids
    table says, so explicit centroids still pin routing)."""
    if centroids is None:
        centroids = kmeans_centroids(embeddings, k=n_centroids,
                                     iters=train_iters, vec_col=vec_col,
                                     id_col=id_col)
    if codebooks is None:
        codebooks = pq_codebooks(embeddings, num_subspaces=num_subspaces,
                                 num_codes=num_codes, vec_col=vec_col,
                                 id_col=id_col)
    cb = np.asarray(codebooks, dtype=np.float64)
    cm = np.asarray(centroids, dtype=np.float64)
    nn = np.linalg.norm(cm, axis=1, keepdims=True)
    cmn = cm / np.where(nn == 0, 1.0, nn)
    n_sub, _, sub = cb.shape

    from pyspark.sql.functions import pandas_udf

    # one Arrow pass computes BOTH the cell id and the PQ codes — the
    # corpus is scanned once and never shuffled (partitionBy writes
    # route rows by the computed column)
    @pandas_udf("struct<cell:int, pq_codes:array<tinyint>>")
    def cell_and_codes(vecs: pd.Series) -> pd.DataFrame:
        if len(vecs) == 0:
            return pd.DataFrame({"cell": pd.Series([], dtype="int32"),
                                 "pq_codes": pd.Series([], dtype=object)})
        m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        n = np.linalg.norm(m, axis=1, keepdims=True)
        m = m / np.where(n == 0, 1.0, n)
        cells = np.argmax(m @ cmn.T, axis=1).astype("int32")
        codes = np.empty((len(m), n_sub), dtype=np.int8)
        for s in range(n_sub):
            seg = m[:, s * sub:(s + 1) * sub]
            d2 = (((seg[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2))
            codes[:, s] = np.argmin(d2, axis=1)
        return pd.DataFrame({"cell": cells, "pq_codes": list(codes)})

    enc = embeddings.select(
        F.col(id_col), cell_and_codes(F.col(vec_col)).alias("__cc"))
    (enc.select(id_col, F.col("__cc.cell").alias("cell"),
                F.col("__cc.pq_codes").alias("pq_codes"))
     .write.partitionBy("cell").mode("overwrite").parquet(f"{path}/codes"))
    spark = embeddings.sparkSession
    (local_frame(spark, 
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, center array<double>")
     .coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids"))
    cb_rows = [(s, c, [float(x) for x in cb[s, c]])
               for s in range(cb.shape[0]) for c in range(cb.shape[1])]
    (local_frame(spark, 
        cb_rows, "subspace int, code int, center array<double>")
     .coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks"))
    return [list(map(float, c)) for c in centroids], cb


def append_ivfpq_index(embeddings: DataFrame, path: str, *,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id") -> None:
    """Append-only maintenance for :func:`write_ivfpq_index`: encode a
    new batch with the index's OWN persisted centroids and codebooks
    (read from ``centroids/`` and ``codebooks/`` — no caller-supplied
    parameters to get wrong) and append the codes into their cell
    partition directories. Ids must be new; no read-modify-write.
    Refuses a residual index (its ``meta/`` marker) — residual codes
    need the residual encoder, not this one."""
    from pyspark.errors import AnalysisException

    spark = embeddings.sparkSession
    meta = {}
    try:
        meta = {r["key"]: r["value"]
                for r in spark.read.parquet(f"{path}/meta").collect()}
    except AnalysisException as e:
        # plain IVF-PQ indexes have no meta/ — that absence is the
        # normal case; anything else propagates
        if "PATH_NOT_FOUND" not in str(e) and \
                "Path does not exist" not in str(e):
            raise
    if meta.get("residual") == "true":
        raise ValueError(
            f"index at {path} is a RESIDUAL IVF-PQ index; raw-vector "
            "append would mix incompatible code families")
    cents = (spark.read.parquet(f"{path}/centroids")
             .orderBy("cell").collect())
    centroids = [[float(x) for x in r["center"]] for r in cents]
    cb = read_pq_codebooks(spark, path)
    enc = pq_encode(embeddings, cb, vec_col=vec_col, id_col=id_col)
    cells = embeddings.select(
        F.col(id_col), _ivf_cell_udf(centroids)(F.col(vec_col)).alias("cell"))
    (enc.join(cells, id_col)
     .select(id_col, "cell", "pq_codes")
     .write.partitionBy("cell").mode("append").parquet(f"{path}/codes"))


def ivfpq_index_topk(spark, path: str, query_vec: Sequence[float],
                     k: int = 10, *, n_probe: int = 4,
                     id_col: str = "vec_id") -> DataFrame:
    """Serve a top-k query from a :func:`write_ivfpq_index` table:
    route to the ``n_probe`` nearest cells driver-side (k×dim work),
    then ADC-score ONLY those partitions' codes — the ``cell IN (...)``
    predicate is a partition filter and the scanned columns are id +
    M-byte codes, never raw vectors."""
    cents = (spark.read.parquet(f"{path}/centroids")
             .orderBy("cell").collect())
    centroids = [r["center"] for r in cents]

    def _cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na and nb else 0.0

    probe = sorted(range(len(centroids)),
                   key=lambda i: (-_cos(query_vec, centroids[i]), i))[:n_probe]
    cb = read_pq_codebooks(spark, path)
    codes = (spark.read.parquet(f"{path}/codes")
             .where(F.col("cell").isin(probe)))
    return pq_adc_topk(codes, cb, query_vec, k, id_col=id_col)


def read_pq_codebooks(spark, path: str) -> np.ndarray:
    """Rebuild the (M, K, sub) codebook array from a
    :func:`write_pq_index` table — M×K rows, a driver-side read."""
    rows = (spark.read.parquet(f"{path}/codebooks")
            .orderBy("subspace", "code").collect())
    n_sub = 1 + max(r["subspace"] for r in rows)
    n_code = 1 + max(r["code"] for r in rows)
    cb = np.empty((n_sub, n_code, len(rows[0]["center"])), dtype=np.float64)
    for r in rows:
        cb[r["subspace"], r["code"]] = r["center"]
    return cb


def pq_index_topk(spark, path: str, query_vec: Sequence[float],
                  k: int = 10, *, id_col: str = "vec_id") -> DataFrame:
    """Serve a top-k query from a :func:`write_pq_index` table: load
    the M×K codebooks driver-side, build the query's ADC lookup table,
    and scan ONLY the codes parquet — no raw-vector column exists in
    the scanned table, so the per-row I/O is M bytes (plan-pinned by
    ``tests/test_extensions.py``: the scan schema is id + pq_codes)."""
    cb = read_pq_codebooks(spark, path)
    codes = spark.read.parquet(f"{path}/codes")
    return pq_adc_topk(codes, cb, query_vec, k, id_col=id_col)


# ---------------------------------------------------------------------------
# embedding storage ops: normalization + int8 quantization
# ---------------------------------------------------------------------------


def normalize_embeddings(embeddings: DataFrame, *, vec_col: str = "embedding",
                         out_col: str = "embedding") -> DataFrame:
    """Unit-L2-normalize the embedding column (Arrow-batched numpy; zero
    vectors pass through unchanged). Normalizing once at ingest turns
    every downstream cosine into a dot product — at 100 TB that halves
    the FLOPs of all pairwise kernels and makes sign-LSH/IVF routing
    magnitude-independent."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def norm_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return pd.Series(list(m / n))

    return embeddings.withColumn(out_col, norm_udf(F.col(vec_col)))


def quantize_embeddings(embeddings: DataFrame, *, vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """Symmetric per-vector int8 quantization: ``q = round(x / scale)``
    with ``scale = max|x| / 127``, stored as (id, scale, qvec
    tinyint array). 4x smaller than float32 (16x vs float64) — the
    difference between embeddings fitting in cluster memory or not; the
    max quantization error per coordinate is scale/2."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<scale: double, qvec: array<tinyint>>")
    def quant_udf(vecs: pd.Series) -> pd.DataFrame:
        scales, qvecs = [], []
        for v in vecs:
            a = np.asarray(v, dtype=np.float64)
            amax = float(np.max(np.abs(a))) if a.size else 0.0
            scale = amax / 127.0 if amax > 0 else 1.0
            q = np.clip(np.rint(a / scale), -127, 127).astype(np.int8)
            scales.append(scale)
            qvecs.append(q)
        return pd.DataFrame({"scale": scales, "qvec": qvecs})

    out = embeddings.withColumn("__q", quant_udf(F.col(vec_col)))
    return out.select(id_col, F.col("__q.scale").alias("scale"),
                      F.col("__q.qvec").alias("qvec"))


def dequantize_embeddings(quantized: DataFrame, *, id_col: str = "vec_id",
                          out_col: str = "embedding") -> DataFrame:
    """Inverse of :func:`quantize_embeddings`: x ≈ qvec * scale."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def dequant_udf(qvecs: pd.Series, scales: pd.Series) -> pd.Series:
        return pd.Series([
            np.asarray(q, dtype=np.float64) * s
            for q, s in zip(qvecs, scales)
        ])

    return quantized.select(
        id_col, dequant_udf(F.col("qvec"), F.col("scale")).alias(out_col))


def rrf_fuse(rankings: Sequence[DataFrame], *, rrf_k: int = 60,
             out_k: int = 10) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR 2009) of
    ranked candidate lists — the standard way to combine lexical (BM25)
    and dense (cosine ANN) retrieval without score calibration, since
    only RANKS enter the fused score: ``sum over lists of
    1 / (rrf_k + rank)``.

    Each input frame must have exactly two columns (id, score) and be a
    BOUNDED top-k candidate list (the output of ``bm25_top_docs``,
    ``*_topk``, ...). Ranks are assigned by (score desc, id) — ties
    deterministic — with an unpartitioned window, which is fine
    precisely because the inputs are k-bounded: fusion operates on
    candidate lists, never corpora. Ids missing from a list contribute
    nothing for it (the RRF convention). Returns
    (id, rrf_score, n_lists) — n_lists says how many retrievers
    surfaced the id, the usual confidence signal."""
    from functools import reduce

    from pyspark.sql import Window as _W

    contribs = []
    for r in rankings:
        id_c, score_c = r.columns
        rank = F.row_number().over(
            _W.orderBy(F.col(score_c).desc(), F.col(id_c)))
        contribs.append(
            r.select(F.col(id_c).alias("id"), rank.alias("__rank"))
            .select("id", (1.0 / (F.lit(rrf_k) + F.col("__rank")))
                    .alias("__c")))
    u = reduce(lambda a, b: a.unionByName(b), contribs)
    return (u.groupBy("id")
            .agg(F.round(F.sum("__c"), 6).alias("rrf_score"),
                 F.count(F.lit(1)).alias("n_lists"))
            .orderBy(F.col("rrf_score").desc(), "id")
            .limit(out_k))


def embedding_moments(embeddings: DataFrame, *,
                      vec_col: str = "embedding") -> tuple:
    """One-pass first+second moments of the embedding column:
    (n, mean[d], cov[d, d]) as numpy. The scalable PCA shape — each
    Arrow batch reduces to ONE row (count, Σx, flattened Σxxᵀ) inside
    ``mapInPandas`` (numpy GEMM, so the d² work is BLAS, not Python),
    and only the O(#batches) partial rows reach the driver for the
    final combine. Nothing corpus-sized shuffles or collects; at 100 TB
    the driver sees batches × (d² + d + 1) doubles. Covariance is the
    population form (divide by n), matching the one-pass
    Σxxᵀ/n − μμᵀ identity used here. Raises ``ValueError`` on an empty
    frame (or one whose first vector is null) — moments of nothing are
    undefined, and the old behavior was an opaque ``TypeError``."""
    head = embeddings.select(vec_col).first()
    if head is None or head[0] is None:
        raise ValueError(
            f"empty embedding frame: no non-null {vec_col!r} rows to "
            "compute moments over")
    d = len(head[0])

    def partials(batches):
        for pdf in batches:
            arr = np.stack([np.asarray(v, dtype=np.float64)
                            for v in pdf[vec_col]])
            yield pd.DataFrame({
                "n": [arr.shape[0]],
                "s": [arr.sum(axis=0)],
                "ss": [(arr.T @ arr).ravel()],
            })

    rows = (embeddings.select(vec_col)
            .mapInPandas(partials,
                         "n long, s array<double>, ss array<double>")
            .collect())  # O(#batches) rows — partials, never vectors
    n = sum(r["n"] for r in rows)
    if n == 0:
        raise ValueError("empty embedding frame: zero rows reached the "
                         "moment partials")
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    ss = np.sum([np.asarray(r["ss"]) for r in rows], axis=0).reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    return n, mean, cov


def pca_fit(embeddings: DataFrame, *, k: int | None = None,
            vec_col: str = "embedding") -> dict:
    """PCA over the embedding column from the one-pass moments:
    eigendecomposition of the d×d covariance on the DRIVER (d is the
    embedding width — 64 here; the corpus never re-reads). Returns
    {"mean", "components" (d×k, columns = top eigenvectors by
    eigenvalue desc), "eigvals" (k,), "n"}. Deterministic sign
    convention: each component's largest-|coordinate| entry is made
    positive, so refits reproduce byte-identical models."""
    n, mean, cov = embedding_moments(embeddings, vec_col=vec_col)
    vals, vecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order]
    if k is not None:
        vals, vecs = vals[:k], vecs[:, :k]
    for j in range(vecs.shape[1]):
        i = int(np.argmax(np.abs(vecs[:, j])))
        if vecs[i, j] < 0:
            vecs[:, j] = -vecs[:, j]
    return {"mean": mean, "components": vecs, "eigvals": vals, "n": n}


def pca_whiten(embeddings: DataFrame, model: dict, *, eps: float = 1e-9,
               vec_col: str = "embedding", id_col: str = "vec_id",
               out_col: str = "whitened") -> DataFrame:
    """Project + whiten: y = (x − mean) · components / sqrt(eigvals+eps)
    — decorrelates the embedding space so cosine/Euclidean distances
    stop being dominated by high-variance directions (the standard
    preprocessing before SemDeDup / ANN tiers). One Arrow-batched GEMM
    over the scan (the model ships as a closure literal — no join, no
    shuffle); output components are rounded to 6 dp so downstream
    comparisons are engine-stable."""
    from pyspark.sql.functions import pandas_udf

    mean = np.asarray(model["mean"], dtype=np.float64)
    comp = np.asarray(model["components"], dtype=np.float64)
    scale = 1.0 / np.sqrt(np.asarray(model["eigvals"], dtype=np.float64)
                          + eps)

    @pandas_udf("array<double>")
    def whiten_udf(vecs: pd.Series) -> pd.Series:
        arr = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        out = np.round((arr - mean) @ comp * scale, 6)
        return pd.Series(list(out))

    return embeddings.select(id_col, whiten_udf(F.col(vec_col)).alias(out_col))


def residual_frame(embeddings: DataFrame, centroids: Sequence[Sequence[float]],
                   *, vec_col: str = "embedding",
                   id_col: str = "vec_id") -> DataFrame:
    """(id, cell, residual): each L2-normalized vector's IVF cell (max
    cosine against the normalized centroids, ties to the lowest cell)
    and its residual against that cell's normalized centroid — the
    quantity real IVF-PQ encodes (FAISS's ``by_residual``). Residuals
    have much smaller magnitude than the vectors themselves, so the
    same (M, K) codebook budget quantizes them with far less error.
    One Arrow-batched GEMM pass, no shuffle."""
    from pyspark.sql.functions import pandas_udf

    cm = np.asarray(centroids, dtype=np.float64)
    nn = np.linalg.norm(cm, axis=1, keepdims=True)
    cmn = cm / np.where(nn == 0, 1.0, nn)

    @pandas_udf("struct<cell:int, residual:array<double>>")
    def res(vecs: pd.Series) -> pd.DataFrame:
        if len(vecs) == 0:
            return pd.DataFrame({"cell": pd.Series([], dtype="int32"),
                                 "residual": pd.Series([], dtype=object)})
        m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        n = np.linalg.norm(m, axis=1, keepdims=True)
        m = m / np.where(n == 0, 1.0, n)
        cells = np.argmax(m @ cmn.T, axis=1).astype("int32")
        return pd.DataFrame({"cell": cells,
                             "residual": list(m - cmn[cells])})

    out = embeddings.select(F.col(id_col),
                            res(F.col(vec_col)).alias("__r"))
    return out.select(id_col, F.col("__r.cell").alias("cell"),
                      F.col("__r.residual").alias("residual"))


def write_ivfpq_residual_index(embeddings: DataFrame, path: str, *,
                               centroids: list[list[float]] | None = None,
                               n_centroids: int = 16,
                               num_subspaces: int = 8, num_codes: int = 16,
                               train_iters: int = 4,
                               vec_col: str = "embedding",
                               id_col: str = "vec_id") -> tuple[list, np.ndarray]:
    """IVF-PQ with RESIDUAL encoding — the faithful FAISS-style tier
    above :func:`write_ivfpq_index` (which quantizes raw vectors):
    codes are PQ codes of ``x_norm − centroid[cell]``, with codebooks
    TRAINED per-subspace on the residual distribution
    (:func:`pq_codebooks_trained` over :func:`residual_frame`).
    Because residual magnitudes are a fraction of vector magnitudes,
    the same M×K code budget yields strictly lower reconstruction
    error (test-pinned against the raw-vector index).

    Layout matches :func:`write_ivfpq_index` (``codes/cell=N/``,
    ``centroids/``, ``codebooks/``) plus ``meta/`` marking the index
    residual so serving can't silently score residual codes with the
    raw-vector rule. Serving: ``ivfpq_residual_index_topk`` adds the
    per-cell bias q·centroid[cell] to the ADC sum — exactly the
    decomposition q·x ≈ q·c + q·r. Default centroids are TRAINED
    (:func:`kmeans_centroids`, ``train_iters`` Lloyd passes — the
    writer default; FAISS by_residual likewise assumes trained coarse
    quantizers, since residual magnitude shrinks with routing
    quality)."""
    if centroids is None:
        centroids = kmeans_centroids(embeddings, k=n_centroids,
                                     iters=train_iters, vec_col=vec_col,
                                     id_col=id_col)
    res = residual_frame(embeddings, centroids, vec_col=vec_col,
                         id_col=id_col)
    res = res.localCheckpoint(eager=False)  # feeds training AND encoding
    cb = pq_codebooks_trained(
        res.select(id_col, F.col("residual").alias("embedding")),
        num_subspaces=num_subspaces, num_codes=num_codes,
        iters=train_iters, id_col=id_col)
    cbn = np.asarray(cb, dtype=np.float64)
    n_sub, _, sub = cbn.shape

    from pyspark.sql.functions import pandas_udf

    # encode the residual directly (NOT pq_encode, which re-normalizes
    # its input — a residual must be quantized as-is)
    @pandas_udf("array<tinyint>")
    def encode_res(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        codes = np.empty((len(m), n_sub), dtype=np.int8)
        for s in range(n_sub):
            seg = m[:, s * sub:(s + 1) * sub]
            d2 = (((seg[:, None, :] - cbn[s][None, :, :]) ** 2).sum(axis=2))
            codes[:, s] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    (res.select(id_col, "cell", encode_res(F.col("residual")).alias("pq_codes"))
     .write.partitionBy("cell").mode("overwrite").parquet(f"{path}/codes"))
    spark = embeddings.sparkSession
    (local_frame(spark, 
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, center array<double>")
     .coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids"))
    cb_rows = [(s, c, [float(x) for x in cbn[s, c]])
               for s in range(cbn.shape[0]) for c in range(cbn.shape[1])]
    (local_frame(spark, 
        cb_rows, "subspace int, code int, center array<double>")
     .coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks"))
    (local_frame(spark, [("residual", "true")], "key string, value string")
     .coalesce(1).write.mode("overwrite").parquet(f"{path}/meta"))
    return [list(map(float, c)) for c in centroids], cbn


def append_ivfpq_residual_index(embeddings: DataFrame, path: str, *,
                                vec_col: str = "embedding",
                                id_col: str = "vec_id") -> None:
    """Append-only maintenance for :func:`write_ivfpq_residual_index`:
    route the new batch with the index's persisted centroids, encode
    the RESIDUALS with its persisted codebooks, append into cell dirs.
    Refuses a non-residual index (meta guard) — the two code families
    must never mix."""
    from pyspark.errors import AnalysisException

    spark = embeddings.sparkSession
    meta = {}
    try:
        meta = {r["key"]: r["value"]
                for r in spark.read.parquet(f"{path}/meta").collect()}
    except AnalysisException as e:
        if "PATH_NOT_FOUND" not in str(e) and \
                "Path does not exist" not in str(e):
            raise
    if meta.get("residual") != "true":
        raise ValueError(
            f"index at {path} is not a residual IVF-PQ index; append "
            "with append_ivfpq_index instead")
    cents = (spark.read.parquet(f"{path}/centroids")
             .orderBy("cell").collect())
    centroids = [[float(x) for x in r["center"]] for r in cents]
    cbn = np.asarray(read_pq_codebooks(spark, path), dtype=np.float64)
    n_sub, _, sub = cbn.shape

    from pyspark.sql.functions import pandas_udf

    res = residual_frame(embeddings, centroids, vec_col=vec_col,
                         id_col=id_col)

    @pandas_udf("array<tinyint>")
    def encode_res(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        codes = np.empty((len(m), n_sub), dtype=np.int8)
        for s in range(n_sub):
            seg = m[:, s * sub:(s + 1) * sub]
            d2 = (((seg[:, None, :] - cbn[s][None, :, :]) ** 2).sum(axis=2))
            codes[:, s] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    (res.select(id_col, "cell", encode_res(F.col("residual")).alias("pq_codes"))
     .write.partitionBy("cell").mode("append").parquet(f"{path}/codes"))


def ivfpq_residual_index_topk(spark, path: str, query_vec: Sequence[float],
                              k: int = 10, *, n_probe: int = 4,
                              id_col: str = "vec_id") -> DataFrame:
    """Serve top-k from a residual IVF-PQ index: q·x ≈ q·centroid[cell]
    (a per-cell scalar bias, a ``cell -> bias`` literal map over the
    n_probe probed cells) + the residual ADC lookup sum. Scans are
    partition-pruned to probed cells and touch id + M-byte codes only.
    Refuses a non-residual index (meta check) — scoring raw-vector
    codes with the bias rule would silently inflate every score."""
    from pyspark.errors import AnalysisException

    meta = {}
    try:
        meta = {r["key"]: r["value"]
                for r in spark.read.parquet(f"{path}/meta").collect()}
    except AnalysisException as e:
        # a missing meta/ dir means "not a residual index" (the refusal
        # below); any other read failure propagates rather than being
        # mistaken for that
        if "PATH_NOT_FOUND" not in str(e) and \
                "Path does not exist" not in str(e):
            raise
    if meta.get("residual") != "true":
        raise ValueError(
            f"index at {path} is not a residual IVF-PQ index; serve it "
            "with ivfpq_index_topk instead")
    cents = (spark.read.parquet(f"{path}/centroids")
             .orderBy("cell").collect())
    cm = np.asarray([r["center"] for r in cents], dtype=np.float64)
    nn = np.linalg.norm(cm, axis=1, keepdims=True)
    cmn = cm / np.where(nn == 0, 1.0, nn)
    q = np.asarray(list(query_vec), dtype=np.float64)
    qn = np.linalg.norm(q)
    q = q / (qn if qn else 1.0)
    sims = cmn @ q
    probe = sorted(range(len(cm)), key=lambda i: (-sims[i], i))[:n_probe]

    cb = read_pq_codebooks(spark, path)
    n_sub = cb.shape[0]
    sub = cb.shape[2]
    lut = np.stack([cb[s] @ q[s * sub:(s + 1) * sub]
                    for s in range(n_sub)])

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def adc_res(code_arrs: pd.Series) -> pd.Series:
        if len(code_arrs) == 0:
            return pd.Series([], dtype=float)
        c = np.array([np.asarray(x, dtype=np.int64) for x in code_arrs])
        return pd.Series(lut[np.arange(n_sub)[None, :], c].sum(axis=1))

    bias = F.create_map(*[F.lit(v) for i in probe
                          for v in (int(i), float(sims[i]))])
    codes = (spark.read.parquet(f"{path}/codes")
             .where(F.col("cell").isin(probe)))
    return (codes.select(
                F.col(id_col),
                F.round(adc_res(F.col("pq_codes"))
                        + bias[F.col("cell")], 6).alias("adc_sim"))
            .orderBy(F.col("adc_sim").desc(), F.col(id_col))
            .limit(k))


def opq_rotation(embeddings: DataFrame, *, num_subspaces: int = 8,
                 vec_col: str = "embedding") -> np.ndarray:
    """Parametric OPQ rotation (Ge et al., CVPR 2013, the
    eigenvalue-allocation variant): a d×d orthonormal matrix that (a)
    decorrelates the data (PCA basis from the one-pass
    :func:`embedding_moments`) and (b) BALANCES variance across the PQ
    subspaces by greedily assigning principal directions, largest
    eigenvalue first, to the subspace with the smallest current
    eigenvalue product. Plain PCA rotation would concentrate variance
    in the first subspace — the worst case for product quantization;
    balancing is what makes the rotation help. Rotation preserves inner
    products and norms, so ADC scores of rotated codes against a
    rotated query estimate the SAME cosine."""
    model = pca_fit(embeddings, vec_col=vec_col)
    comp = np.asarray(model["components"], dtype=np.float64)  # d×d, desc
    vals = np.asarray(model["eigvals"], dtype=np.float64)
    d = comp.shape[0]
    _check_subspace_divisibility(d, num_subspaces)
    per = d // num_subspaces
    # greedy eigenvalue allocation: log-product balancing
    buckets: list[list[int]] = [[] for _ in range(num_subspaces)]
    logsum = [0.0] * num_subspaces
    eps = 1e-12
    for i in range(d):  # eigvals already descending
        open_b = [b for b in range(num_subspaces) if len(buckets[b]) < per]
        b = min(open_b, key=lambda j: (logsum[j], j))
        buckets[b].append(i)
        logsum[b] += float(np.log(vals[i] + eps))
    order = [i for b in buckets for i in b]
    # columns = rotated basis vectors, subspace-blocked
    return comp[:, order]


def rotate_embeddings(embeddings: DataFrame, rotation: np.ndarray, *,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id",
                      out_col: str = "embedding") -> DataFrame:
    """Apply an orthonormal rotation (e.g. :func:`opq_rotation`) to the
    embedding column — one Arrow-batched GEMM, no shuffle. Feed the
    result to the PQ tier and rotate queries with the same matrix
    (``list(vec @ R)``)."""
    from pyspark.sql.functions import pandas_udf

    R = np.asarray(rotation, dtype=np.float64)

    @pandas_udf("array<double>")
    def rot_udf(vecs: pd.Series) -> pd.Series:
        arr = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        return pd.Series(list(arr @ R))

    return embeddings.select(id_col, rot_udf(F.col(vec_col)).alias(out_col))


def mine_triplets(embeddings: DataFrame, *,
                  planes: list[list[float]] | None = None,
                  num_planes: int | None = None, bands: int | None = None,
                  max_bucket_size: int | None = 512,
                  target_bucket_size: int = 64,
                  vec_col: str = "embedding", id_col: str = "vec_id",
                  label_col: str = "label") -> DataFrame:
    """Mine (anchor, positive, hard-negative) triplets for contrastive
    embedding training — the data-side half of metric learning (FaceNet
    / SimCSE recipe: positives from the same class, negatives that are
    CLOSE but wrong, because random negatives carry no gradient).

    - **positive**: the anchor's exact nearest same-label neighbor.
      Label blocking bounds the quadratic step, and the within-block
      scoring is ONE normalized GEMM per label inside an Arrow batch
      (``applyInPandas``) emitting only each anchor's top-1 — the same
      BLAS-not-pair-join shape as ``dedup.embedding_cosine_pairs``.
      Metric-learning class blocks are small by construction; a label
      too large for one worker's GEMM should go through the blocked
      grid of ``embedding_cosine_pairs`` instead.
    - **hard negative**: the highest-cosine DIFFERENT-label vector
      among the anchor's banded sign-LSH candidates
      (:func:`eventstorm_spark.extensions.dedup.embedding_near_duplicates`
      with the threshold open) — LSH buckets *are* the hard-negative
      sampler at scale: they surface close-but-wrong vectors without
      the cross-label all-pairs product, and anchors with no
      cross-label collision have no hard negative worth training on
      (every negative is easy) so they drop out, which is exactly the
      curriculum semantics.

    Output: (anchor, pos_id, pos_sim, neg_id, neg_sim, margin) with
    margin = round(pos_sim - neg_sim, 6); a small/negative margin marks
    the triplets that matter under a margin loss. Ties break on the
    smaller candidate id; sims round to 6 like every cosine here, so
    with portable planes the whole mining run is oracle-replayable.

    Scale shape: the label-blocked positive join shuffles on label; the
    negative side reuses the LSH machinery's slim (id, id) candidate
    pairs; the final assembly is two per-anchor top-1 windows and an
    id-keyed join. No all-pairs product anywhere — PROVIDED the
    banding keeps buckets bounded: candidate mass is sum over buckets
    of |bucket|^2, linear only while bucket sizes stay bounded, so the
    SCALE-SAFE DEFAULTS here derive bits-per-band from the corpus
    (bucket count ~= n / ``target_bucket_size``, one cheap count job
    when ``num_planes``/``bands`` are not given) and cap degenerate
    buckets at ``max_bucket_size=512`` (deterministic whole-bucket
    drop, SQL-replayable as ``HAVING count(*) <= cap``). The sf1 probe
    (SCALE.md section 10.3) measured the difference: a CONSTANT 6-bit
    band uncapped is 19.3x at 10x data (quadratic); 12-bit + cap 512
    is 3.4x with 62% of anchors keeping a hard negative. Pass explicit
    ``num_planes``/``bands``/``max_bucket_size=None`` to reproduce a
    fixed small-corpus config.

    .. versionchanged:: round 11
       Defaults changed for scale safety: ``bands`` 4→2,
       ``max_bucket_size`` None→512, and ``num_planes`` is now
       corpus-derived when unset (one extra ``count()`` action). A
       caller passing only ``planes=...`` gets different buckets than
       before, and anchors in buckets larger than the cap are DROPPED
       (whole-bucket, deterministic) — pass the explicit pre-r11
       values (``bands=4``, ``max_bucket_size=None``) to reproduce the
       old behavior.
    """
    import math

    from pyspark.sql import Window as W

    from eventstorm_spark.extensions.dedup import embedding_near_duplicates

    if bands is None:
        bands = 2
    if num_planes is None:
        if planes is not None:
            num_planes = len(planes)
        else:
            # bucket count ~= n / target_bucket_size per band: grow
            # bits with the corpus so bucket sizes stay bounded
            n = embeddings.count()
            bits = int(math.ceil(math.log2(
                max(2.0, n / float(target_bucket_size)))))
            bits = min(max(bits, 4), 24)
            num_planes = bits * bands

    labels = embeddings.select(F.col(id_col).alias("__id"),
                               F.col(label_col).alias("__lbl"))

    # positives: exact top-1 within label, one GEMM per label block
    def pos_top1(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__id").reset_index(drop=True)
        if len(pdf) < 2:
            return pd.DataFrame({"anchor": [], "pos_id": [],
                                 "pos_sim": []})
        m = np.stack([np.asarray(v, dtype=np.float64)
                      for v in pdf["__vec"]])
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = 1.0
        mn = m / n[:, None]
        sims = np.round(mn @ mn.T, 6)
        np.fill_diagonal(sims, -2.0)  # exclude self
        # argmax returns the FIRST max: ids ascending -> smallest-id ties
        best = sims.argmax(axis=1)
        ids = pdf["__id"].to_numpy()
        return pd.DataFrame({"anchor": ids, "pos_id": ids[best],
                             "pos_sim": sims[np.arange(len(ids)), best]})

    pos_in = embeddings.select(F.col(id_col).alias("__id"),
                               F.col(label_col).alias("__lbl"),
                               F.col(vec_col).alias("__vec"))
    # pin the label exchange's width on narrow inputs (round 18, the
    # repartition-IS-the-exchange idiom): the groupBy's own exchange is
    # AQE-coalesced by BYTES (n=2 at sf0.1 — the per-label GEMM, the
    # single biggest wall chunk of the composed plan, ran on 2 of 32
    # cores); an explicit repartition on the SAME key is never
    # coalesced and satisfies applyInPandas's clustering, so no second
    # exchange appears. Width cores/4, the measured fan-out floor. At
    # scale the scan carries >= floor partitions and AQE's byte sizing
    # stands.
    _floor = max(
        1, embeddings.sparkSession.sparkContext.defaultParallelism // 4)
    if not embeddings.isStreaming and \
            embeddings.rdd.getNumPartitions() < _floor:
        pos_in = pos_in.repartition(_floor, F.col("__lbl"))
    pos = (pos_in
           .groupBy("__lbl")
           .applyInPandas(pos_top1,
                          "anchor long, pos_id long, pos_sim double"))

    # hard negatives: cross-label LSH candidates, top-1 per anchor.
    # Candidate mass is sum over buckets of |bucket|^2 — LINEAR only
    # while bucket sizes stay bounded, so at scale the bits-per-band
    # must grow with the corpus (bucket count ~ n / target_size) and
    # ``max_bucket_size`` (deterministic whole-bucket drop, the dedup
    # tier's guard, SQL-replayable as HAVING count <= cap) bounds the
    # degenerate buckets that remain. The sf1 probe tables both knobs.
    cands = embedding_near_duplicates(
        embeddings, threshold=-1.0, num_planes=num_planes, bands=bands,
        planes=planes, max_bucket_size=max_bucket_size,
        vec_col=vec_col, id_col=id_col)
    # the verified candidate table feeds BOTH direction branches of the
    # anchor union below — checkpoint it so the whole LSH + verify
    # pipeline plans (and its Python-boundary nodes codegen) once;
    # candidate-pair-sized (id, id, sim) rows
    cands = cands.localCheckpoint(eager=False)
    both = (cands.select(F.col("id_a").alias("anchor"),
                         F.col("id_b").alias("neg_id"), "cosine_sim")
            .unionByName(cands.select(F.col("id_b").alias("anchor"),
                                      F.col("id_a").alias("neg_id"),
                                      "cosine_sim")))
    crossed = (both
               .join(labels.withColumnRenamed("__id", "anchor")
                     .withColumnRenamed("__lbl", "__la"), "anchor")
               .join(labels.withColumnRenamed("__id", "neg_id")
                     .withColumnRenamed("__lbl", "__lb"), "neg_id")
               .where(F.col("__la") != F.col("__lb")))
    wn = W.partitionBy("anchor").orderBy(F.col("cosine_sim").desc(),
                                         F.col("neg_id"))
    neg = (crossed.withColumn("__r", F.row_number().over(wn))
           .where(F.col("__r") == 1)
           .select("anchor", "neg_id",
                   F.col("cosine_sim").alias("neg_sim")))

    return (pos.join(neg, "anchor")
            .select("anchor", "pos_id", "pos_sim", "neg_id", "neg_sim",
                    F.round(F.col("pos_sim") - F.col("neg_sim"), 6)
                    .alias("margin")))
