"""URL-level curation operators — the step-zero of web-corpus pipelines.

Crawl pipelines (CCNet, C4, RefinedWeb, FineWeb) dedup by URL before
anything touches a payload: the same page arrives under dozens of raw
spellings (scheme/host case, ``www.`` prefixes, default ports, tracking
parameters, re-ordered query strings, fragments, trailing slashes), and
collapsing them to one canonical key removes re-crawls at the cost of a
string expression instead of a shingle join. This module provides

- :func:`canonical_url_expr` — the canonicalization rule as one pure
  JVM column expression (regex part-extraction + higher-order-function
  query-parameter filter/sort; no UDF, whole-stage-codegen friendly,
  and bit-for-bit replayable by the DuckDB oracle);
- :func:`url_dedup` — keep-first URL-level dedup (min id per canonical
  URL, the same keep-one rule as the content-digest tier in
  :mod:`eventstorm_spark.extensions.dedup`);
- :func:`host_composition` — the per-host dataset-card table (docs,
  distinct pages, re-crawl rate) a domain-filtering pass reads;
- :func:`synth_urls` — deterministic messy-URL synthesis over the test
  corpus (the driver's ``documents`` table has no URL column), in the
  same replayable-recurrence style as ``multimodal.synth_assets``.

Scale shape: canonicalization is a zero-shuffle projection; URL dedup
shuffles 8-byte-hashable canonical keys plus ids only (payloads move
nothing — the keep-set joins back by id); host composition is a
bounded-cardinality aggregate (#hosts). At 100 TB this is exactly the
cheap first funnel stage it is in production pipelines.

For an at-rest frontier store, the digest-index machinery is already
generic: ``curation.write_digest_index(canonicalized, path,
text_col="canonical_url")`` persists the seen set as 16-byte rows with
the full build→probe→append→compact lifecycle.

The reference engine has no URL tier (its scope is the event log);
this belongs to the §2.8 training-data-pipeline extension suite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tracking parameters stripped by canonicalization. Matches the common
# cross-site junk (utm_* campaign tags, click ids, bare ref tags) —
# kept deliberately small and well-known so the rule is predictable.
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|ref)(=|$)"

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[^:/?#]+://([^/?#]*)"
_PATH_RE = r"^[^:/?#]+://[^/?#]*([^?#]*)"
_QUERY_RE = r"^[^#]*\?([^#]*)"


def canonical_url_expr(url: Column | str) -> Column:
    """Canonical form of a raw URL as a pure column expression.

    Rules (each undoes a spelling variant that does NOT change the
    resource): lowercase scheme and host; strip one leading ``www.``;
    strip the scheme's default port (``:80`` http / ``:443`` https);
    drop the fragment; drop tracking parameters
    (:data:`TRACKING_PARAM_RE`); sort surviving query parameters
    byte-lexicographically; strip trailing slashes from the path (a
    bare-root ``/`` canonicalizes to the empty path).

    Everything is regex part-extraction plus a higher-order
    filter/sort over the split query string — no UDF, so the
    expression inlines into whole-stage codegen and the DuckDB oracle
    replays it exactly (same regexes, ``list_filter``/``list_sort``).
    """
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(u, _HOSTPORT_RE, 1))
    host0 = F.regexp_replace(hostport, r"^www\.", "")
    host = (F.when(scheme == "https", F.regexp_replace(host0, ":443$", ""))
             .when(scheme == "http", F.regexp_replace(host0, ":80$", ""))
             .otherwise(host0))
    path = F.regexp_replace(F.regexp_extract(u, _PATH_RE, 1), "/+$", "")
    query = F.regexp_extract(u, _QUERY_RE, 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE))
    qs = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)))


def canonicalize_urls(df: DataFrame, *, url_col: str = "url",
                      out_col: str = "canonical_url") -> DataFrame:
    """Add ``out_col`` = canonical form of ``url_col`` (zero shuffles)."""
    return df.withColumn(out_col, canonical_url_expr(url_col))


def url_dedup(df: DataFrame, *, url_col: str = "canonical_url",
              id_col: str = "doc_id") -> DataFrame:
    """Keep-first URL dedup: one row per canonical URL, the min id wins.

    Same keep-one rule as content-digest exact dedup: min(id) per key
    is deterministic, order-insensitive and re-run-stable. The shuffle
    moves (canonical_url, id) pairs only; the kept-id set then
    semi-joins back by id, so document payloads are never exchanged —
    at 100 TB the URL table is ~100 B/doc against ~MB payloads.
    """
    keep = (df.groupBy(url_col)
              .agg(F.min(id_col).alias(id_col))
              .select(id_col))
    return df.join(keep, id_col, "left_semi")


def host_composition(df: DataFrame, *, url_col: str = "canonical_url",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-host dataset-card: docs, distinct pages, re-crawl surplus.

    ``dup_docs = n_docs - n_pages`` is the count of rows URL dedup
    would drop — the host-level re-crawl audit read before assigning
    domain weights. One aggregate with #hosts output rows; the
    count_distinct is per-host over canonical URLs (bounded by the
    host's page count, map-side partial-agg friendly).
    """
    host = F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)
    return (df.groupBy(host.alias("host"))
              .agg(F.count(F.lit(1)).alias("n_docs"),
                   F.countDistinct(url_col).alias("n_pages"),
                   (F.count(F.lit(1)) - F.countDistinct(url_col))
                   .alias("dup_docs")))


def streaming_url_dedup(stream_df: DataFrame, seen_urls: DataFrame | None = None, *,
                        url_col: str = "url",
                        event_time_col: str = "ts",
                        watermark_delay: str = "10 minutes") -> DataFrame:
    """Streaming URL dedup: the continuous form of :func:`url_dedup`
    for a live crawl frontier (mirrors
    ``curation.streaming_dedup_against_corpus``, keyed by canonical
    URL instead of content digest — the crawler-side filter that runs
    BEFORE fetch/payload work).

    Two state-bounded layers:

    1. optional *stream-static left-anti join* against ``seen_urls``
       (a frame with ``url_col``; raw or canonical — it is
       canonicalized here). Re-read per micro-batch, so a frontier
       store that grows between batches is honored without restart;
       stateless.
    2. ``dropDuplicatesWithinWatermark`` on the canonical URL bounds
       intra-stream dedup state by the watermark — the only viable
       contract on an unbounded feed. Later re-crawls are out of
       contract (they are what recrawl policies WANT to see anyway).

    The join key is an 8-byte xxhash64 of the canonical URL, so the
    anti-join never ships URL strings. Returns the stream with a
    ``canonical_url`` column attached.
    """
    canon = stream_df.withColumn("canonical_url",
                                 canonical_url_expr(url_col))
    keyed = canon.withColumn("__ukey", F.xxhash64("canonical_url"))
    if seen_urls is not None:
        at_rest = (seen_urls
                   .select(F.xxhash64(canonical_url_expr(url_col))
                           .alias("__ukey"))
                   .distinct())
        keyed = keyed.join(at_rest, "__ukey", "left_anti")
    wm = keyed.withWatermark(event_time_col, watermark_delay)
    return wm.dropDuplicatesWithinWatermark(["__ukey"]).drop("__ukey")


def synth_urls(docs: DataFrame, *, pages_per_source: int = 100,
               id_col: str = "doc_id", source_col: str = "source") -> DataFrame:
    """Deterministic messy URLs for the test corpus (no URL column ships).

    Each document maps to page ``doc_id % pages_per_source`` on host
    ``{source}.example.com`` — so documents sharing (source, page) are
    re-crawls of the same resource — and the raw spelling varies by
    deterministic ``doc_id`` arithmetic across every axis the
    canonicalizer must undo: scheme case (mod 3), ``www.`` prefix
    (mod 2), host case (mod 5), explicit ``:443`` (mod 7), trailing
    slash (mod 11), query-parameter order (mod 2), injected
    ``utm_source``/``ref``/``fbclid`` tracking junk (mod 3/11/17) and a
    fragment (mod 6). Pure integer-and-concat recurrence — the oracle
    rebuilds the exact byte string in SQL, so a canonicalization bug
    anywhere breaks the value hash.
    """
    d = F.col(id_col)
    page = (d % pages_per_source).cast("string")
    src = F.col(source_col)
    scheme = (F.when(d % 3 == 0, "HTTPS")
               .when(d % 3 == 1, "https")
               .otherwise("Https"))
    host_base = F.concat(src, F.lit(".example.com"))
    host = F.when(d % 5 == 0, F.upper(host_base)).otherwise(host_base)
    www = F.when(d % 2 == 0, "www.").otherwise("")
    port = F.when(d % 7 == 0, ":443").otherwise("")
    trail = F.when(d % 11 == 0, "/").otherwise("")
    core = (F.when(d % 2 == 0, F.concat(F.lit("id="), page, F.lit("&v=2")))
             .otherwise(F.concat(F.lit("v=2&id="), page)))
    junk_pre = (F.when(d % 17 == 0,
                       F.concat(F.lit("fbclid=x"), d.cast("string"), F.lit("&")))
                 .otherwise(""))
    junk_utm = F.when(d % 3 == 0, "&utm_source=feed").otherwise("")
    junk_ref = F.when(d % 11 == 0, "&ref=tw").otherwise("")
    frag = (F.when(d % 6 == 0,
                   F.concat(F.lit("#sec"), (d % 4).cast("string")))
             .otherwise(""))
    url = F.concat(scheme, F.lit("://"), www, host, port,
                   F.lit("/docs/page-"), page, trail, F.lit("?"),
                   junk_pre, core, junk_utm, junk_ref, frag)
    return docs.select(d.alias(id_col), src.alias(source_col),
                       url.alias("url"))


# ---------------------------------------------------------------------------
# Host/page link analysis (PageRank) — domain-reputation scoring
# ---------------------------------------------------------------------------


def synth_link_graph(docs: DataFrame, *, pages_per_source: int = 100,
                     fanout: int = 3, id_col: str = "doc_id",
                     source_col: str = "source") -> DataFrame:
    """Deterministic (src, dst) page-link edges over the test corpus
    (documents carry no link data): each document links its page node
    ``{source}/{doc_id % pages}`` to ``fanout`` targets whose page and
    host indices are pure ``doc_id`` arithmetic — same replayable-
    recurrence style as :func:`synth_urls`. Cross-host edges arise from
    the host-index rotation, so the graph is connected enough for rank
    mass to move between domains. Output is the DISTINCT edge list."""
    from pyspark.sql import Window as W
    srcs = (docs.select(F.col(source_col).alias("s")).distinct()
            .withColumn("idx", F.row_number().over(
                W.orderBy("s")) - 1))
    n_src = srcs.count()  # #hosts: tiny, known-bounded metadata
    d = F.col(id_col)
    page = d % pages_per_source
    edges = None
    for j in range(1, fanout + 1):
        dst_page = (page * 31 + 7 * j + d) % pages_per_source
        dst_idx = (d + j) % n_src
        e = docs.select(
            F.concat(F.col(source_col), F.lit("/"),
                     page.cast("string")).alias("src"),
            dst_idx.cast("int").alias("__di"),
            dst_page.cast("string").alias("__dp"))
        edges = e if edges is None else edges.unionByName(e)
    out = (edges.join(F.broadcast(srcs), edges["__di"] == srcs["idx"])
           .select("src", F.concat(F.col("s"), F.lit("/"),
                                   F.col("__dp")).alias("dst"))
           .distinct())
    return out


def page_rank(edges: DataFrame, *, damping: float = 0.85,
              iters: int = 3) -> DataFrame:
    """PageRank over a (src, dst) edge list — the domain/page
    reputation score curation pipelines threshold on (host-level spam
    filtering a la CommonCrawl domain ranks).

    Formulation: textbook power iteration with uniform teleport and
    dangling-mass redistribution —
    ``r'(v) = (1-d)/N + d * (sum_{u->v} r(u)/outdeg(u) + D/N)`` with
    ``D = sum of r(u) over dangling u`` (nodes with no out-edges).

    Spark shape: the loop unrolls into the plan — each iteration is one
    equi-join of the edge list with the current rank frame plus the
    dangling-mass scalar aggregate, all map-side-combinable. The driver
    never holds ranks — per-iteration state is the DataFrame itself —
    but it does hold N and each iteration's dangling mass (one long,
    one double: bounded metadata, the trainer-loop contract). At 100 TB
    the edge list partitions by src once and every iteration reuses
    that exchange; for deep iteration counts interpose
    ``df.localCheckpoint()`` every few rounds to truncate lineage (the
    same discipline as the k-means/BPE trainer loops).

    Determinism: ranks are QUANTIZED to 9 decimals at every iteration
    boundary. Within one iteration the only engine-order-sensitive step
    is float summation (drift ~1e-15, eight orders below the quantum),
    so an external engine replaying the same chained expressions
    reproduces every iteration bit-for-bit — same contract as the
    step-replay quality trainer.
    """
    # Truncate lineage at each reused frame: edges/nodes/outdeg feed
    # every iteration, and each iteration's ranks feed three consumers
    # (dangling, contrib, next ranks) — without a checkpoint the plan
    # tree re-derives the previous iteration per consumer (3^iters
    # recomputes of the edge synthesis).
    edges = edges.localCheckpoint(eager=False)
    nodes = (edges.select(F.col("src").alias("node"))
             .unionByName(edges.select(F.col("dst").alias("node")))
             .distinct()).localCheckpoint(eager=False)
    outdeg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")).localCheckpoint(eager=False)
    # N and the per-iteration dangling mass are BOUNDED driver scalars
    # (one long, one double — the same bounded-metadata class as the
    # trainer loops' weight vectors; the driver still never holds
    # ranks). Round 17 shipped both as 1-row broadcast cross joins and
    # the iteration loop profiled as 52 tiny jobs at sf0.1 — each
    # iteration re-ran the N aggregate's broadcast build plus the
    # dangling agg's own exchange+broadcast stages under AQE, pure
    # per-job scheduling overhead (2.2 s stage-wall in a 4.3 s run).
    # Collecting them embeds the SAME doubles as literals: the division
    # and rounding expressions are unchanged, so every iteration is
    # bit-identical to the broadcast form (oracle-verified).
    n_total = nodes.count()
    ranks = nodes.select(
        "node", F.round(F.lit(1.0) / F.lit(n_total), 9).alias("rank"))
    for _ in range(iters):
        ranks = ranks.localCheckpoint(eager=False)
        with_deg = ranks.join(outdeg, "node", "left")
        dang = (with_deg.where(F.col("outdeg").isNull())
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0))
                     .alias("__dang")).collect()[0][0])
        contrib = (edges.join(with_deg.where(F.col("outdeg").isNotNull()),
                              edges["src"] == F.col("node"))
                   .groupBy("dst")
                   .agg(F.sum(F.col("rank") / F.col("outdeg"))
                        .alias("__c")))
        ranks = (nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
                 .select(
                     "node",
                     F.round(
                         (1.0 - damping) / F.lit(n_total)
                         + damping * (F.coalesce(F.col("__c"), F.lit(0.0))
                                      + F.lit(dang) / F.lit(n_total)),
                         9).alias("rank")))
    return ranks


def label_propagation(edges: DataFrame, *, iters: int = 4) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) over an undirected view of the (src, dst) edge list —
    the domain/page clustering read next to :func:`page_rank`'s
    reputation score (mirror-site groups, template farms, link rings
    all surface as one community).

    Rule: every node starts labeled with itself; each round it adopts
    its neighbors' most frequent label, ties broken by the
    lexicographically smallest label, isolated/tied-out nodes keeping
    their own. Unlike classic randomized LPA, the tie-break makes
    every round a pure deterministic function of the previous
    labeling — the whole run replays in SQL as chained CTEs (one
    count + one argmax per round), the same step-replay contract as
    :func:`page_rank`. Synchronous updates can 2-cycle on bipartite
    substructures; a fixed ``iters`` makes the output well-defined
    either way (run one extra round to detect a cycle if you need
    convergence testing).

    Plan shape per round: one equi-join of the undirected edges with
    the current labels (partitioned on the neighbor key), one
    map-side-combined (node, label) count, one per-node top-1 window —
    every exchange is on the node key, so at graph scale the
    partitioning is established once and reused. No floats anywhere:
    the computation is exactly reproducible under any partitioning.
    Returns (node, label) where label is the community representative.
    """
    from pyspark.sql import Window as W

    und = (edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
           .unionByName(
               edges.select(F.col("dst").alias("u"),
                            F.col("src").alias("v")))
           .where(F.col("u") != F.col("v"))
           .distinct()).localCheckpoint(eager=False)
    labels = (und.select(F.col("u").alias("node")).distinct()
              .withColumn("label", F.col("node")))
    w = W.partitionBy("u").orderBy(F.col("__c").desc(), F.col("label"))
    for _ in range(iters):
        labels = labels.localCheckpoint(eager=False)
        counts = (und.join(labels, und["v"] == labels["node"])
                  .groupBy("u", "label")
                  .agg(F.count(F.lit(1)).alias("__c")))
        best = (counts.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") == 1)
                .select(F.col("u").alias("node"),
                        F.col("label").alias("__new")))
        labels = (labels.join(best, "node", "left")
                  .select("node",
                          F.coalesce("__new", "label").alias("label")))
    return labels
