"""Property-graph surface queries (SURVEY.md §1.2, S3/S8/F7, J1/J4).

The reference materializes a Neo4j multigraph row-by-row
(`neo4j_setup.py:43-95`) then sanity-checks it with count queries
(`neo4j_setup.py:107`). Here the graph is lazy projections of the fact
table (operators/graph.py), so the "load" is free and these queries
verify the *model*: node cardinalities, edge multiplicities, and the
edge property payload (ISO-string timestamps, `neo4j_setup.py:71`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from threat_detection_nosql_spark.operators.etl import (
    ACTIVITY_LOG_ORACLE_SQL,
    activity_log,
)
from threat_detection_nosql_spark.operators.graph import (
    EDGE_TYPES,
    NODE_LABELS,
    edge_view,
    node_view,
)
from threat_detection_nosql_spark.sources.readers import load_table

_LOG_CTE = f"WITH log AS ({ACTIVITY_LOG_ORACLE_SQL})"


def graph_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 count verification, generalized: one row per node label
    (distinct keys — the dedup-dict cardinality) and per edge type
    (row count — multigraph multiplicity). Each count is an independent
    1-row aggregate; the union is 8 rows total, so this is 8 cheap
    scans of one column each, not a wide shuffle."""
    log = activity_log(spark, sf_dir)
    parts = []
    for label in sorted(NODE_LABELS):
        parts.append(node_view(log, label).agg(
            F.lit("node").alias("kind"), F.lit(label).alias("name"),
            F.count("*").alias("n")))
    for etype in sorted(EDGE_TYPES):
        parts.append(edge_view(log, etype).agg(
            F.lit("edge").alias("kind"), F.lit(etype).alias("name"),
            F.count("*").alias("n")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _graph_summary_sql() -> str:
    selects = []
    for label, key in sorted(NODE_LABELS.items()):
        selects.append(
            f"SELECT 'node' AS kind, '{label}' AS name, "
            f"CAST(count(DISTINCT {key}) AS BIGINT) AS n FROM log")
    for etype in sorted(EDGE_TYPES):
        selects.append(
            f"SELECT 'edge' AS kind, '{etype}' AS name, "
            f"CAST(count(*) AS BIGINT) AS n FROM log")
    return f"{_LOG_CTE} " + " UNION ALL ".join(selects)


def performs_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERFORMS edge table as the reference stores it: ISO-8601
    *string* timestamp (`timestamp.isoformat()`, `neo4j_setup.py:71` —
    F7) plus the temporal flags. Pure projection: no shuffle, columns
    prune to exactly the edge payload."""
    log = activity_log(spark, sf_dir)
    return (edge_view(log, "PERFORMS")
            .select("src", "dst",
                    F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss")
                     .alias("ts_iso"),
                    "hour_of_day", "is_after_hours", "is_weekend"))


_PERFORMS_SQL = f"""
{_LOG_CTE}
SELECT user AS src, activity AS dst,
       strftime(ts, '%Y-%m-%dT%H:%M:%S') AS ts_iso,
       hour_of_day, is_after_hours, is_weekend
FROM log
"""


QUERIES = {
    "graph_summary": graph_summary,
    "performs_edges": performs_edges,
}

ORACLES = {
    "graph_summary": _graph_summary_sql(),
    "performs_edges": _PERFORMS_SQL,
}


# ---------------------------------------------------------------------------
# Fixed-iteration PageRank over the user↔resource access graph
# ---------------------------------------------------------------------------

_PR_ITERS = 3
_PR_DAMP = 0.85


def pagerank_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 synchronous iterations, d=0.85) over the symmetric
    bipartite user↔resource access graph — 'which users/resources are
    structurally central', the graph-centrality question the
    reference's degree query (`neo4j_analysis.py:67-83`) approximates
    with local counts. Node ids are namespaced ('u:'/'r:') so the two
    key spaces can't collide. Deterministic → DuckDB oracle unrolls the
    same three iterations."""
    from threat_detection_nosql_spark.operators.graph import pagerank_fixed
    log = activity_log(spark, sf_dir).filter(F.col("resource").isNotNull())
    ur = (log.select(
        F.concat(F.lit("u:"), F.col("user")).alias("src"),
        F.concat(F.lit("r:"), F.col("resource")).alias("dst"))
        .distinct())
    edges = ur.unionByName(
        ur.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    ranks = pagerank_fixed(edges, n_iters=_PR_ITERS, damping=_PR_DAMP)
    return (ranks.select("node", F.round("rank", 6).alias("rank"))
            .orderBy(F.desc("rank"), F.asc("node"))
            .limit(20))


def _pagerank_sql() -> str:
    base = (1.0 - _PR_DAMP)
    prev = "r0"
    iters = []
    for i in range(1, _PR_ITERS + 1):
        iters.append(f"""
r{i} AS (SELECT nodes.node,
         ({base} / (SELECT n FROM nn))
           + {_PR_DAMP} * coalesce(c.s, 0.0) AS rank
         FROM nodes LEFT JOIN (
           SELECT e.dst AS node, sum({prev}.rank / deg.deg) AS s
           FROM e JOIN {prev} ON e.src = {prev}.node
                JOIN deg ON e.src = deg.src
           GROUP BY e.dst) c ON nodes.node = c.node)""")
        prev = f"r{i}"
    return f"""
{_LOG_CTE},
ur AS (SELECT DISTINCT 'u:' || user AS src, 'r:' || resource AS dst
       FROM log WHERE resource IS NOT NULL),
e AS (SELECT src, dst FROM ur UNION ALL SELECT dst, src FROM ur),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
nn AS (SELECT count(*) AS n FROM nodes),
deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
{",".join(iters)}
SELECT node, round(rank, 6) AS rank
FROM {prev}
ORDER BY rank DESC, node ASC
LIMIT 20
"""


QUERIES["pagerank_top20"] = pagerank_top20
ORACLES["pagerank_top20"] = _pagerank_sql()


# ---------------------------------------------------------------------------
# Triangle counting over the part co-purchase graph
# ---------------------------------------------------------------------------

def _copurchase_edges(spark: SparkSession, sf_dir: str,
                      materialize: bool = True,
                      keep_support: bool = False) -> DataFrame:
    """Pruned part co-purchase edge list (p1 < p2, support ≥ 2) shared
    by ``copurchase_triangles`` and ``link_prediction_top20``.

    Pair expansion is basket-style: ONE groupBy(order) building the
    sorted distinct-part basket (partial-aggregated collect_set), then
    the p1<p2 combinations unfold map-side from the array — no
    join-shuffle of the (order, part) table against itself. The
    support ≥ 2 prune is a map-combinable HAVING that cuts the
    near-complete one-co-occurrence graph to the meaningful core
    (~3.5k edges over 2k parts at sf0.1). ``materialize=True`` pins the
    pruned edges with an eager localCheckpoint so downstream consumers
    read the tiny materialized list instead of replaying the expansion.
    """
    li = load_table(spark, sf_dir, "lineitem")
    basket = (li.groupBy("l_orderkey")
              .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps")))
    # all p1 < p2 combinations inside the sorted basket, map-side
    pair_arr = F.flatten(F.transform(
        F.col("ps"),
        lambda x, i: F.transform(
            F.slice(F.col("ps"), i + F.lit(2), F.size(F.col("ps"))),
            lambda y: F.struct(x.alias("p1"), y.alias("p2")))))
    edges = (basket.select(F.explode(pair_arr).alias("pr"))
             .groupBy(F.col("pr.p1").alias("p1"),
                      F.col("pr.p2").alias("p2"))
             .agg(F.count("*").alias("support"))
             .filter(F.col("support") >= 2))
    if not keep_support:
        edges = edges.select("p1", "p2")
    if materialize:
        edges = edges.coalesce(8).localCheckpoint(eager=True)
    return edges


def copurchase_triangles(spark: SparkSession, sf_dir: str,
                         materialize: bool = True) -> DataFrame:
    """Global triangle count on the part co-purchase graph (parts are
    adjacent when some order contains both) — the classic heavy graph
    aggregate, as two self-joins over an ORIENTED edge list.

    Orientation (p1 < p2) makes every triangle appear exactly once as
    e(a,b), e(b,c), e(a,c) with a<b<c — no post-hoc dedup by 6
    permutations. The graph keeps only edges with co-purchase support
    ≥ 2 (the standard market-basket prune): the raw one-co-occurrence
    graph is noise and nearly complete (1.2M edges over 2k parts at
    sf0.1, blowing the wedge join to ~10⁹ rows), while the support
    filter is a map-combinable HAVING on the pair agg that cuts it to
    ~3.5k meaningful edges.

    Pair expansion is basket-style: ONE groupBy(order) building the
    sorted distinct-part basket (partial-aggregated collect_set), then
    the p1<p2 combinations unfold map-side from the array — no
    join-shuffle of the 600k-row (order, part) table against itself
    (measured ~25% faster end-to-end at sf0.1, identical edges).
    ``materialize=True`` (the registered path) then pins the pruned
    edge list with an eager localCheckpoint so the four downstream
    consumers (degree build ×2, orientation, edge count) read ~3.5k
    materialized rows instead of replaying the expansion whenever
    Catalyst fails to reuse the exchange; ``materialize=False`` keeps
    the full lineage for plan tests.

    The edge list is then DEGREE-ORIENTED (each edge points from its
    lower-(degree, id) endpoint to the higher one — a total order, so
    the orientation is acyclic and every triangle still appears exactly
    once, as u→v, u→w, v→w with u ≺ v ≺ w). Wedges are built only from
    a node's out-neighbors, and a node's out-degree under this
    orientation is O(√m), so the wedge join is bounded by O(m^1.5)
    regardless of hubs — the skew-proof shape for 100× the data, where
    an id-oriented wedge join melts down on the first hub node. The
    triangle/edge counts are orientation-invariant, so the exact-SQL
    oracle is unchanged. Scale shape: pair expansion bounded by
    lines-per-order², the degree join broadcasts (|nodes| rows), the
    wedge join shuffles on single part keys, the closing join on
    (v, w) pairs.
    """
    edges = _copurchase_edges(spark, sf_dir, materialize)
    deg, tri = _oriented_triangles(edges)
    return tri.agg(F.count("*").alias("n_triangles")).crossJoin(
        edges.agg(F.count("*").alias("n_edges")))


def _oriented_triangles(edges: DataFrame):
    """Shared degree-oriented triangle kernel (see copurchase_triangles
    docstring for the O(m^1.5) bound): returns the (node, deg) frame
    and the triangle frame with one row per triangle, node columns
    ``e1.src`` / ``e1.dk.n`` / ``e2.dk.n``."""
    deg = (edges.select(F.col("p1").alias("node"))
           .unionAll(edges.select(F.col("p2").alias("node")))
           .groupBy("node").agg(F.count("*").alias("deg")))
    ed = (edges
          .join(F.broadcast(deg.withColumnRenamed("node", "p1")
                            .withColumnRenamed("deg", "d1")), "p1")
          .join(F.broadcast(deg.withColumnRenamed("node", "p2")
                            .withColumnRenamed("deg", "d2")), "p2"))
    k1 = F.struct(F.col("d1").alias("d"), F.col("p1").alias("n"))
    k2 = F.struct(F.col("d2").alias("d"), F.col("p2").alias("n"))
    oriented = ed.select(
        F.when(k1 < k2, F.col("p1")).otherwise(F.col("p2")).alias("src"),
        F.when(k1 < k2, k2).otherwise(k1).alias("dk"))
    # dk = the (deg, id) key of the edge head: the wedge join orders the
    # two out-neighbors by it so each triangle closes exactly once
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    e3 = oriented.select(F.col("src").alias("v"),
                         F.col("dk.n").alias("w")).alias("e3")
    tri = (e1.join(e2, (F.col("e1.src") == F.col("e2.src"))
                   & (F.col("e1.dk") < F.col("e2.dk")))
           .join(e3, (F.col("e3.v") == F.col("e1.dk.n"))
                 & (F.col("e3.w") == F.col("e2.dk.n"))))
    return deg, tri


_TRIANGLES_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2
          FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                             AND a.l_partkey < b.l_partkey
          GROUP BY a.l_partkey, b.l_partkey
          HAVING count(*) >= 2)
SELECT (SELECT CAST(count(*) AS BIGINT)
        FROM edges e1
        JOIN edges e2 ON e1.p2 = e2.p1
        JOIN edges e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2) AS n_triangles,
       (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges
"""


QUERIES["copurchase_triangles"] = copurchase_triangles
ORACLES["copurchase_triangles"] = _TRIANGLES_SQL


# ---------------------------------------------------------------------------
# Link prediction over the part co-purchase graph
# ---------------------------------------------------------------------------

_LP_ADJ_CAP = 64


def link_prediction_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 NON-adjacent part pairs most likely to be co-purchased
    next, scored by the three classic neighborhood heuristics
    (Liben-Nowell & Kleinberg 2003 — public knowledge): common-neighbor
    count, Jaccard overlap |Γa∩Γc| / |Γa∪Γc|, and Adamic-Adar
    Σ_{b∈Γa∩Γc} 1/ln(deg b), which downweights promiscuous hubs.

    Rides the SAME pruned support≥2 edge list as
    ``copurchase_triangles`` (shared ``_copurchase_edges``, one
    localCheckpoint). Candidate (a,c) pairs are generated as wedges
    a–b–c the basket way: one groupBy(center) builds the sorted
    neighbor array, and the a<c combinations unfold map-side with the
    center's degree attached — per-center work is O(deg²) on a
    support-pruned graph whose degrees are bounded, so the expansion
    survives 100× data where a raw neighbor×neighbor self-join melts
    on hubs. The wedge aggregate (count + Σ1/ln deg) is
    map-combinable; degree lookups broadcast (|parts| rows); existing
    edges drop via a broadcast left-anti join. Every center of a wedge
    has deg ≥ 2, so ln(deg) > 0 — no divisor guard needed. The top-20
    cut orders by the ROUNDED Adamic-Adar (sum-order ulp ties collapse
    at 6 digits), then common count, then ids — deterministic across
    engines."""
    edges_s = _copurchase_edges(spark, sf_dir, keep_support=True)
    edges = edges_s.select("p1", "p2")
    nbr = (edges_s.select(F.col("p1").alias("node"),
                          F.col("p2").alias("nbr"), "support")
           .unionAll(edges_s.select(F.col("p2").alias("node"),
                                    F.col("p1").alias("nbr"), "support")))
    # Adjacency CAP: keep each center's _LP_ADJ_CAP strongest neighbors
    # (support DESC, id ASC — deterministic, oracle-replayable).  This
    # bounds per-center wedge work at O(K²) REGARDLESS of graph
    # density: the 10× soak drive showed a densified co-purchase graph
    # (max degree 222 vs 6 at sf0.1) inflating wedges 100,000×; the
    # support-prune alone is not a degree bound.  At the test SFs every
    # degree is below the cap, so results are unchanged and the oracle
    # replays the same (inactive) cap.
    ranked = F.array_sort(F.collect_list(
        F.struct((-F.col("support")).alias("negs"),
                 F.col("nbr").alias("nbr"))))
    adj = (nbr.groupBy("node").agg(ranked.alias("ranked"))
           .select("node",
                   F.array_sort(F.transform(
                       F.slice("ranked", 1, _LP_ADJ_CAP),
                       lambda x: x.nbr)).alias("ns")))
    pair_arr = F.flatten(F.transform(
        F.col("ns"),
        lambda x, i: F.transform(
            F.slice(F.col("ns"), i + F.lit(2), F.size(F.col("ns"))),
            lambda y: F.struct(x.alias("a"), y.alias("c")))))
    wedges = adj.select(F.size("ns").alias("deg_b"),
                        F.explode(pair_arr).alias("pr"))
    cand = (wedges.groupBy(F.col("pr.a").alias("a"),
                           F.col("pr.c").alias("c"))
            .agg(F.count("*").alias("common_neighbors"),
                 F.sum(F.lit(1.0) / F.log(F.col("deg_b"))).alias("aa")))
    deg = adj.select("node", F.size("ns").alias("deg"))
    cand = (cand
            .join(F.broadcast(deg.select(F.col("node").alias("a"),
                                         F.col("deg").alias("deg_a"))), "a")
            .join(F.broadcast(deg.select(F.col("node").alias("c"),
                                         F.col("deg").alias("deg_c"))), "c")
            .join(F.broadcast(edges),
                  (F.col("a") == F.col("p1")) & (F.col("c") == F.col("p2")),
                  "left_anti"))
    return (cand.select(
                F.col("a").alias("part_a"), F.col("c").alias("part_b"),
                "common_neighbors",
                F.round(F.col("aa"), 6).alias("adamic_adar"),
                F.round(F.col("common_neighbors") * 1.0
                        / (F.col("deg_a") + F.col("deg_c")
                           - F.col("common_neighbors")), 6).alias("jaccard"))
            .orderBy(F.desc("adamic_adar"), F.desc("common_neighbors"),
                     F.asc("part_a"), F.asc("part_b"))
            .limit(20))


_LINK_PRED_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2,
                 count(*) AS support
          FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                             AND a.l_partkey < b.l_partkey
          GROUP BY a.l_partkey, b.l_partkey
          HAVING count(*) >= 2),
nbr0 AS (SELECT p1 AS node, p2 AS nbr, support FROM edges
         UNION ALL
         SELECT p2 AS node, p1 AS nbr, support FROM edges),
nbr AS (SELECT node, nbr FROM (
          SELECT node, nbr,
                 row_number() OVER (PARTITION BY node
                      ORDER BY support DESC, nbr ASC) AS rk
          FROM nbr0) t WHERE rk <= 64),
deg AS (SELECT node, CAST(count(*) AS INT) AS deg FROM nbr GROUP BY node),
wedges AS (SELECT n1.nbr AS a, n2.nbr AS c, d.deg AS deg_b
           FROM nbr n1
           JOIN nbr n2 ON n1.node = n2.node AND n1.nbr < n2.nbr
           JOIN deg d ON d.node = n1.node),
cand AS (SELECT a, c,
                CAST(count(*) AS BIGINT) AS common_neighbors,
                sum(1.0 / ln(deg_b)) AS aa
         FROM wedges GROUP BY a, c)
SELECT cand.a AS part_a, cand.c AS part_b, common_neighbors,
       round(aa, 6) AS adamic_adar,
       round(common_neighbors * 1.0
             / (da.deg + dc.deg - common_neighbors), 6) AS jaccard
FROM cand
JOIN deg da ON da.node = cand.a
JOIN deg dc ON dc.node = cand.c
WHERE NOT EXISTS (SELECT 1 FROM edges
                  WHERE edges.p1 = cand.a AND edges.p2 = cand.c)
ORDER BY adamic_adar DESC, common_neighbors DESC, part_a ASC, part_b ASC
LIMIT 20
"""

QUERIES_TAIL = {"link_prediction_top20": link_prediction_top20}
ORACLES_TAIL = {"link_prediction_top20": _LINK_PRED_SQL}


# ---------------------------------------------------------------------------
# Community detection and k-core over the part co-purchase graph
# ---------------------------------------------------------------------------

_LPA_ITERS = 3
_KCORE_K = 3
_KCORE_ROUNDS = 6

_COPURCHASE_EDGES_SQL = """
li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS MATERIALIZED (SELECT a.l_partkey AS p1, b.l_partkey AS p2
          FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                             AND a.l_partkey < b.l_partkey
          GROUP BY a.l_partkey, b.l_partkey
          HAVING count(*) >= 2),
nbr AS MATERIALIZED (SELECT p1 AS node, p2 AS nbr FROM edges
        UNION ALL
        SELECT p2 AS node, p1 AS nbr FROM edges)"""


def copurchase_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community structure of the co-purchase graph by synchronous
    label propagation (operators/graph.label_propagation_fixed,
    3 rounds, modal-neighbor label with min-label tie-break — fully
    deterministic, no RNG), rolled up to one row per community with
    its size and smallest member. The complement to
    ``connected_components``: components answer reachability,
    communities answer density. All comparisons are integer
    (counts/ids) so the oracle — which unrolls the three rounds as
    chained CTEs — replays it exactly, no float rounding anywhere."""
    from threat_detection_nosql_spark.operators.graph import (
        label_propagation_fixed)
    edges = _copurchase_edges(spark, sf_dir).select(
        F.col("p1").alias("src"), F.col("p2").alias("dst"))
    labels = label_propagation_fixed(edges, n_iters=_LPA_ITERS)
    return (labels.groupBy("community")
            .agg(F.count("*").alias("n_members"),
                 F.min("node").alias("min_member"))
            .orderBy(F.desc("n_members"), F.asc("community")))


def _lpa_sql() -> str:
    prev = "l0"
    rounds = []
    for i in range(1, _LPA_ITERS + 1):
        rounds.append(f"""
i{i} AS (SELECT n.node, l.label, count(*) AS c
        FROM nbr n JOIN {prev} l ON l.node = n.nbr
        GROUP BY n.node, l.label),
l{i} AS MATERIALIZED (SELECT node, label FROM (
          SELECT node, label,
                 row_number() OVER (PARTITION BY node
                      ORDER BY c DESC, label ASC) AS rn
          FROM i{i}) t WHERE rn = 1)""")
        prev = f"l{i}"
    return f"""
WITH {_COPURCHASE_EDGES_SQL},
nodes AS (SELECT DISTINCT node FROM nbr),
l0 AS (SELECT node, node AS label FROM nodes),
{",".join(rounds)}
SELECT label AS community, CAST(count(*) AS BIGINT) AS n_members,
       min(node) AS min_member
FROM {prev}
GROUP BY label
ORDER BY n_members DESC, community ASC
"""


def kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {k}-core of the co-purchase graph (k=3, 6 peel rounds —
    operators/graph.kcore_fixed): parts that survive repeated removal
    of weakly-connected nodes, i.e. the densely co-purchased core that
    basket recommendations should anchor on. Returns each surviving
    part with its within-core degree; integer-only arithmetic, oracle
    unrolls the peel rounds as chained CTEs."""
    from threat_detection_nosql_spark.operators.graph import kcore_fixed
    edges = _copurchase_edges(spark, sf_dir).select(
        F.col("p1").alias("src"), F.col("p2").alias("dst"))
    return (kcore_fixed(edges, k=_KCORE_K, n_rounds=_KCORE_ROUNDS)
            .orderBy(F.asc("node")))


def _kcore_sql() -> str:
    prev = "c0"
    rounds = []
    for i in range(1, _KCORE_ROUNDS + 1):
        rounds.append(f"""
c{i} AS MATERIALIZED (SELECT n.node FROM nbr n
        JOIN {prev} a ON a.node = n.node
        JOIN {prev} b ON b.node = n.nbr
        GROUP BY n.node HAVING count(*) >= {_KCORE_K})""")
        prev = f"c{i}"
    return f"""
WITH {_COPURCHASE_EDGES_SQL},
c0 AS (SELECT DISTINCT node FROM nbr),
{",".join(rounds)}
SELECT n.node, CAST(count(*) AS BIGINT) AS core_degree
FROM nbr n
JOIN {prev} a ON a.node = n.node
JOIN {prev} b ON b.node = n.nbr
GROUP BY n.node HAVING count(*) >= {_KCORE_K}
ORDER BY n.node ASC
"""


QUERIES_TAIL["copurchase_communities"] = copurchase_communities
ORACLES_TAIL["copurchase_communities"] = _lpa_sql()
QUERIES_TAIL["kcore_parts"] = kcore_parts
ORACLES_TAIL["kcore_parts"] = _kcore_sql()


# ---------------------------------------------------------------------------
# Risk propagation: personalized PageRank from after-hours-heavy users
# ---------------------------------------------------------------------------

def risk_propagation_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 nodes by personalized PageRank
    (operators/graph.pagerank_personalized, 3 iterations, d=0.85)
    seeded on the after-hours-heavy users (after-hours events strictly
    outnumbering in-hours — an INTEGER predicate, so the seed set is
    bit-identical across engines). Rank here reads "graph proximity to
    risky actors": the resources they touch and the users sharing
    those resources surface first — the propagation step every insider-
    threat triage runs after flagging individuals
    (`neo4j_analysis.py`'s centrality theme, made seed-aware).

    Same scale silhouette as ``pagerank_top20`` (per-iteration
    edge⋈rank join, broadcast rank side, edge partitioning reused);
    the teleport vector is a semi/anti-join split of the node list
    against the broadcast seed set. Deterministic throughout — the
    oracle unrolls the same three iterations with the same teleport
    algebra."""
    from threat_detection_nosql_spark.operators.graph import (
        pagerank_personalized)
    log = activity_log(spark, sf_dir).filter(F.col("resource").isNotNull())
    ah = (log.groupBy("user")
          .agg(F.sum("is_after_hours").alias("ah"),
               F.count("*").alias("n")))
    seeds = (ah.filter(F.col("ah") * 2 > F.col("n"))
             .select(F.concat(F.lit("u:"), F.col("user")).alias("node")))
    ur = (log.select(
        F.concat(F.lit("u:"), F.col("user")).alias("src"),
        F.concat(F.lit("r:"), F.col("resource")).alias("dst"))
        .distinct())
    edges = ur.unionByName(
        ur.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    ranks = pagerank_personalized(edges, seeds, n_iters=_PR_ITERS,
                                  damping=_PR_DAMP)
    return (ranks.select("node", F.round("rank", 6).alias("rank"))
            .orderBy(F.desc("rank"), F.asc("node"))
            .limit(20))


def _ppr_sql() -> str:
    prev = "r0"
    iters = []
    for i in range(1, _PR_ITERS + 1):
        iters.append(f"""
r{i} AS MATERIALIZED (SELECT tp.node,
         (1.0 - {_PR_DAMP}) * tp.t
           + {_PR_DAMP} * coalesce(c.s, 0.0) AS rank
         FROM tp LEFT JOIN (
           SELECT e.dst AS node, sum({prev}.rank / deg.deg) AS s
           FROM e JOIN {prev} ON e.src = {prev}.node
                JOIN deg ON e.src = deg.src
           GROUP BY e.dst) c ON tp.node = c.node)""")
        prev = f"r{i}"
    return f"""
{_LOG_CTE},
lr AS MATERIALIZED (SELECT * FROM log WHERE resource IS NOT NULL),
seeds AS MATERIALIZED (
  SELECT 'u:' || user AS node
  FROM (SELECT user, sum(is_after_hours) AS ah, count(*) AS n
        FROM lr GROUP BY user) s
  WHERE ah * 2 > n),
ur AS MATERIALIZED (SELECT DISTINCT 'u:' || user AS src,
                           'r:' || resource AS dst FROM lr),
e AS MATERIALIZED (SELECT src, dst FROM ur
                   UNION ALL SELECT dst, src FROM ur),
nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
ns AS (SELECT count(*) AS k FROM seeds),
tp AS MATERIALIZED (
  SELECT nodes.node,
         CASE WHEN seeds.node IS NOT NULL
              THEN 1.0 / (SELECT k FROM ns) ELSE 0.0 END AS t
  FROM nodes LEFT JOIN seeds ON nodes.node = seeds.node),
deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM e GROUP BY src),
r0 AS (SELECT node, t AS rank FROM tp),
{",".join(iters)}
SELECT node, round(rank, 6) AS rank
FROM {prev}
ORDER BY rank DESC, node ASC
LIMIT 20
"""


QUERIES_TAIL["risk_propagation_top20"] = risk_propagation_top20
ORACLES_TAIL["risk_propagation_top20"] = _ppr_sql()


# ---------------------------------------------------------------------------
# Local clustering coefficient over the part co-purchase graph
# ---------------------------------------------------------------------------

def local_clustering_coefficient(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Top-20 parts by local clustering coefficient
    2·T(v) / (deg(v)·(deg(v)−1)) on the support-pruned co-purchase
    graph — the classic "how clique-like is this node's neighborhood"
    score (Watts & Strogatz 1998, public knowledge); a part with high
    coefficient sits inside a basket community, one with many
    triangles but low coefficient is a cross-community hub.

    Rides the SAME pruned edge list and degree-oriented triangle
    kernel as ``copurchase_triangles`` (shared ``_oriented_triangles``,
    one localCheckpoint, O(m^1.5) wedge bound): each closed triangle
    row unfolds its three corners map-side and one (node) hash agg
    counts per-node memberships; degrees broadcast back.  Nodes with
    deg ≥ 2 and zero triangles keep coefficient 0 via the left join so
    the top-20 cut is total-ordered (coefficient, triangles, node).
    The coefficient is one IEEE division of exact integers +
    the shared floor(x·1e6+0.5)/1e6 rounding — cross-engine exact."""
    edges = _copurchase_edges(spark, sf_dir)
    deg, tri = _oriented_triangles(edges)
    corners = tri.select(F.explode(F.array(
        F.col("e1.src"), F.col("e1.dk.n"), F.col("e2.dk.n"))).alias("node"))
    tcnt = corners.groupBy("node").agg(F.count("*").alias("triangles"))
    coeff = (F.floor(F.lit(2.0) * F.col("triangles")
                     / (F.col("deg") * (F.col("deg") - 1))
                     * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
    return (deg.join(tcnt, "node", "left")
            .na.fill({"triangles": 0})
            .filter(F.col("deg") >= 2)
            .select("node", "deg", "triangles",
                    coeff.alias("clustering_coeff"))
            .orderBy(F.desc("clustering_coeff"), F.desc("triangles"),
                     F.asc("node"))
            .limit(20))


_CLUSTERING_COEFF_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2
          FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                             AND a.l_partkey < b.l_partkey
          GROUP BY a.l_partkey, b.l_partkey
          HAVING count(*) >= 2),
tri AS (SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
        FROM edges e1
        JOIN edges e2 ON e1.p2 = e2.p1
        JOIN edges e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2),
corners AS (SELECT unnest([a, b, c]) AS node FROM tri),
tc AS (SELECT node, CAST(count(*) AS BIGINT) AS triangles
       FROM corners GROUP BY node),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
        FROM (SELECT p1 AS node FROM edges
              UNION ALL SELECT p2 FROM edges) u
        GROUP BY node)
SELECT node, deg, coalesce(triangles, 0) AS triangles,
       floor(CAST(2 AS DOUBLE) * coalesce(triangles, 0)
             / (deg * (deg - 1)) * 1e6 + 0.5) / 1e6 AS clustering_coeff
FROM deg LEFT JOIN tc USING (node)
WHERE deg >= 2
ORDER BY clustering_coeff DESC, triangles DESC, node ASC
LIMIT 20
"""


QUERIES_TAIL["local_clustering_coefficient"] = local_clustering_coefficient
ORACLES_TAIL["local_clustering_coefficient"] = _CLUSTERING_COEFF_SQL


# ---------------------------------------------------------------------------
# HyperBall: the neighborhood function N(t) by per-node HLL sketches
# ---------------------------------------------------------------------------

_HB_P = 4                    # 16 registers per node (each counts ONE ball)
_HB_M = 1 << _HB_P
_HB_ALPHA = 0.673            # the standard HLL alpha for m=16
_HB_ITERS = 2


def hyperball_reach_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood function of the user↔resource access graph (same
    symmetric bipartite edges as pagerank_top20): for each radius
    t = 0..2, the count of nodes plus the average and maximum
    estimated ball size |ball(v, t)|, from one 16-register HyperBall
    sketch per node (operators/graph.hyperball_registers). The
    reachability-growth profile — how fast the graph closes on itself —
    which at 100 TB is only askable by sketch: exact 2-hop reach is
    quadratic, HyperBall is one bounded shuffle per radius. Every
    register is portable md5 integer arithmetic, so the oracle replays
    rounds AND estimates bit-for-bit."""
    from threat_detection_nosql_spark.operators.graph import (
        hyperball_registers,
    )
    log = activity_log(spark, sf_dir).filter(F.col("resource").isNotNull())
    ur = (log.select(
        F.concat(F.lit("u:"), F.col("user")).alias("src"),
        F.concat(F.lit("r:"), F.col("resource")).alias("dst"))
        .distinct())
    edges = ur.unionByName(
        ur.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    m = float(_HB_M)
    amm = _HB_ALPHA * m * m
    rows = None
    for t, regs in enumerate(
            hyperball_registers(edges, n_iters=_HB_ITERS, p=_HB_P)):
        # per-NODE estimator (sketches.hll_portable_estimate is the
        # corpus-level one-row form; this stays inline because it is a
        # grouped column expression and its amm literal must match the
        # oracle's precomputed constant bit-for-bit)
        per = (regs.groupBy("node")
               .agg(F.count("*").alias("nn"),
                    F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("s_ne")))
        v = F.lit(m) - F.col("nn")
        e_raw = F.lit(amm) / (F.col("s_ne") + v)
        est = F.when((e_raw <= 2.5 * m) & (v > 0),
                     F.lit(m) * F.log(F.lit(m) / v)).otherwise(e_raw)
        one = (per.select(est.alias("est"))
               .agg(F.count("*").alias("n_nodes"),
                    F.round(F.avg("est"), 4).alias("avg_ball"),
                    F.round(F.max("est"), 4).alias("max_ball"))
               .select(F.lit(t).alias("t"), "n_nodes", "avg_ball",
                       "max_ball"))
        rows = one if rows is None else rows.unionByName(one)
    return rows


def _hyperball_sql() -> str:
    w_bits = 60 - _HB_P
    wmod = 1 << w_bits
    rmax = w_bits + 1
    m = float(_HB_M)
    amm = repr(_HB_ALPHA * m * m)
    ctes = [
        """ur AS (SELECT DISTINCT 'u:' || user AS src,
                        'r:' || resource AS dst
        FROM log WHERE resource IS NOT NULL)""",
        "e AS (SELECT src, dst FROM ur UNION ALL SELECT dst, src FROM ur)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        """h AS (SELECT node,
              CAST(('0x' || substr(md5(node), 1, 15)) AS BIGINT) AS x
       FROM nodes)""",
        f"""b0 AS (SELECT node, x // {wmod} AS idx,
              CASE WHEN x % {wmod} = 0 THEN {rmax}
                   ELSE {rmax} - length(bin(x % {wmod})) END AS r
       FROM h)""",
    ]
    for i in range(_HB_ITERS):
        ctes.append(f"""b{i + 1} AS (SELECT node, idx, max(r) AS r FROM (
  SELECT node, idx, r FROM b{i}
  UNION ALL
  SELECT e.src AS node, b.idx, b.r
  FROM e JOIN b{i} b ON e.dst = b.node) t
GROUP BY node, idx)""")
    for t in range(_HB_ITERS + 1):
        ctes.append(f"""est{t} AS (
  SELECT CASE WHEN {amm} / (s_ne + ({m} - nn)) <= {2.5 * m}
               AND ({m} - nn) > 0
              THEN {m} * ln({m} / ({m} - nn))
              ELSE {amm} / (s_ne + ({m} - nn)) END AS est
  FROM (SELECT node, count(*) AS nn, sum(power(2.0, -r)) AS s_ne
        FROM b{t} GROUP BY node) g)""")
    selects = [
        f"""SELECT {t} AS t, CAST(count(*) AS BIGINT) AS n_nodes,
       round(avg(est), 4) AS avg_ball, round(max(est), 4) AS max_ball
FROM est{t}""" for t in range(_HB_ITERS + 1)]
    return (f"{_LOG_CTE},\n" + ",\n".join(ctes) + "\n"
            + "\nUNION ALL\n".join(selects))


QUERIES_TAIL["hyperball_reach_report"] = hyperball_reach_report
ORACLES_TAIL["hyperball_reach_report"] = _hyperball_sql()
