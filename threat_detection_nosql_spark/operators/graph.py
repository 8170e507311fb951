"""Property-graph views over the fact table (SURVEY.md §1.2, S3, J1–J4).

The reference materializes a Neo4j multigraph row-by-row over Bolt
(`neo4j_setup.py:43-95`, ~5 round trips per row). Because every log row
produces exactly one edge of each of the four types, each edge table is a
column projection of the fact table and each node table is a distinct —
so the "graph load" costs nothing here: views are lazy projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# edge type -> (source column, destination column), mirroring
# neo4j_setup.py:70-90 (PERFORMS/ACCESSES/USES/INVOLVES).
EDGE_TYPES: dict[str, tuple[str, str]] = {
    "PERFORMS": ("user", "activity"),
    "ACCESSES": ("pc", "resource"),
    "USES": ("user", "pc"),
    "INVOLVES": ("activity", "resource"),
}

# node label -> key column (neo4j_setup.py:46-66)
NODE_LABELS: dict[str, str] = {
    "User": "user",
    "System": "pc",
    "Activity": "activity",
    "Resource": "resource",
}


def edge_view(log: DataFrame, edge_type: str) -> DataFrame:
    """One edge table = projection of the fact table, keeping the edge
    properties the reference attaches (`neo4j_setup.py:70-75`: PERFORMS
    carries the temporal flags; the other three carry only timestamp).
    Multigraph semantics: one row per log row, duplicates preserved.
    """
    src, dst = EDGE_TYPES[edge_type]
    props = (["ts", "hour_of_day", "is_after_hours", "is_weekend"]
             if edge_type == "PERFORMS" else ["ts"])
    return log.select(F.col(src).alias("src"), F.col(dst).alias("dst"), *props)


def node_view(log: DataFrame, label: str) -> DataFrame:
    """Node table = distinct key values (the client-side dedup dicts of
    `neo4j_setup.py:36-39`, expressed as a hash-distinct)."""
    key = NODE_LABELS[label]
    type_prop = {"User": "employee", "System": "workstation",
                 "Resource": "file"}.get(label)
    out = log.select(F.col(key).alias("name")).distinct()
    if type_prop:
        out = out.withColumn("type", F.lit(type_prop))
    return out


def user_degree(log: DataFrame) -> DataFrame:
    """Degree centrality per user (A12, `neo4j_analysis.py:67-83`):
    count of edges incident to the User node across all edge types.

    Users appear as source of PERFORMS and USES and never as destination,
    so degree = out-degree. Implemented generically as a union of
    endpoint projections → one hash agg (J4/U1): survives schema changes
    where users gain inbound edges.
    """
    endpoints = None
    for etype, (src, dst) in EDGE_TYPES.items():
        for col in (src, dst):
            if col == "user":
                proj = log.select(F.col("user"))
                endpoints = proj if endpoints is None \
                    else endpoints.unionByName(proj)
    return endpoints.groupBy("user").agg(F.count("*").alias("degree"))


def pagerank_fixed(edges: DataFrame, n_iters: int = 3,
                   damping: float = 0.85) -> DataFrame:
    """Synchronous PageRank for a FIXED iteration count over distinct
    directed ``(src, dst)`` edges — deterministic (uniform init, no
    convergence test), so a SQL oracle can replay it by unrolling the
    loop. Callers guarantee every node has out-degree ≥ 1 (symmetric
    edge sets do); dangling-mass redistribution is then unnecessary.

    Scale shape: each iteration is one equi-join of the edge list with
    the |nodes|-sized rank table plus a map-combined sum — the classic
    iterative-join PageRank. The rank side is orders of magnitude
    smaller than the edges; Spark broadcasts it automatically when it
    fits, and the edge list itself never re-shuffles (its partitioning
    on src is reused across iterations).
    """
    # lazy pin: the count() below is the first action, so the node
    # list materializes and pins inside that single driver job instead
    # of paying an eager-checkpoint job plus the count job
    nodes = (edges.select(F.col("src").alias("node"))
             .unionByName(edges.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=False))
    n = nodes.count()
    out_deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # pre-divide: contributions need rank/deg; attaching deg once to
    # the edge list keeps the per-iteration join single-key. Both
    # loop-invariant frames (node list, degree-attached edges) are
    # pinned: every iteration joins them, and unpinned each join
    # replayed the graph-projection lineage (distinct over the fact
    # scan) once per round — guide §2.4/§5, same rationale as the
    # teleport pin in pagerank_personalized
    e = edges.join(out_deg, "src").localCheckpoint(eager=False)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(n_iters):
        contrib = (e.join(ranks, e["src"] == ranks["node"])
                   .select(F.col("dst").alias("node"),
                           (F.col("rank") / F.col("deg")).alias("c")))
        summed = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (nodes.join(summed, "node", "left")
                 .select("node",
                         (F.lit((1.0 - damping) / n)
                          + F.lit(damping) * F.coalesce("s", F.lit(0.0)))
                         .alias("rank")))
    return ranks


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst",
                         max_iter: int = 8) -> DataFrame:
    """Connected components, hybrid min-label / star-contraction
    (round 9 — VERDICT r8 asked for the diameter-proof algorithm as
    the default). Returns (node, component) for every node incident to
    an edge; component = the smallest node id reachable (deterministic
    for any orderable id type).

    Phase 1 — min-label propagation, up to ``max_iter`` passes: every
    node starts labeled with itself; each pass takes the min of its
    own label and its neighbors' labels. Passes needed = component
    diameter — for the shallow graphs the dedup and DBSCAN callers
    produce (near-dup cliques, density blobs) that is single digits,
    and each pass is cheaper than an alternating-star round (one join
    + group-min vs two phases).

    Phase 2 — if the labels are still moving after ``max_iter``
    passes, the graph is deep (chains, long filaments): CONTRACT it by
    the current labels (edge (u,v) -> (label(u), label(v)), loops
    dropped) and finish with :func:`connected_components_star`, which
    converges in O(log n) alternating rounds regardless of diameter.
    Contraction preserves components (label(u) is always a node
    reachable from u), and the component minimum survives it (the
    global min of a component keeps itself as label), so the output
    is identical to running either algorithm alone — the r8 oracle
    hashes don't move. The former behavior here was a loud
    RuntimeError pointing at the star variant; the handoff replaces
    the error with the answer.

    Scale shape: edges are symmetrized once and localCheckpoint-pinned;
    each pass is one shuffle join on node id + a group-min — the same
    partitioning every pass, so AQE reuses the exchange layout. Driver
    traffic per pass is a single converged-count. The contracted graph
    handed to star is no larger than the input edge set and typically
    far smaller (every converged region collapses to a point)."""
    sym = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .union(edges.select(F.col(dst).alias("u"),
                               F.col(src).alias("v")))
           .filter(F.col("u") != F.col("v"))
           .distinct().localCheckpoint())
    labels = (sym.select(F.col("u").alias("node"))
              .distinct()
              .select("node", F.col("node").alias("component")))
    if max_iter <= 0:
        labels = labels.localCheckpoint()
    for _ in range(max_iter):
        nbr_min = (sym
                   .join(labels.withColumnRenamed("node", "v")
                         .withColumnRenamed("component", "nbr_label"),
                         "v")
                   .groupBy("u").agg(F.min("nbr_label").alias("nbr_min")))
        new_labels = (labels
                      .join(nbr_min, F.col("node") == F.col("u"), "left")
                      .select("node",
                              F.least("component",
                                      F.coalesce("nbr_min", "component"))
                              .alias("component"))
                      .localCheckpoint())
        changed = (new_labels
                   .join(labels.withColumnRenamed("component", "old"),
                         "node")
                   .filter(F.col("component") != F.col("old")).count())
        labels = new_labels
        if changed == 0:
            return labels
    # Still moving after max_iter passes (or max_iter <= 0): contract
    # by current labels and let alternating-star finish in O(log n)
    # rounds. coalesce covers label-groups whose component is already
    # fully converged (they contract to an isolated point star never
    # sees).
    lu = (labels.withColumnRenamed("node", "u")
          .withColumnRenamed("component", "lu"))
    lv = (labels.withColumnRenamed("node", "v")
          .withColumnRenamed("component", "lv"))
    contracted = (sym.join(lu, "u").join(lv, "v")
                  .select("lu", "lv")
                  .filter(F.col("lu") != F.col("lv")))
    roots = (connected_components_star(contracted, "lu", "lv")
             .withColumnRenamed("node", "lbl")
             .withColumnRenamed("component", "root"))
    return (labels.join(roots, F.col("component") == F.col("lbl"), "left")
            .select("node",
                    F.coalesce("root", "component").alias("component")))


def connected_components_star(edges: DataFrame, src: str = "src",
                              dst: str = "dst",
                              max_iter: int = 40) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond"):
    converges in O(log n) ALTERNATING rounds regardless of component
    diameter — the scale-safe alternative to min-label propagation,
    whose round count is the diameter (pathological on chain graphs).
    Same output contract as :func:`connected_components`: (node,
    component = smallest reachable id) for every edge-incident node.

    Per round:

    - large-star: over the SYMMETRIZED edges, every neighbor LARGER
      than its center re-attaches to the center's minimum (strictly
      shrinks large labels without disconnecting anything);
    - small-star: edges oriented big->small; each big end and all its
      (smaller) neighbors attach to the smallest of them (flattens
      local chains into stars).

    At the fixpoint the edge set is exactly {(node, root)}. Each phase
    is one groupBy + one join; the convergence probe is two
    limit-1-count exceptAll checks — bounded driver traffic."""
    init = (edges.select(F.least(src, dst).alias("a"),
                         F.greatest(src, dst).alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct().localCheckpoint())
    nodes = (init.select(F.col("a").alias("node"))
             .union(init.select(F.col("b").alias("node")))
             .distinct().localCheckpoint())
    e = init
    for _ in range(max_iter):
        # ---- large-star over the symmetrized view
        sym = e.union(e.select(F.col("b").alias("a"),
                               F.col("a").alias("b")))
        mins = (sym.groupBy("a").agg(F.min("b").alias("mv"))
                .select("a", F.least("mv", F.col("a")).alias("m")))
        ls = (sym.join(mins, "a")
              .filter(F.col("b") > F.col("a"))
              .select(F.col("b").alias("a"), F.col("m").alias("b"))
              .filter(F.col("a") != F.col("b"))
              .distinct())
        # ---- small-star: orient big -> small, attach the big end and
        # every smaller neighbor to the smallest neighbor
        d = (ls.select(F.greatest("a", "b").alias("u"),
                       F.least("a", "b").alias("v"))
             .distinct())
        mins2 = d.groupBy("u").agg(F.min("v").alias("m"))
        ss = (d.join(mins2, "u")
              .select(F.explode(F.array(
                  F.struct(F.col("v").alias("x"), F.col("m").alias("y")),
                  F.struct(F.col("u").alias("x"), F.col("m").alias("y"))))
                  .alias("ed"))
              .select(F.least("ed.x", "ed.y").alias("a"),
                      F.greatest("ed.x", "ed.y").alias("b"))
              .filter(F.col("a") != F.col("b"))
              .distinct().localCheckpoint())
        changed = (ss.exceptAll(e).limit(1).count()
                   + e.exceptAll(ss).limit(1).count())
        e = ss
        if changed == 0:
            break
    labels = (e.groupBy("b").agg(F.min("a").alias("component"))
              .select(F.col("b").alias("node"), "component"))
    # roots (and nodes whose component collapsed onto them) label
    # themselves
    return (nodes.join(labels, "node", "left")
            .select("node", F.coalesce("component", "node")
                    .alias("component")))


def label_propagation_fixed(edges: DataFrame, n_iters: int = 3) -> DataFrame:
    """Synchronous label-propagation community detection for a FIXED
    iteration count over undirected ``(src, dst)`` edges (Raghavan et
    al. 2007 — public knowledge). Every node starts labeled with its
    own id; each round it adopts the modal label among its neighbors,
    ties broken to the SMALLEST label — fully deterministic (no RNG, no
    asynchronous order dependence), so a SQL oracle can replay it by
    unrolling the rounds.

    Scale shape per round: one equi-join of the symmetric adjacency
    list with the |nodes|-sized label table (label side broadcasts
    while it fits), one map-combinable (node, label) count, one
    per-node window argmax — the same iterative-join silhouette as
    :func:`pagerank_fixed`, with the adjacency list's partitioning
    reused across rounds.
    """
    nbr = (edges.select(F.col("src").alias("node"),
                        F.col("dst").alias("nbr"))
           .unionAll(edges.select(F.col("dst").alias("node"),
                                  F.col("src").alias("nbr")))
           # loop-invariant adjacency: pinned so each round's join
           # reads it instead of replaying the caller's edge build
           # (e.g. the co-purchase self-join) once per round
           .localCheckpoint(eager=False))
    labels = (nbr.select("node").distinct()
              .withColumn("label", F.col("node")))
    w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(n_iters):
        cnt = (nbr.join(labels.select(F.col("node").alias("nbr"),
                                      "label"), "nbr")
               .groupBy("node", "label").agg(F.count("*").alias("c")))
        labels = (cnt.withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") == 1)
                  .select("node", "label"))
    return labels.select("node", F.col("label").alias("community"))


def kcore_fixed(edges: DataFrame, k: int = 2,
                n_rounds: int = 6) -> DataFrame:
    """K-core peel for a FIXED round count over undirected ``(src,
    dst)`` edges: each round drops every node whose degree within the
    surviving subgraph is < k. A fixed round budget (instead of
    peel-to-fixpoint) keeps the operator deterministic AND
    oracle-unrollable; on support-pruned analytics graphs the peel
    stabilizes within a few rounds, and the round count is a dial.

    Returns the surviving nodes with their within-core degree. Scale
    shape per round: two semi-joins of the edge list against the
    shrinking survivor set (survivors broadcast — |nodes| rows) and one
    map-combinable degree count; the edge list never re-shuffles.
    """
    nbr = (edges.select(F.col("src").alias("node"),
                        F.col("dst").alias("nbr"))
           .unionAll(edges.select(F.col("dst").alias("node"),
                                  F.col("src").alias("nbr")))
           # loop-invariant adjacency, consumed by TWO joins per peel
           # round: pinned for the same reason as `alive` below
           .localCheckpoint(eager=False))
    alive = nbr.select("node").distinct()
    for _ in range(n_rounds):
        deg = (nbr.join(F.broadcast(alive), "node")
               .join(F.broadcast(alive.select(F.col("node").alias("nbr"))),
                     "nbr")
               .groupBy("node").agg(F.count("*").alias("core_degree")))
        # `alive` feeds TWO joins next round; pin it (tiny — ≤|nodes|
        # rows) so the logical plan stays linear instead of doubling
        # per round
        alive = (deg.filter(F.col("core_degree") >= k).select("node")
                 .localCheckpoint(eager=False))
    deg = (nbr.join(F.broadcast(alive), "node")
           .join(F.broadcast(alive.select(F.col("node").alias("nbr"))),
                 "nbr")
           .groupBy("node").agg(F.count("*").alias("core_degree")))
    return deg.filter(F.col("core_degree") >= k)


def pagerank_personalized(edges: DataFrame, seeds: DataFrame,
                          n_iters: int = 3,
                          damping: float = 0.85) -> DataFrame:
    """Personalized PageRank for a FIXED iteration count: the teleport
    mass returns to a SEED set instead of the uniform vector, so rank
    measures proximity to the seeds (Jeh & Widom 2003 — public
    knowledge). Deterministic (seed-uniform init = the teleport
    vector, no convergence test) → SQL-unrollable like
    :func:`pagerank_fixed`, whose per-iteration join shape it shares.
    ``seeds`` is a 1-column (node) frame; callers guarantee every node
    has out-degree ≥ 1 (symmetric edge sets do)."""
    nodes = (edges.select(F.col("src").alias("node"))
             .unionByName(edges.select(F.col("dst").alias("node")))
             .distinct())
    n_seeds = seeds.count()
    if n_seeds == 0:
        raise ValueError("pagerank_personalized: empty seed set "
                         "(teleport vector undefined)")
    # pin the teleport vector: every iteration joins it, and without
    # pinning each join replays the node-list build (graph projection +
    # distinct) — measured 16 s -> 3 s at sf0.01
    teleport = (nodes.join(F.broadcast(seeds), "node", "left_semi")
                .withColumn("t", F.lit(1.0 / n_seeds))
                .unionByName(
                    nodes.join(F.broadcast(seeds), "node", "left_anti")
                    .withColumn("t", F.lit(0.0)))
                .localCheckpoint(eager=False))
    out_deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # loop-invariant like the teleport vector above: pinned so the
    # per-iteration contrib join reads the degree-attached edge list
    # instead of replaying the graph projection every round
    e = edges.join(out_deg, "src").localCheckpoint(eager=False)
    ranks = teleport.select("node", F.col("t").alias("rank"))
    for _ in range(n_iters):
        contrib = (e.join(ranks, e["src"] == ranks["node"])
                   .select(F.col("dst").alias("node"),
                           (F.col("rank") / F.col("deg")).alias("c")))
        summed = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (teleport.join(summed, "node", "left")
                 .select("node",
                         ((1.0 - damping) * F.col("t")
                          + damping * F.coalesce("s", F.lit(0.0)))
                         .alias("rank")))
    return ranks


def hyperball_registers(edges: DataFrame, n_iters: int = 2,
                        p: int = 4) -> list[DataFrame]:
    """HyperBall (Boldi/Vigna): the neighborhood function N(v, t) =
    |ball(v, t)| estimated by one tiny HLL sketch per node, grown one
    hop per round — registers for t+1 = element-wise max of v's own
    registers and its neighbors'. Returns the LONG-FORM register
    table [(node, idx, r)] per radius t = 0..n_iters.

    This is THE way to ask "how big is everyone's k-hop neighborhood"
    at 100 TB: exact 2-hop reach is a quadratic explosion, while each
    HyperBall round is one (edges ⋈ registers) shuffle bounded by
    |nodes|·2^p rows, map-combined max — the register derivation is
    the SHARED sketches.hll_register_cols (portable 60-bit md5 hash,
    integer div/mod/bin-length), so a SQL oracle replays every round
    bit-for-bit. p stays small (16 registers) because each sketch
    counts ONE ball, not the corpus.
    """
    from threat_detection_nosql_spark.operators.sketches import (
        hll_register_cols,
    )
    # the edge list is loop-invariant and each radius' register table
    # is consumed TWICE (the next round's grow join + the caller's
    # per-radius estimator) — pin both, or every consumer replays the
    # whole earlier-radius lineage (guide §2.4/§5; |nodes|·2^p rows)
    edges = edges.localCheckpoint(eager=False)
    nodes = (edges.select(F.col("src").alias("node"))
             .unionByName(edges.select(F.col("dst").alias("node")))
             .distinct())
    idx, rho = hll_register_cols(F.col("node"), p=p)
    regs = (nodes.select("node", idx.alias("idx"), rho.alias("r"))
            .localCheckpoint(eager=False))
    out = [regs]
    for _ in range(n_iters):
        contrib = (edges.join(regs.withColumnRenamed("node", "dst"),
                              "dst")
                   .select(F.col("src").alias("node"), "idx", "r"))
        regs = (regs.unionByName(contrib)
                .groupBy("node", "idx").agg(F.max("r").alias("r"))
                .localCheckpoint(eager=False))
        out.append(regs)
    return out
