"""Iterative graph operators: connected components for duplicate-group
resolution (north-star surface; the reference has no notion of dedup).

Near-dup pairs (LSH→Jaccard, simhash, embedding-cosine) are EDGES; turning
them into duplicate GROUPS — every doc labeled with its group representative
— is transitive closure, the one step of the dedup pipeline the DataFrame
API cannot express in a single plan.

Strategy is SIZE-ADAPTIVE, the same idea as Spark's broadcast-join
threshold: the edge set is materialized (it feeds every round anyway), and
its now-known count picks the plan —

- ``|E| ≤ driver_max_edges``: union-find on the driver. Verified near-dup
  pairs are RARE relative to the corpus (the expensive part of dedup is
  finding them, not clustering them): even a corpus with 10⁸ duplicate
  docs yields edges that fit comfortably in driver memory after the
  hot-bucket star reduction, and a microsecond-per-edge DSU beats any
  sequence of distributed rounds by 100×. This is a bounded collect —
  the threshold caps it exactly like autoBroadcastJoinThreshold caps a
  broadcast.
- larger: driver-coordinated min-label propagation. Each round every node
  takes the minimum label among itself and its neighbors (one join + one
  aggregate, both shuffle-partitioned on the node id), until a round
  changes nothing. Convergence detection is FUSED into the round: the
  new-label select carries a ``_chg`` flag and the round's single action
  is an aggregate over the persisted new labels — one Spark job per
  round, no separate old-vs-new comparison join.

Scale notes: distributed rounds needed = graph diameter. Near-dup graphs
are unions of near-cliques (docs sharing LSH buckets), so diameter is tiny
(2-4) and the loop runs a handful of rounds regardless of corpus size. For
adversarial long-chain graphs, ``star_components`` implements the
literature's alternating large-star/small-star contraction (Kiveris et
al., "Connected Components in MapReduce and Beyond"): edge-set rewrites
that halve long paths each alternation — O(log n) rounds with the same
per-round groupBy+join shape. ``connected_components`` escalates to it
automatically when label propagation hasn't converged within the expected
near-clique diameter, so pathological inputs degrade to the O(log n) path
instead of failing. Each round persists its result and unpersists the
previous one, so lineage stays one round deep.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

#: edge-count ceiling for the driver-side union-find fast path. 1M edges of
#: two 64-bit ids ≈ 16 MB collected — same order as a default broadcast
#: join's build side. Set to 0 to force the distributed loop.
DRIVER_MAX_EDGES = 1_000_000

#: label-propagation round budget before escalating to star contraction:
#: near-dup graphs (near-cliques) converge in 2-4 rounds, so anything
#: still moving after 8 has long paths and belongs on the O(log n) path
LABEL_PROP_MAX_ROUNDS = 8


def _driver_union_find(edge_rows) -> list[tuple]:
    """Union-find with path halving; group_rep = component min id."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edge_rows:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # attach the larger root under the smaller → root IS the min id
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return [(n, find(n)) for n in parent]


def _canon_edges(df: DataFrame, x: str, y: str) -> DataFrame:
    """(a, b) with a < b, no self loops, distinct — the canonical
    undirected edge set every star round starts from."""
    return (df.select(F.least(x, y).alias("a"), F.greatest(x, y).alias("b"))
            .filter(F.col("a") != F.col("b")).distinct())


def star_components(pairs: DataFrame, id_a: str = "id_a",
                    id_b: str = "id_b",
                    max_iter: int = 40) -> DataFrame:
    """(node, group_rep) via alternating large-star/small-star contraction
    (Kiveris et al.) — O(log n) rounds on ANY graph shape, including the
    long chains that defeat per-hop label propagation.

    Each round is two edge-set rewrites, both one groupBy + one join over
    the symmetrized edges:

    - large-star: every node's LARGER neighbors re-attach to the minimum
      of its closed neighborhood;
    - small-star: every node and its smaller neighbors re-attach to its
      minimum smaller neighbor.

    Both preserve connectivity; stars (every node edged to its component
    min) are the joint fixed point, detected with one exceptAll probe per
    round. The final edge set IS the labeling — it stays persisted (and
    already materialized by the convergence probe) so the returned frame
    never recomputes the round chain."""
    # nodes appearing ONLY in self pairs have no canonical edge and would
    # vanish from the contraction — carry them through as their own
    # component, matching what driver union-find and label propagation
    # emit (the output node set must not depend on which strategy ran)
    non_self = pairs.filter(F.col(id_a) != F.col(id_b))
    edge_nodes = (non_self.select(F.col(id_a).alias("node"))
                  .union(non_self.select(F.col(id_b).alias("node")))
                  .distinct())
    self_only = (pairs.filter(F.col(id_a) == F.col(id_b))
                 .select(F.col(id_a).alias("node")).distinct()
                 .join(edge_nodes, on="node", how="left_anti")
                 .select("node", F.col("node").alias("group_rep")))
    cur = _canon_edges(pairs, id_a, id_b).persist()
    try:
        cur_n = cur.count()
        for _ in range(max_iter):
            sym = cur.union(cur.select(F.col("b").alias("a"),
                                       F.col("a").alias("b")))
            # large-star: m = min(N(a) ∪ {a}); larger neighbors → m
            mins = (sym.groupBy("a").agg(F.min("b").alias("mn"))
                    .select("a", F.least("a", "mn").alias("m")))
            large = (sym.filter(F.col("b") > F.col("a"))
                     .join(mins, on="a")
                     .select(F.col("b").alias("x"), F.col("m").alias("y")))
            mid = _canon_edges(large, "x", "y")

            sym2 = mid.union(mid.select(F.col("b").alias("a"),
                                        F.col("a").alias("b")))
            # small-star: m = min smaller neighbor; smaller neighbors and
            # the node itself → m
            smaller = sym2.filter(F.col("b") < F.col("a"))
            mins2 = smaller.groupBy("a").agg(F.min("b").alias("m"))
            small = (smaller.join(mins2, on="a")
                     .select(F.col("b").alias("x"), F.col("m").alias("y"))
                     .union(mins2.select(F.col("a").alias("x"),
                                         F.col("m").alias("y"))))
            nxt = _canon_edges(small, "x", "y").persist()
            # set equality needs BOTH probes: equal counts rule out pure
            # shrinkage, the difference probe rules out replacement.
            # Both frames are distinct (_canon_edges), so a left-anti
            # join IS set difference — same decision as the former
            # exceptAll at a fraction of its sort-based plan
            nxt_n = nxt.count()
            changed = (nxt_n != cur_n
                       or nxt.join(cur, on=["a", "b"], how="left_anti")
                       .limit(1).count() > 0)
            cur.unpersist()
            cur, cur_n = nxt, nxt_n
            if not changed:
                # converged: every edge is (root=a, node=b)
                roots = cur.select(F.col("a")).distinct() \
                           .select(F.col("a").alias("node"),
                                   F.col("a").alias("group_rep"))
                return (cur.select(F.col("b").alias("node"),
                                   F.col("a").alias("group_rep"))
                        .union(roots)
                        .union(self_only))
    except Exception:
        cur.unpersist()
        raise
    cur.unpersist()
    raise RuntimeError(
        f"star_components did not converge in {max_iter} rounds")


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b",
                         max_iter: int = 25,
                         driver_max_edges: int = DRIVER_MAX_EDGES) -> DataFrame:
    """(node, group_rep) for every node appearing in ``pairs``; group_rep
    is the component's minimum id — the same deterministic survivor rule
    as exact_dedup. Small edge sets (≤ ``driver_max_edges``) resolve via
    driver-side union-find; larger ones via iterative min-label
    propagation (near-dup graphs converge in ~diameter rounds). If label
    propagation hasn't converged within ``LABEL_PROP_MAX_ROUNDS`` the
    graph is not near-clique-shaped and per-hop propagation would need
    diameter rounds — escalate to ``star_components`` (O(log n) rounds)
    for the remaining budget."""
    from pyspark.sql.types import StructField, StructType

    spark = pairs.sparkSession
    node_type = pairs.schema[id_a].dataType
    out_schema = StructType([StructField("node", node_type),
                             StructField("group_rep", node_type)])
    raw = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")) \
               .persist()
    edges = None
    try:
        # ONE bounded action decides the strategy AND feeds the fast path:
        # limit(threshold+1) returns every edge iff there are ≤ threshold,
        # so a small graph pays a single evaluation of the pair pipeline —
        # no separate count, no symmetrize/distinct shuffle (union-find
        # needs neither)
        head = raw.limit(driver_max_edges + 1).collect()
        if len(head) <= driver_max_edges:
            rows = [(r[0], r[1]) for r in head]
            return spark.createDataFrame(_driver_union_find(rows), out_schema)

        edges = (raw.union(raw.select(F.col("dst").alias("src"),
                                      F.col("src").alias("dst")))
                 .distinct().persist())
        labels = (edges.select(F.col("src").alias("node")).distinct()
                  .withColumn("rep", F.col("node")).persist())
        for _ in range(min(max_iter, LABEL_PROP_MAX_ROUNDS)):
            cur = labels.select("node", "rep")
            nbr_min = (edges.join(cur, edges.src == cur.node)
                       .groupBy(F.col("dst").alias("node"))
                       .agg(F.min("rep").alias("nbr_rep")))
            # one select computes BOTH the new label and the changed flag —
            # convergence costs no extra join and no extra job
            new_labels = (cur.join(nbr_min, on="node", how="left")
                          .select("node",
                                  F.least(F.col("rep"),
                                          F.coalesce("nbr_rep", "rep"))
                                   .alias("rep"),
                                  (F.coalesce("nbr_rep", F.col("rep"))
                                   < F.col("rep")).cast("int").alias("_chg"))
                          .persist())
            changed = new_labels.agg(F.sum("_chg")).first()[0] or 0
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                return labels.select("node", F.col("rep").alias("group_rep"))
        # still moving after the near-clique budget: the graph has long
        # paths, where per-hop propagation needs diameter rounds — restart
        # on the O(log n) star-contraction path (the handful of spent label
        # rounds is a bounded constant)
        labels.unpersist()
        return star_components(raw, "src", "dst", max_iter=max_iter)
    finally:
        raw.unpersist()
        if edges is not None:
            edges.unpersist()


# ------------------------------------------------------------ PageRank

PR_DAMPING = 0.85
PR_ITERS = 10

#: broadcast the |V|-bounded per-iteration score frame into the edge
#: join when the node count is at most this (≈64 MB of (node, score)
#: rows — well inside the guide's broadcast comfort zone). Checkpointed
#: frames are RDD-backed and carry NO size statistics, so without the
#: hint the planner sort-merge-joins the full edge frame against 1e3
#: score rows EVERY iteration; above the gate the shuffle join IS the
#: scale plan (broadcasting a 1e9-node rank vector is the classic
#: driver/executor OOM), so the gate rides the exact node count the
#: operator already holds. Value contract across the gate: for
#: integer-vote LPA the two plans are provably value-identical; for the
#: float-scored operators (pagerank/ppr/hits) the join strategy can
#: reorder rows feeding a double partial sum, so the guarantee is
#: "identical up to float-sum ordering, absorbed by the terminal 6-dp
#: round" (the family's documented contract), not bit identity of the
#: unrounded doubles.
SCORE_BROADCAST_MAX_NODES = 4_000_000


def _require_weights(edges: DataFrame, weight: str, op: str,
                     allow_zero: bool = False) -> None:
    """Validate the edge-weight precondition with ONE cheap two-scalar
    aggregate (min + null count) before any iteration runs. Without
    this, a node whose weights sum to 0 gets out_deg = 0 (non-NULL, so
    it is NOT treated as dangling) and pr·w/out_deg becomes
    Infinity/NaN, silently corrupting every rank — fail loudly
    instead. NULL weights are equally poisonous (SUM skips them, so a
    node's out-strength understates its out-edges) and are rejected
    too. ``allow_zero`` relaxes to the min-plus precondition
    (non-negative), where zero-weight edges are harmless."""
    [row] = edges.agg(
        F.min(F.col(weight)).alias("mn"),
        F.sum(F.when(F.col(weight).isNull(), 1).otherwise(0))
        .alias("nulls")).collect()
    if row["nulls"] and int(row["nulls"]) > 0:
        raise ValueError(f"{op}: weight column {weight!r} contains "
                         f"{int(row['nulls'])} NULL value(s)")
    mn = row["mn"]
    if mn is None:            # no edges at all — nothing to corrupt
        return
    if (mn < 0) if allow_zero else (mn <= 0):
        bound = "non-negative" if allow_zero else "positive"
        raise ValueError(f"{op}: weights must be {bound}, "
                         f"min({weight}) = {mn}")


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iters: int = PR_ITERS,
             damping: float = PR_DAMPING,
             weight: str | None = None) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list: (node, pr)
    after ``iters`` power iterations of
    pr' = (1−d)/N + d·(Σ_in pr/out_deg + dangling_mass/N),
    with dangling nodes (no out-edges) redistributing their rank
    uniformly — the classic formulation, deterministic given the graph.

    ``weight`` names an edge-weight column: contributions become
    pr·w/Σ_out w (the weighted random surfer — a co-purchase edge seen
    40 times carries 40× the rank of a one-off). Weights must be
    positive; INTEGER weights keep the per-node strength sums exact
    (the oracle replays them bit-identically — a float-weight strength
    sum would be ordering-sensitive in the last ulp). Dangling remains
    "no out-EDGES" — with positive weights the two definitions agree.

    Scale shape (Pregel-lite on DataFrames): the PROJECTED edge frame
    persists once (an unpersisted edge argument would re-run its whole
    upstream derivation — join+distinct, a co-occurrence build — once
    per iteration; measured 28.9s → 3.4s on the weighted co-purchase
    graph at sf0.01, r15 optimization round); node and degree frames
    are |V|-bounded and persisted once; each iteration is ONE
    edges⋈ranks shuffle join + a groupBy(dst) partial-aggregated sum,
    with the 1-row dangling aggregate joined IN-PLAN as a broadcast
    scalar (same aggregate plan shape as the former driver collect —
    bit-identical mass, and one job per iteration instead of two).
    Ranks localCheckpoint per iteration so the logical plan stays
    constant-depth (the BPE lesson: a bare persist leaves the whole
    iteration stack in the plan) — EAGERLY, so AQE coalesces each
    iteration's 1600-node shuffles independently (a fully lazy chain
    was measured SLOWER here: the un-adapted 64-128-task stages cost
    more than the saved job round-trips). Rounding happens ONLY at the
    end, so
    iteration arithmetic matches the oracle's unrolled-CTE replay
    bit-for-bit up to float-sum ordering, absorbed by the terminal
    6-dp round."""
    from pyspark.storagelevel import StorageLevel

    if weight is not None:
        _require_weights(edges, weight, "pagerank")
    ecols = [F.col(src).alias("_s"), F.col(dst).alias("_d")]
    if weight is not None:
        ecols.append(F.col(weight).alias("_w"))
    e = edges.select(*ecols).persist(StorageLevel.MEMORY_AND_DISK)
    nodes = (e.select(F.col("_s").alias("node"))
             .union(e.select(F.col("_d").alias("node")))
             .distinct().persist())
    try:
        n = nodes.count()
        if n == 0:
            return nodes.select("node", F.lit(0.0).alias("pr"))
        wsum = (F.count(F.lit(1)) if weight is None
                else F.sum(F.col("_w")))
        deg = (e.groupBy(F.col("_s").alias("node"))
               .agg(wsum.alias("out_deg")).persist())
        # one |V|-bounded check up front: a graph with NO dangling nodes
        # (every node has out-edges — e.g. any symmetric graph) skips
        # the per-iteration dangling-mass subplan entirely
        has_dangling = (nodes.join(deg, on="node", how="left_anti")
                        .limit(1).count() > 0)
        ranks = nodes.select(
            "node", F.lit(1.0 / n).alias("pr")).localCheckpoint()
        bcast = (F.broadcast if n <= SCORE_BROADCAST_MAX_NODES
                 else (lambda df: df))
        for _ in range(iters):
            with_deg = ranks.join(deg, on="node", how="left")
            w_num = F.lit(1.0) if weight is None else F.col("_w")
            contrib = (bcast(with_deg
                             .filter(F.col("out_deg").isNotNull()))
                       .join(e, on=[with_deg["node"] == e["_s"]])
                       .select(F.col("_d").alias("node"),
                               (F.col("pr") * w_num
                                / F.col("out_deg"))
                               .alias("c"))
                       .groupBy("node").agg(F.sum("c").alias("s")))
            if has_dangling:
                # the SAME distributed aggregate the collect ran,
                # kept in-plan: a 1-row broadcast joined below every
                # node row (BroadcastNestedLoopJoin over one row —
                # never a CartesianProduct), so the double entering
                # the damping expression is bit-identical to the
                # former literal. Replicates the former Python
                # arithmetic ORDER exactly: base = (1-d)/n +
                # (d*dm)/n, then base + d*s — every add/mul/div the
                # same IEEE op on the same operands.
                dm = (with_deg.filter(F.col("out_deg").isNull())
                      .agg(F.coalesce(F.sum("pr"), F.lit(0.0))
                           .alias("_dm")))
                nxt = (nodes.join(contrib, on="node", how="left")
                       .join(F.broadcast(dm))
                       .select("node",
                               (F.lit((1.0 - damping) / n)
                                + F.lit(damping) * F.col("_dm")
                                / F.lit(float(n))
                                + F.lit(damping)
                                * F.coalesce("s", F.lit(0.0)))
                               .alias("pr")))
            else:
                base = (1.0 - damping) / n
                nxt = (nodes.join(contrib, on="node", how="left")
                       .select("node",
                               (F.lit(base) + F.lit(damping)
                                * F.coalesce("s", F.lit(0.0)))
                               .alias("pr")))
            # no explicit release of the superseded ranks frame:
            # Dataset.unpersist is a no-op on localCheckpoint-backed
            # frames (r15 ADVICE); the |V|-bounded blocks are freed
            # by ContextCleaner when the reference drops here.
            nxt = nxt.localCheckpoint()
            ranks = nxt
        return ranks.select("node", F.round("pr", 6).alias("pr"))
    finally:
        nodes.unpersist()
        e.unpersist()
        try:
            deg.unpersist()   # persisted per call; ranks are
        except NameError:     # checkpointed, so nothing downstream
            pass              # reads it (deg unset on the n==0 path)


def pagerank_duck(edges_sql: str, iters: int = PR_ITERS,
                  damping: float = PR_DAMPING,
                  weighted: bool = False) -> str:
    """DuckDB mirror: the SAME power iterations unrolled as ``iters``
    chained CTEs (pr0..prN) — each iteration's dangling mass, degree
    division, and damping replayed value-exact, so the oracle checks
    the ITERATIVE computation, not just the fixed point.
    ``edges_sql`` yields (src, dst)."""
    d = damping
    # MATERIALIZED: DuckDB inlines plain CTEs, so an unrolled 10-iteration
    # chain would re-open the base parquet scans 20+ times concurrently
    # (observed EMFILE) — materializing e/nodes/deg scans them once
    cte = [f"e AS MATERIALIZED ({edges_sql})",
           "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION "
           "SELECT dst FROM e)",
           "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
           ("deg AS MATERIALIZED (SELECT src AS node, SUM(w) AS out_deg "
            "FROM e GROUP BY 1)" if weighted else
            "deg AS MATERIALIZED (SELECT src AS node, COUNT(*) AS out_deg "
            "FROM e GROUP BY 1)"),
           "pr0 AS (SELECT node, 1.0 / nn.n AS pr FROM nodes, nn)"]
    for i in range(1, iters + 1):
        p = f"pr{i - 1}"
        cte.append(
            f"dm{i} AS (SELECT COALESCE(SUM(pr), 0.0) AS m FROM {p} "
            f"LEFT JOIN deg USING (node) WHERE out_deg IS NULL)")
        wnum = "e.w * " if weighted else ""
        cte.append(
            f"c{i} AS (SELECT e.dst AS node, SUM({wnum}p.pr / deg.out_deg) "
            f"AS s FROM {p} p JOIN deg ON p.node = deg.node "
            f"JOIN e ON e.src = p.node GROUP BY 1)")
        cte.append(
            f"pr{i} AS (SELECT nodes.node, "
            f"(1.0 - {d!r}) / nn.n + {d!r} * dm{i}.m / nn.n "
            f"+ {d!r} * COALESCE(c{i}.s, 0.0) AS pr "
            f"FROM nodes LEFT JOIN c{i} USING (node), nn, dm{i})")
    return ("WITH " + ",\n".join(cte)
            + f"\nSELECT node, ROUND(pr, 6) AS pr FROM pr{iters}")


def personalized_pagerank(edges: DataFrame, seed_ids: list[int],
                          src: str = "src", dst: str = "dst",
                          iters: int = PR_ITERS,
                          damping: float = PR_DAMPING,
                          weight: str | None = None) -> DataFrame:
    """Personalized PageRank (Page et al. 1999 §6; the relevance-
    propagation view behind "related to THESE seeds" recommendations):
    the teleport vector concentrates on ``seed_ids`` instead of
    spreading uniformly —

        pr' = d·(Σ_in pr/out_deg) + [node ∈ S]·(1−d + d·dangling)/|S|

    with dangling mass returning to the seeds (the standard PPR
    formulation: ALL non-link mass restarts at the personalization
    set). Ranks measure proximity to the seeds, complementing
    ``bfs_hops``' hop counts (PPR weighs PATH MULTIPLICITY, not just
    distance) and global ``pagerank`` (which answers "important
    overall", not "relevant to these"). Seeds absent from the graph
    are ignored; at least one must be present. Deterministic given the
    graph; fixed ``iters`` is the contract, unrolled by the oracle.

    Scale shape: identical to ``pagerank`` — the projected edge frame
    persists once, each iteration is one edges⋈ranks shuffle + a
    partial-aggregated contribution sum, the 1-row dangling aggregate
    rides in-plan as a broadcast scalar (one job per iteration instead
    of two — see pagerank); the node-dependent teleport is a scan-side
    CASE, no extra exchange."""
    from pyspark.storagelevel import StorageLevel

    if weight is not None:
        _require_weights(edges, weight, "personalized_pagerank")
    ecols = [F.col(src).alias("_s"), F.col(dst).alias("_d")]
    if weight is not None:
        ecols.append(F.col(weight).alias("_w"))
    e = edges.select(*ecols).persist(StorageLevel.MEMORY_AND_DISK)
    nodes = (e.select(F.col("_s").alias("node"))
             .union(e.select(F.col("_d").alias("node")))
             .distinct().persist())
    try:
        seeds = [int(s) for s in seed_ids]
        is_seed = F.col("node").isin(seeds)
        # one |V|-bounded aggregate yields BOTH the seed-presence check
        # and the broadcast-gate node count (r15 ADVICE: the gate ran a
        # second nodes.count() job for a number this aggregate already
        # touches every row to produce)
        [_nrow] = nodes.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum(F.when(is_seed, 1).otherwise(0)).alias("n_seeds")
        ).collect()
        n_nodes = int(_nrow["n_nodes"])
        n_seeds = int(_nrow["n_seeds"] or 0)
        if n_seeds == 0:
            raise ValueError("no seed_ids present in the graph")
        wsum = (F.count(F.lit(1)) if weight is None
                else F.sum(F.col("_w")))
        deg = (e.groupBy(F.col("_s").alias("node"))
               .agg(wsum.alias("out_deg")).persist())
        has_dangling = (nodes.join(deg, on="node", how="left_anti")
                        .limit(1).count() > 0)
        ranks = nodes.select(
            "node",
            F.when(is_seed, F.lit(1.0 / n_seeds)).otherwise(F.lit(0.0))
            .alias("pr")).localCheckpoint()
        bcast = (F.broadcast
                 if n_nodes <= SCORE_BROADCAST_MAX_NODES
                 else (lambda df: df))
        for _ in range(iters):
            with_deg = ranks.join(deg, on="node", how="left")
            w_num = F.lit(1.0) if weight is None else F.col("_w")
            contrib = (bcast(with_deg
                             .filter(F.col("out_deg").isNotNull()))
                       .join(e, on=[with_deg["node"] == e["_s"]])
                       .select(F.col("_d").alias("node"),
                               (F.col("pr") * w_num
                                / F.col("out_deg"))
                               .alias("c"))
                       .groupBy("node").agg(F.sum("c").alias("s")))
            if has_dangling:
                # same aggregate the collect ran, broadcast
                # in-plan; teleport replicates the former Python
                # order exactly: ((1-d) + d*dm) / |S|
                dm = (with_deg.filter(F.col("out_deg").isNull())
                      .agg(F.coalesce(F.sum("pr"), F.lit(0.0))
                           .alias("_dm")))
                teleport = ((F.lit(1.0 - damping)
                             + F.lit(damping) * F.col("_dm"))
                            / F.lit(float(n_seeds)))
                nxt = (nodes.join(contrib, on="node", how="left")
                       .join(F.broadcast(dm))
                       .select("node",
                               (F.when(is_seed, teleport)
                                .otherwise(F.lit(0.0))
                                + F.lit(damping)
                                * F.coalesce("s", F.lit(0.0)))
                               .alias("pr")))
            else:
                teleport_lit = (1.0 - damping) / n_seeds
                nxt = (nodes.join(contrib, on="node", how="left")
                       .select("node",
                               (F.when(is_seed, F.lit(teleport_lit))
                                .otherwise(F.lit(0.0))
                                + F.lit(damping)
                                * F.coalesce("s", F.lit(0.0)))
                               .alias("pr")))
            # no explicit release of the superseded ranks frame:
            # Dataset.unpersist is a no-op on localCheckpoint-backed
            # frames (r15 ADVICE); the |V|-bounded blocks are freed
            # by ContextCleaner when the reference drops here.
            nxt = nxt.localCheckpoint()
            ranks = nxt
        return ranks.select("node", F.round("pr", 6).alias("ppr"))
    finally:
        nodes.unpersist()
        e.unpersist()
        try:
            deg.unpersist()   # persisted per call; ranks are
        except NameError:     # checkpointed, so nothing downstream
            pass              # reads it (deg unset on the n==0 path)


def personalized_pagerank_duck(edges_sql: str, seed_ids: list[int],
                               iters: int = PR_ITERS,
                               damping: float = PR_DAMPING,
                               weighted: bool = False) -> str:
    """DuckDB mirror of :func:`personalized_pagerank` — the pagerank
    unrolled-CTE replay with the seed-concentrated teleport CASE."""
    d = damping
    srcs = ", ".join(str(int(s)) for s in seed_ids)
    cte = [f"e AS MATERIALIZED ({edges_sql})",
           "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION "
           "SELECT dst FROM e)",
           f"ns AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes "
           f"WHERE node IN ({srcs}))",
           ("deg AS MATERIALIZED (SELECT src AS node, SUM(w) AS out_deg "
            "FROM e GROUP BY 1)" if weighted else
            "deg AS MATERIALIZED (SELECT src AS node, COUNT(*) AS out_deg "
            "FROM e GROUP BY 1)"),
           f"pr0 AS (SELECT node, CASE WHEN node IN ({srcs}) "
           f"THEN 1.0 / ns.n ELSE 0.0 END AS pr FROM nodes, ns)"]
    for i in range(1, iters + 1):
        p = f"pr{i - 1}"
        cte.append(
            f"dm{i} AS (SELECT COALESCE(SUM(pr), 0.0) AS m FROM {p} "
            f"LEFT JOIN deg USING (node) WHERE out_deg IS NULL)")
        wnum = "e.w * " if weighted else ""
        cte.append(
            f"c{i} AS (SELECT e.dst AS node, SUM({wnum}p.pr / deg.out_deg) "
            f"AS s FROM {p} p JOIN deg ON p.node = deg.node "
            f"JOIN e ON e.src = p.node GROUP BY 1)")
        cte.append(
            f"pr{i} AS (SELECT nodes.node, "
            f"CASE WHEN nodes.node IN ({srcs}) THEN "
            f"(1.0 - {d!r} + {d!r} * dm{i}.m) / ns.n ELSE 0.0 END "
            f"+ {d!r} * COALESCE(c{i}.s, 0.0) AS pr "
            f"FROM nodes LEFT JOIN c{i} USING (node), ns, dm{i})")
    return ("WITH " + ",\n".join(cte)
            + f"\nSELECT node, ROUND(pr, 6) AS ppr FROM pr{iters}")


LPA_ITERS = 4


def community_labels(pairs: DataFrame, id_a: str = "id_a",
                     id_b: str = "id_b",
                     iters: int = LPA_ITERS,
                     weight: str | None = None) -> DataFrame:
    """Community detection via SYNCHRONOUS label propagation (Raghavan
    et al. 2007, "Near linear time algorithm to detect community
    structures") over an undirected edge list: (node, label) after
    ``iters`` rounds of "adopt the most frequent label among your
    neighbors" (ties: smallest label; isolated rounds keep the own
    label). Labels init to node ids.

    Unlike ``connected_components`` (reachability — one label per
    component), LPA splits a component into densely-connected regions:
    the dedup-graph triage view (which near-clique inside a giant
    component does a doc belong to) and the product-graph community
    view. The classic algorithm is randomized; this variant is
    DETERMINISTIC — synchronous updates, fixed iteration count, total
    (count DESC, label ASC) tie order — so the oracle can replay it
    round by round. Synchronous LPA can oscillate on bipartite
    structures instead of converging; a fixed ``iters`` makes the
    output well-defined regardless (the standard mitigation, and the
    reason the round count is part of the operator's contract).

    Scale shape: one |E|-bounded symmetric edge frame persisted once;
    each round is ONE labels⋈edges shuffle join + a (node, label)
    partial+final count + a struct-max argmax — all partitioned on the
    node id; labels localCheckpoint per round (constant plan depth, the
    PageRank discipline).

    ``weight`` names an edge-weight column: neighbor votes sum the
    weights instead of counting edges (a 40-order co-purchase tie pulls
    40x harder than a one-off). INTEGER weights keep the vote sums
    exact, so the (votes DESC, label ASC) total order replays
    bit-identically in the oracle. Parallel edges COMBINE: duplicate
    (u,v[,reversed]) rows pre-aggregate to one undirected edge whose
    weight is their sum (positive weights required, validated), so the
    weighted path keeps the unweighted contract of one vote edge per
    neighbor pair — a bare ``.distinct()`` over (u,v,w) would let
    parallel edges with differing weights double-vote, and a reversed
    duplicate vote asymmetrically."""
    if weight is not None:
        _require_weights(pairs, weight, "community_labels")
        und = pairs.select(F.least(id_a, id_b).alias("lo"),
                           F.greatest(id_a, id_b).alias("hi"),
                           F.col(weight).alias("w"))
        agg = und.groupBy("lo", "hi").agg(F.sum("w").alias("w"))
        # the symmetric union duplicates only self-loops (lo == hi),
        # and those duplicates carry the identical summed weight, so
        # distinct() collapses exactly them — same as unweighted
        sym = (agg.select(F.col("lo").alias("u"),
                          F.col("hi").alias("v"), "w")
               .union(agg.select(F.col("hi").alias("u"),
                                 F.col("lo").alias("v"), "w"))
               .distinct().persist(StorageLevel.MEMORY_AND_DISK))
    else:
        sym = (pairs.select(F.col(id_a).alias("u"),
                            F.col(id_b).alias("v"))
               .union(pairs.select(F.col(id_b).alias("u"),
                                   F.col(id_a).alias("v")))
               .distinct().persist(StorageLevel.MEMORY_AND_DISK))
    try:
        labels = (sym.select(F.col("u").alias("node")).distinct()
                  .select("node", F.col("node").alias("label"))
                  .localCheckpoint())
        # gated broadcast of the |V|-bounded label frame into the edge
        # join (see SCORE_BROADCAST_MAX_NODES) — vote sums are exact
        # integers, so the join strategy cannot move a single bit
        bcast = (F.broadcast
                 if labels.count() <= SCORE_BROADCAST_MAX_NODES
                 else (lambda df: df))
        try:
            for _ in range(iters):
                vote = (F.count(F.lit(1)) if weight is None
                        else F.sum(F.col("w")))
                votes = (sym.join(bcast(labels),
                                  sym["v"] == labels["node"])
                         .groupBy(F.col("u").alias("n"),
                                  F.col("label").alias("l"))
                         .agg(vote.alias("c")))
                nxt = (votes.groupBy(F.col("n").alias("node"))
                       .agg(F.max(F.struct(F.col("c"),
                                           (-F.col("l")).alias("nl")))
                            .alias("_m"))
                       .select("node", (-F.col("_m.nl")).alias("label"))
                       .localCheckpoint())
                labels.unpersist()
                labels = nxt
            return labels
        except Exception:
            labels.unpersist()
            raise
    finally:
        sym.unpersist()


def community_labels_duck(edges_sql: str, iters: int = LPA_ITERS,
                          weighted: bool = False) -> str:
    """DuckDB mirror: the SAME synchronous rounds unrolled as chained
    MATERIALIZED CTEs (l0..lN), most-frequent-neighbor argmax replayed
    with the identical (count DESC, label ASC) total order — the oracle
    checks every round, not just the fixed point. ``edges_sql`` yields
    (u, v) one row per undirected edge."""
    # weighted: parallel edges pre-aggregate to one undirected edge
    # with the summed weight (the Spark side's contract); the symmetric
    # UNION (distinct) then collapses only self-loop duplicates
    esym = ("SELECT lo AS u, hi AS v, w FROM eu "
            "UNION SELECT hi, lo, w FROM eu"
            if weighted else
            "SELECT u, v FROM e0 UNION SELECT v, u FROM e0")
    vote = "SUM(e.w)" if weighted else "COUNT(*)"
    cte = [f"e0 AS MATERIALIZED ({edges_sql})"]
    if weighted:
        cte.append("eu AS (SELECT LEAST(u, v) AS lo, "
                   "GREATEST(u, v) AS hi, SUM(w) AS w "
                   "FROM e0 GROUP BY 1, 2)")
    cte += [f"e AS MATERIALIZED ({esym})",
           "l0 AS (SELECT DISTINCT u AS node, u AS label FROM e)"]
    for i in range(1, iters + 1):
        p = f"l{i - 1}"
        cte.append(
            f"v{i} AS (SELECT e.u AS n, p.label AS l, {vote} AS c "
            f"FROM e JOIN {p} p ON e.v = p.node GROUP BY 1, 2)")
        cte.append(
            f"l{i} AS MATERIALIZED (SELECT n AS node, l AS label FROM ("
            f"SELECT n, l, ROW_NUMBER() OVER (PARTITION BY n "
            f"ORDER BY c DESC, l ASC) AS r FROM v{i}) WHERE r = 1)")
    return ("WITH " + ",\n".join(cte)
            + f"\nSELECT node, label FROM l{iters}")


LP_MAX_DEGREE = 256
LP_TERM_DEC = "decimal(18,9)"


def link_prediction(pairs: DataFrame, top_n: int = 10,
                    max_degree: int = LP_MAX_DEGREE,
                    id_a: str = "u", id_b: str = "v") -> DataFrame:
    """Link prediction over an undirected graph — common-neighbor count
    and Adamic–Adar (Adamic & Adar 2003: Σ_w 1/ln(deg w) over shared
    neighbors w, down-weighting promiscuous hubs) for NON-adjacent node
    pairs, top-N per node: the "which edge forms next" view that closes
    the graph family (communities say where, k-core how deep, BFS how
    far, co-visitation scores EXISTING co-occurrence — this scores
    ABSENT edges). Output: (node, candidate, common_neighbors,
    adamic_adar, rank), rank by (rounded AA DESC, candidate).

    Determinism: AA terms 1/ln(deg w) quantize to DECIMAL(18,9) before
    summing (the decay/attribution discipline — a double Σ is
    order-dependent; 1/ln of an integer is never boundary-exact at
    9dp), so the aggregate is bit-stable under any partitioning and the
    oracle replays it.

    Scale shape: wedge enumeration at each CENTER node is C(deg, 2) —
    the hub blow-up the triangle counter dodges with degree orientation
    doesn't apply here (a prediction needs ALL wedges at w), so the
    hub bound is the basket-cap idiom: centers keep their
    ``max_degree`` lowest-(poly_hash, neighbor) adjacency rows for
    ENUMERATION (deterministic, oracle-replayed) while the AA weight
    keeps the TRUE degree — scores at capped hubs are bounded-below
    under-counts, documented, never O(hub²) rows. One adjacency
    exchange feeds degrees, the cap window and both wedge sides; the
    existing-edge exclusion is one anti join."""
    from pyspark.sql import Window

    from flink_rag_spark.operators.util import hash_capped_groups

    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    # localCheckpoint, NOT persist-and-unpersist-in-finally: the
    # RETURNED frame's lineage reads sym four ways (degrees, the cap
    # window, both wedge sides via adj, the anti join) — an unpersisted
    # sym would recompute its distinct+union per consumer at the
    # caller's action (observed: 49 exchanges); the checkpoint
    # materializes it once (the bfs/kcore discipline)
    sym = (pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
           .union(pairs.select(F.col(id_b).alias("u"),
                               F.col(id_a).alias("v")))
           .distinct().localCheckpoint())
    deg = (sym.groupBy(F.col("u").alias("node"))
           .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
           .localCheckpoint(eager=True))
    adj = hash_capped_groups(sym, "u", "v", max_degree)
    # wedges at center w: (a, b) unordered neighbor pairs; the AA
    # term rides the center's TRUE degree. deg is |V|-bounded and
    # checkpoint-backed (no stats), so without a hint Catalyst
    # sort-merge-joins it against adj — re-shuffling the adjacency
    # frame that the cap window just hash-partitioned by u. The gated
    # broadcast (SCORE_BROADCAST_MAX_NODES, the r15 graph-family
    # idiom) keeps adj's partitioning alive into the wedge self-join,
    # which then needs no further exchange; above the gate the
    # shuffle join remains the scale plan. Value-inert: degree is an
    # exact integer and the AA term is quantized per row before the
    # order-insensitive DECIMAL sum.
    bcast = (F.broadcast if deg.count() <= SCORE_BROADCAST_MAX_NODES
             else (lambda df: df))
    ctr = (adj.select(F.col("u").alias("w"), F.col("v").alias("n"))
           .join(bcast(deg.select(F.col("node").alias("w"),
                                  F.col("degree").alias("_dw"))),
                 on="w"))
    a = ctr.select("w", F.col("n").alias("a"), "_dw")
    b = ctr.select("w", F.col("n").alias("b"))
    term = F.round(1.0 / F.log(F.col("_dw").cast("double")), 9) \
        .cast(LP_TERM_DEC)
    scored = (a.join(b, on="w")
              .filter(F.col("a") < F.col("b"))
              .select("a", "b", term.alias("_t"))
              .groupBy("a", "b")
              .agg(F.count(F.lit(1)).cast("bigint")
                   .alias("common_neighbors"),
                   F.sum("_t").alias("_aa")))
    # absent edges only: predictions must not re-score known edges
    cand = scored.join(
        sym.select(F.col("u").alias("a"), F.col("v").alias("b")),
        on=["a", "b"], how="left_anti")
    directed = cand.unionByName(
        cand.select(F.col("b").alias("a"), F.col("a").alias("b"),
                    "common_neighbors", "_aa"))
    w_top = Window.partitionBy("a").orderBy(
        F.desc(F.round(F.col("_aa"), 6)), F.asc("b"))
    return (directed
            .withColumn("rank", F.row_number().over(w_top)
                        .cast("bigint"))
            .filter(F.col("rank") <= top_n)
            .select(F.col("a").alias("node"),
                    F.col("b").alias("candidate"),
                    "common_neighbors",
                    F.round(F.col("_aa"), 6).cast("double")
                    .alias("adamic_adar"), "rank"))


def link_prediction_duck(edges_sql: str, top_n: int = 10,
                         max_degree: int = LP_MAX_DEGREE) -> str:
    """DuckDB mirror of :func:`link_prediction` — same hash-ordered
    adjacency cap, same DECIMAL-quantized AA terms, same total order."""
    from flink_rag_spark.functions.hashing import hash_capped_sql
    adj_body = hash_capped_sql("SELECT u, v FROM sym", "u", "v",
                               max_degree)
    return f"""
WITH e0 AS MATERIALIZED ({edges_sql}),
sym AS MATERIALIZED (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS degree
        FROM sym GROUP BY u),
adj AS ({adj_body}),
ctr AS (SELECT a.u AS w, a.v AS n, d.degree AS dw
        FROM adj a JOIN deg d ON d.node = a.u),
scored AS (
  SELECT x.n AS a, y.n AS b,
         CAST(COUNT(*) AS BIGINT) AS common_neighbors,
         SUM(CAST(ROUND(1.0 / LN(CAST(x.dw AS DOUBLE)), 9)
                  AS DECIMAL(18,9))) AS aa
  FROM ctr x JOIN ctr y ON x.w = y.w AND x.n < y.n
  GROUP BY x.n, y.n),
cand AS (
  SELECT s.* FROM scored s
  WHERE NOT EXISTS (SELECT 1 FROM sym WHERE sym.u = s.a AND sym.v = s.b)),
directed AS (
  SELECT a, b, common_neighbors, aa FROM cand
  UNION ALL
  SELECT b, a, common_neighbors, aa FROM cand)
SELECT a AS node, b AS candidate, common_neighbors,
       CAST(ROUND(aa, 6) AS DOUBLE) AS adamic_adar,
       CAST("rank" AS BIGINT) AS "rank"
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY a
                                   ORDER BY ROUND(aa, 6) DESC, b) AS "rank"
      FROM directed)
WHERE "rank" <= {top_n}
"""


def bfs_hops(pairs: DataFrame, source_ids: list[int], max_hops: int,
             id_a: str = "u", id_b: str = "v") -> DataFrame:
    """Multi-source BFS over an undirected edge list: (node, hops) —
    the MINIMUM hop distance from any of ``source_ids``, for every node
    within ``max_hops``. The reachability-with-distance view the graph
    family lacked (connected_components says WHETHER, this says HOW
    FAR): blast-radius of a bad upstream record, entity-neighborhood
    expansion around seed entities, n-hop ego networks for features.

    Deterministic: frontier expansion is a pure set operation per
    round. Scale shape — the LPA/PageRank discipline: the symmetric
    edge frame persists once; each round is ONE frontier⋈edges shuffle
    join + an anti join against the visited set; visited and frontier
    localCheckpoint per round (constant plan depth, frontier-bounded
    state). ``max_hops`` bounds the rounds (part of the contract, the
    kcore stance), so the oracle unrolls them as chained CTEs."""
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    if not source_ids:
        raise ValueError("source_ids must be non-empty")
    spark = pairs.sparkSession
    sym = (pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
           .union(pairs.select(F.col(id_b).alias("u"),
                               F.col(id_a).alias("v")))
           .distinct().persist(StorageLevel.MEMORY_AND_DISK))
    try:
        nodes = sym.select("u").distinct()
        frontier = (nodes.filter(F.col("u").isin(source_ids))
                    .select(F.col("u").alias("node"))
                    .localCheckpoint())
        visited = frontier.select(
            "node", F.lit(0).cast("int").alias("hops")).localCheckpoint()
        for h in range(1, max_hops + 1):
            nxt = (sym.join(frontier, sym["u"] == frontier["node"])
                   .select(F.col("v").alias("node")).distinct()
                   .join(visited.select("node"), on="node",
                         how="left_anti")
                   .localCheckpoint())
            frontier.unpersist()
            frontier = nxt
            grown = frontier.select(
                "node", F.lit(h).cast("int").alias("hops"))
            nv = visited.unionByName(grown).localCheckpoint()
            visited.unpersist()
            visited = nv
        frontier.unpersist()
        return visited
    finally:
        sym.unpersist()


def bfs_hops_duck(edges_sql: str, source_ids: list[int],
                  max_hops: int) -> str:
    """DuckDB mirror of :func:`bfs_hops` — the same frontier rounds
    unrolled as chained MATERIALIZED CTEs."""
    srcs = ", ".join(str(int(s)) for s in source_ids)
    cte = [f"e0raw AS MATERIALIZED ({edges_sql})",
           "e AS MATERIALIZED (SELECT u, v FROM e0raw UNION "
           "SELECT v, u FROM e0raw)",
           f"v0 AS MATERIALIZED (SELECT DISTINCT u AS node, 0 AS hops "
           f"FROM e WHERE u IN ({srcs}))",
           "f0 AS (SELECT node FROM v0)"]
    for h in range(1, max_hops + 1):
        cte.append(
            f"f{h} AS MATERIALIZED ("
            f"SELECT DISTINCT e.v AS node FROM e "
            f"JOIN f{h - 1} f ON e.u = f.node "
            f"WHERE NOT EXISTS (SELECT 1 FROM v{h - 1} p "
            f"WHERE p.node = e.v))")
        cte.append(
            f"v{h} AS MATERIALIZED (SELECT node, hops FROM v{h - 1} "
            f"UNION ALL SELECT node, {h} AS hops FROM f{h})")
    return ("WITH " + ",\n".join(cte)
            + f"\nSELECT node, CAST(hops AS INT) AS hops FROM v{max_hops}")


def weighted_shortest_paths(edges: DataFrame, source_ids: list[int],
                            max_rounds: int, src: str = "u",
                            dst: str = "v",
                            weight: str = "w") -> DataFrame:
    """Bounded-round min-plus BFS (Bellman–Ford relaxation) over a
    DIRECTED weighted edge list: (node, dist) — the minimum total edge
    weight from any of ``source_ids`` along paths of at most
    ``max_rounds`` edges. The weighted generalization of
    :func:`bfs_hops` (hops = all-weights-1): "how strongly connected",
    not just "how many steps". Non-negative weights assumed (the
    Dijkstra precondition; with ``max_rounds`` bounded the result is
    still well-defined for any weights, but reads as "cheapest ≤ h-edge
    path"). Undirected graphs pass both edge directions, the bfs_hops
    convention.

    Determinism: each candidate distance is the left-to-right float sum
    along one concrete path, identical in any engine; MIN over an
    identical set is exact, so rounds replay bit-for-bit and the
    terminal 6-dp round is cosmetic.

    Scale shape — the bfs/pagerank discipline: one dist⋈edges shuffle
    join + one min-aggregate per round over a |reached-nodes|-bounded
    frame, localCheckpoint per round (constant plan depth);
    ``max_rounds`` is part of the contract so the oracle unrolls it."""
    if max_rounds < 0:
        raise ValueError(f"max_rounds must be >= 0, got {max_rounds}")
    if not source_ids:
        raise ValueError("source_ids must be non-empty")
    # min-plus tolerates zero weights but not negative ones (a negative
    # edge under a ROUND bound silently reads as "cheapest path" when
    # it is not even bounded below) — validate the documented
    # precondition instead of corrupting distances
    _require_weights(edges, weight, "weighted_shortest_paths",
                     allow_zero=True)
    srcs = [int(s) for s in source_ids]
    e = (edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v"),
                      F.col(weight).cast("double").alias("_w"))
         .persist(StorageLevel.MEMORY_AND_DISK))
    try:
        dist = (e.select(F.col("_u").alias("node"))
                .union(e.select(F.col("_v").alias("node")))
                .distinct()
                .filter(F.col("node").isin(srcs))
                .select("node", F.lit(0.0).alias("dist"))
                .localCheckpoint())
        for _ in range(max_rounds):
            cand = (dist.join(e, dist["node"] == e["_u"])
                    .select(F.col("_v").alias("node"),
                            (F.col("dist") + F.col("_w")).alias("dist")))
            nxt = (dist.unionByName(cand)
                   .groupBy("node").agg(F.min("dist").alias("dist"))
                   .localCheckpoint())
            dist.unpersist()
            dist = nxt
        return dist.select("node", F.round("dist", 6).alias("dist"))
    finally:
        e.unpersist()


def weighted_shortest_paths_duck(edges_sql: str, source_ids: list[int],
                                 max_rounds: int) -> str:
    """DuckDB mirror of :func:`weighted_shortest_paths` — the same
    relaxation rounds unrolled as chained MATERIALIZED CTEs.
    ``edges_sql`` yields DIRECTED (u, v, w)."""
    srcs = ", ".join(str(int(s)) for s in source_ids)
    cte = [f"e AS MATERIALIZED ({edges_sql})",
           f"d0 AS MATERIALIZED (SELECT node, 0.0 AS dist FROM ("
           f"SELECT u AS node FROM e UNION SELECT v FROM e) "
           f"WHERE node IN ({srcs}))"]
    for h in range(1, max_rounds + 1):
        cte.append(
            f"d{h} AS MATERIALIZED (SELECT node, MIN(dist) AS dist "
            f"FROM (SELECT node, dist FROM d{h - 1} "
            f"UNION ALL "
            f"SELECT e.v AS node, d.dist + e.w AS dist "
            f"FROM d{h - 1} d JOIN e ON e.u = d.node) GROUP BY node)")
    return ("WITH " + ",\n".join(cte)
            + f"\nSELECT node, ROUND(dist, 6) AS dist FROM d{max_rounds}")


KCORE_ITERS = 6


def kcore_nodes(pairs: DataFrame, k: int, id_a: str = "u",
                id_b: str = "v", iters: int = KCORE_ITERS) -> DataFrame:
    """k-core decomposition (Seidman 1983, "Network structure and
    minimum degree") by SYNCHRONOUS peeling: each round simultaneously
    removes every node whose degree in the CURRENT subgraph is below
    ``k``, plus its edges; survivors after ``iters`` rounds are
    reported with their in-core degree — (node, core_degree). The
    k-core is the engagement/robustness view the community family
    lacks: LPA says WHICH region a node belongs to, the core says how
    deeply embedded it is (spam/bot rings and cohesive buyer groups
    are high-core; stragglers peel off).

    Deterministic by construction — the peel set is a pure predicate
    of the current degrees (no tie-breaks at all), so the oracle
    replays every round as chained MATERIALIZED CTEs (the LPA
    discipline). A fixed ``iters`` is part of the contract: peeling is
    monotone (nodes only ever leave), so iters rounds give the exact
    k-core whenever the peel cascade is shorter than iters, and a
    well-defined intermediate subgraph otherwise — the same stance as
    ``community_labels``' fixed rounds.

    Scale shape: one |E|-bounded symmetric frame; each round is ONE
    degree aggregate + two semi joins (both endpoints must survive) on
    the node key; the edge frame localCheckpoints per round (constant
    plan depth, the PageRank/LPA discipline). No driver-side graph
    state; the per-round work shrinks with the surviving subgraph."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = (pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
         .union(pairs.select(F.col(id_b).alias("u"),
                             F.col(id_a).alias("v")))
         .distinct().localCheckpoint())
    try:
        for _ in range(iters):
            keep = (e.groupBy(F.col("u").alias("node"))
                    .agg(F.count(F.lit(1)).alias("deg"))
                    .filter(F.col("deg") >= k).select("node"))
            nxt = (e.join(keep.withColumnRenamed("node", "u"), on="u",
                          how="left_semi")
                   .join(keep.withColumnRenamed("node", "v"), on="v",
                         how="left_semi")
                   .select("u", "v").localCheckpoint())
            e.unpersist()
            e = nxt
        return (e.groupBy(F.col("u").alias("node"))
                .agg(F.count(F.lit(1)).cast("bigint")
                     .alias("core_degree")))
    except Exception:
        # release the LIVE round's checkpoint, not the long-gone
        # symmetric frame (each round already unpersisted its
        # predecessor — the bfs_hops shape)
        e.unpersist()
        raise


def kcore_nodes_duck(edges_sql: str, k: int,
                     iters: int = KCORE_ITERS) -> str:
    """DuckDB mirror of :func:`kcore_nodes` — the same synchronous peel
    rounds unrolled as chained MATERIALIZED CTEs; ``edges_sql`` yields
    (u, v) one row per undirected edge."""
    cte = [f"e0raw AS MATERIALIZED ({edges_sql})",
           "e0 AS MATERIALIZED (SELECT u, v FROM e0raw UNION "
           "SELECT v, u FROM e0raw)"]
    for i in range(1, iters + 1):
        p = f"e{i - 1}"
        cte.append(
            f"k{i} AS (SELECT u AS node FROM {p} "
            f"GROUP BY u HAVING COUNT(*) >= {k})")
        cte.append(
            f"e{i} AS MATERIALIZED (SELECT e.u, e.v FROM {p} e "
            f"JOIN k{i} a ON e.u = a.node "
            f"JOIN k{i} b ON e.v = b.node)")
    return ("WITH " + ",\n".join(cte)
            + f"\nSELECT u AS node, CAST(COUNT(*) AS BIGINT) "
              f"AS core_degree FROM e{iters} GROUP BY u")


def triangle_counts(pairs: DataFrame, x: str = "u",
                    y: str = "v") -> DataFrame:
    """Per-node triangle counts + local clustering coefficient — the
    community-density diagnostic over a relational co-occurrence graph.

    Returns (node, degree, triangles, clustering_coeff) for every node
    with at least one edge; ``clustering_coeff`` = 2T/(d(d−1)) (NULL for
    degree-1 nodes).

    Plan at 100 TB — the degree-orientation ("node-iterator++") scheme:
    each canonical edge is ORIENTED from its (degree, id)-smaller
    endpoint to the larger, so every wedge is enumerated exactly once at
    its smallest vertex and a node's out-degree is O(√m) on any graph —
    the skewed hub that would explode a naive wedge join fans out only
    to higher-degree peers. Three equi-joins total (degrees onto edges,
    wedge self-join on the apex, closing-edge probe on the oriented
    pair); the oriented edge set feeds two consumers and is the
    smallest frame in the plan, so it is pinned. No cross join, no
    driver-side graph state."""
    e = _canon_edges(pairs, x, y)
    deg = (e.select(F.col("a").alias("node"))
           .unionAll(e.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("degree")))
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("db"))
    ranked = e.join(da, "a").join(db, "b")
    fwd = F.struct("da", "a") < F.struct("db", "b")
    oriented = (ranked.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("s"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("t"),
        F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dt"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    o1 = oriented.select(F.col("s"), F.col("t").alias("t1"),
                         F.col("dt").alias("dt1"))
    o2 = oriented.select(F.col("s"), F.col("t").alias("t2"),
                         F.col("dt").alias("dt2"))
    wedges = (o1.join(o2, "s")
              .filter(F.struct("dt1", "t1") < F.struct("dt2", "t2"))
              .select("s", "t1", "t2"))
    closing = oriented.select(F.col("s").alias("t1"),
                              F.col("t").alias("t2"))
    tri = wedges.join(closing, ["t1", "t2"])
    members = (tri.select(F.col("s").alias("node"))
               .unionAll(tri.select(F.col("t1").alias("node")))
               .unionAll(tri.select(F.col("t2").alias("node"))))
    cnt = members.groupBy("node").agg(F.count(F.lit(1)).alias("triangles"))
    dd = F.col("degree").cast("double")
    return (deg.join(cnt, "node", "left")
            .select("node", "degree",
                    F.coalesce("triangles", F.lit(0)).alias("triangles"),
                    F.round(F.when(
                        F.col("degree") >= 2,
                        (F.lit(2.0) * F.coalesce("triangles", F.lit(0))
                         .cast("double")) / (dd * (dd - F.lit(1.0)))),
                        6).alias("clustering_coeff")))


def triangle_counts_duck(edges_sql: str, x: str = "u",
                         y: str = "v") -> str:
    """DuckDB mirror of :func:`triangle_counts` — the canonical-id
    three-way join form (each triangle x<y<z found once), same grid and
    coefficient arithmetic. Orientation is a distributed-execution
    concern; on identical edge sets both forms count identical
    triangles."""
    return f"""
WITH raw AS (SELECT {x} AS x0, {y} AS y0 FROM ({edges_sql})),
e AS (SELECT DISTINCT LEAST(x0, y0) AS a, GREATEST(x0, y0) AS b
      FROM raw WHERE x0 <> y0),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
members AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri),
cnt AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles
        FROM members GROUP BY node),
deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
          SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        GROUP BY node)
SELECT d.node, d.degree,
       COALESCE(c.triangles, 0) AS triangles,
       ROUND(CASE WHEN d.degree >= 2 THEN
               (2.0 * CAST(COALESCE(c.triangles, 0) AS DOUBLE))
               / (CAST(d.degree AS DOUBLE) * (CAST(d.degree AS DOUBLE) - 1.0))
             END, 6) AS clustering_coeff
FROM deg d LEFT JOIN cnt c ON c.node = d.node
"""


# ------------------------------------------- HITS hubs & authorities

HITS_ITERS = 8


def hits(edges: DataFrame, src: str = "src", dst: str = "dst",
         iters: int = HITS_ITERS) -> DataFrame:
    """HITS / hubs-and-authorities (Kleinberg 1999) — the BIPARTITE
    centrality beside PageRank's single score: a node is a good HUB
    when it points at good authorities and a good AUTHORITY when good
    hubs point at it — the natural readout on directed who-references-
    whom graphs (curation sources citing documents, sessions touching
    items) where "important" splits into the two roles.

        a'(v) = Σ_{u→v} h(u),   h'(u) = Σ_{u→v} a'(v)

    with L1 normalization after each half-step (the sum-normalized
    variant — same fixed-point ranking as Kleinberg's L2, one
    aggregate instead of a sqrt; documented contract). Fixed ``iters``
    is the contract (the PageRank discipline), unrolled by the oracle.
    Nodes with no in-edges get authority 0, no out-edges hub 0; output
    (node, hub, authority) rounded at 6 dp.

    Scale shape: node frame |V|-bounded and persisted; each half-step
    is ONE edges⋈scores shuffle join + a partial-aggregated groupBy
    sum, with the 1-row L1 normalization aggregate joined IN-PLAN as a
    broadcast scalar (same aggregate plan shape as the former driver
    collect — bit-identical sum, no per-half-step driver round-trip);
    scores localCheckpoint per half-step (constant-depth plan), each
    half-step one driver job instead of two (r15 optimization
    round)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    from pyspark.storagelevel import StorageLevel

    # the edge frame feeds TWO joins per iteration (2·iters jobs);
    # persisting it computes any upstream derivation (a join+distinct
    # in the catalog query) ONCE instead of per job — measured 57s →
    # ~14s at sf0.1. Spill-safe (MEMORY_AND_DISK), |E|-bounded like
    # pagerank's deg frame is |V|-bounded.
    e = (edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v"))
         .persist(StorageLevel.MEMORY_AND_DISK))
    # nodes is CHECKPOINTED, not persisted: the returned zero-fill
    # frame joins it, and an unpersisted nodes would re-run the whole
    # edge derivation once more at the caller's action (the pre-r15
    # behavior — one hidden derivation scan per consumer)
    nodes = (e.select(F.col("_u").alias("node"))
             .union(e.select(F.col("_v").alias("node")))
             .distinct().localCheckpoint())
    try:
        n = nodes.count()
        if n == 0:
            return nodes.select("node", F.lit(0.0).alias("hub"),
                                F.lit(0.0).alias("authority"))
        hub = nodes.select("node", F.lit(1.0 / n).alias("h")) \
            .localCheckpoint()
        auth = None
        # per half-step: checkpoint the RAW grouped frame (EAGER — AQE
        # coalesces each half-step's shuffles; a fully lazy chain
        # measured slower, see pagerank), then join its own 1-row L1
        # sum back as a broadcast scalar and divide in-plan (CASE WHEN
        # s > 0 — the former `if sa <= 0` driver branch as a row-level
        # expression over the same double; kills the second
        # driver-blocking job each half-step ran). Iteration frames
        # carry only NON-ZERO nodes — a zero-score node contributes
        # nothing to the edge joins or the normalization sums, so the
        # |V| zero-fill join runs ONCE at the end, not per half-step
        # (collect-before-checkpoint + per-step zero fill measured
        # 54.7s → ~14s at sf0.1; the mirror's per-step zeros are
        # value-inert, so parity holds)
        bcast = (F.broadcast if n <= SCORE_BROADCAST_MAX_NODES
                 else (lambda df: df))
        # NOTE on superseded half-step frames: Dataset.unpersist is a
        # no-op for localCheckpoint-backed frames (the SQL cache manager
        # holds no entry for a LogicalRDD plan — r15 ADVICE), so there is
        # no explicit per-half-step release; the blocks are |V|-bounded
        # non-zero-score rows and ContextCleaner reclaims each RDD as
        # soon as the Python reference is dropped below.
        for _ in range(iters):
            a_raw = (e.join(bcast(hub.withColumnRenamed("node", "_u")),
                            on="_u")
                     .groupBy(F.col("_v").alias("node"))
                     .agg(F.sum("h").alias("a"))
                     .localCheckpoint())
            sa = a_raw.agg(F.sum("a").alias("_sa"))
            auth = (a_raw.join(F.broadcast(sa))
                    .select("node",
                            F.when(F.col("_sa") > 0,
                                   F.col("a") / F.col("_sa"))
                            .otherwise(F.col("a")).alias("a")))
            h_raw = (e.join(bcast(auth.withColumnRenamed("node", "_v")),
                            on="_v")
                     .groupBy(F.col("_u").alias("node"))
                     .agg(F.sum("a").alias("h"))
                     .localCheckpoint())
            sh = h_raw.agg(F.sum("h").alias("_sh"))
            hub = (h_raw.join(F.broadcast(sh))
                   .select("node",
                           F.when(F.col("_sh") > 0,
                                  F.col("h") / F.col("_sh"))
                           .otherwise(F.col("h")).alias("h")))
        return (nodes.join(hub, on="node", how="left")
                .join(auth, on="node", how="left")
                .select("node",
                        F.round(F.coalesce("h", F.lit(0.0)), 6)
                        .alias("hub"),
                        F.round(F.coalesce("a", F.lit(0.0)), 6)
                        .alias("authority")))
    finally:
        # nodes is checkpointed (the zero-fill consumer reads its
        # blocks) — only the edge pin is released here
        e.unpersist()


def hits_duck(edges_sql: str, iters: int = HITS_ITERS) -> str:
    """DuckDB mirror of :func:`hits` — the same half-steps unrolled as
    chained MATERIALIZED CTEs with the same L1 normalizations, so the
    oracle checks the ITERATIVE computation (the pagerank-oracle
    discipline). ``edges_sql`` yields (src, dst)."""
    # every per-iteration CTE is MATERIALIZED: ar{i}/a{i} are each
    # referenced twice (normalizer + consumer), so plain CTE inlining
    # would re-evaluate the whole chain ~4^iters times (measured as a
    # multi-minute hang at 6 iterations; the pagerank-oracle lesson,
    # one level deeper)
    cte = [f"e AS MATERIALIZED ({edges_sql})",
           "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION "
           "SELECT dst FROM e)",
           "nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n "
           "FROM nodes)",
           "h0 AS MATERIALIZED (SELECT node, 1.0 / nn.n AS h "
           "FROM nodes, nn)"]
    for i in range(1, iters + 1):
        p = f"h{i - 1}"
        cte.append(
            f"ar{i} AS MATERIALIZED (SELECT nodes.node, "
            f"COALESCE(s.a, 0.0) AS a FROM nodes LEFT JOIN "
            f"(SELECT e.dst AS node, SUM(p.h) AS a FROM {p} p "
            f"JOIN e ON e.src = p.node GROUP BY 1) s USING (node))")
        cte.append(
            f"an{i} AS MATERIALIZED (SELECT SUM(a) AS s FROM ar{i})")
        cte.append(
            f"a{i} AS MATERIALIZED (SELECT node, CASE WHEN an{i}.s > 0 "
            f"THEN a / an{i}.s ELSE a END AS a FROM ar{i}, an{i})")
        cte.append(
            f"hr{i} AS MATERIALIZED (SELECT nodes.node, "
            f"COALESCE(s.h, 0.0) AS h FROM nodes LEFT JOIN "
            f"(SELECT e.src AS node, SUM(p.a) AS h FROM a{i} p "
            f"JOIN e ON e.dst = p.node GROUP BY 1) s USING (node))")
        cte.append(
            f"hn{i} AS MATERIALIZED (SELECT SUM(h) AS s FROM hr{i})")
        cte.append(
            f"h{i} AS MATERIALIZED (SELECT node, CASE WHEN hn{i}.s > 0 "
            f"THEN h / hn{i}.s ELSE h END AS h FROM hr{i}, hn{i})")
    return ("WITH " + ",\n".join(cte)
            + f"\nSELECT h{iters}.node, ROUND(h{iters}.h, 6) AS hub, "
            f"ROUND(a{iters}.a, 6) AS authority "
            f"FROM h{iters} JOIN a{iters} USING (node)")
