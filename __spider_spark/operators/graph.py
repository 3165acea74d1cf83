"""Link-graph analytics: PageRank for frontier prioritization.

The reference's crawl order is static (seed-file order × date,
/root/reference/spiders/ctripSpider.py:136-154). A web-scale frontier
prioritizes by link structure; this operator computes PageRank over the
(src_hash, dst_hash) edge relation the crawl's discovery stage already
produces, as a pure DataFrame iteration (no RDDs, no GraphX):

  rank_{t+1}(v) = (1-d) + d * Σ_{u→v} rank_t(u) / out_deg(u)

Iterative → not ANSI-SQL-expressible → rows-only driver check (contract
allows this); correctness is pinned in pytest against hand-computed ranks
on a small graph.

Scale notes: each iteration is one join (edges ⋈ ranks on src, both
pre-partitioned by the 8-byte hash) + one groupBy(dst) sum. Checkpoint
every ~5 iterations on a real cluster to cut lineage (here n_iter is
small). Dangling nodes keep the (1-d) floor — the standard simplified
formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,          # (src long, dst long)
    n_iter: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over an edge list; returns (node, rank). Deterministic up
    to float-summation order (ranks are rounded to 10 dp each iteration to
    pin parallel-sum noise below any decision boundary)."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(n_iter):
        contribs = (
            edges.join(ranks, edges.src == ranks.node)
            .join(out_deg, "src")
            .select(F.col("dst").alias("node"),
                    (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                F.round(
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0)),
                    10,
                ).alias("rank"),
            )
        )
    return ranks


def connected_components(
    edges: DataFrame,          # (src long, dst long), treated undirected
    max_iter: int = 25,
) -> DataFrame:
    """Connected components by min-label propagation: every node ends up
    labeled with the SMALLEST node id reachable from it. Returns
    (node, component).

    This is the transitive closure the pair-based near-dedup policies
    need: LSH/Jaccard emit PAIRS (a~b, b~c), and keeping "min of each
    pair" can retain both a and c even though a~c transitively; grouping
    by component collapses the whole duplicate cluster to one canonical
    representative (component = min doc id in the cluster).

    Each iteration: labels ⋈ symmetrized edges (keyed on the 8-byte id)
    + one groupBy-min; the loop stops when an iteration changes no label
    (one count per iteration reaches the driver — O(diameter) rounds,
    and duplicate clusters are shallow). Lineage is truncated with
    ``localCheckpoint`` every few rounds — without it Catalyst re-analyzes
    a plan that grows per iteration and the driver, not the data, becomes
    the bottleneck (the same discipline pagerank documents). For graphs
    with adversarial diameter swap the join for the large-star/small-star
    alternation (Kiveris et al., "Connected Components in MapReduce"),
    which squares the convergence rate with the same per-round shape.

    Exact-fixpoint semantics (not a fixed-iteration cut), so an ANSI
    recursive CTE computes the identical relation — oracle-checkable.
    """
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint()
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # candidate label for dst = min over incoming neighbors' labels
        prop = (
            sym.join(labels, sym.src == labels.node)
            .select(F.col("dst").alias("node"),
                    F.col("component").alias("cand"))
            .groupBy("node")
            .agg(F.min("cand").alias("cand"))
        )
        # localCheckpoint truncates lineage each round: the plan stays
        # O(1) deep, so 20+ rounds don't drown the driver in re-analysis
        updated = (
            labels.join(prop, "node", "left")
            .select(
                "node",
                F.least(F.col("component"),
                        F.coalesce(F.col("cand"), F.col("component")))
                .alias("component"),
            )
            .localCheckpoint()
        )
        n_changed = (
            updated.join(labels.withColumnRenamed("component", "__old"),
                         "node")
            .filter(F.col("component") != F.col("__old"))
            .count()
        )
        labels = updated
        if n_changed == 0:
            break
    return labels


def reprioritize_frontier(
    frontier: DataFrame, edges: DataFrame,
    n_iter: int = 10, damping: float = 0.85,
    weight: float = 0.5,
) -> DataFrame:
    """Blend link-structure importance into frontier priority:
    priority' = (1-w)*priority + w*rank/max_rank. Unranked URLs keep their
    discovery priority."""
    # materialize the ranks once: the max_rank action below and the blend
    # join would otherwise each re-run the full n_iter PageRank chain
    ranks = pagerank(edges, n_iter, damping).localCheckpoint()
    max_rank = ranks.agg(F.max("rank")).first()[0] or 1.0
    r = ranks.select(F.col("node").alias("url_hash"),
                     (F.col("rank") / F.lit(max_rank)).alias("__nr"))
    return (
        frontier.join(r, "url_hash", "left")
        .withColumn(
            "priority",
            F.when(F.col("__nr").isNotNull(),
                   F.round((1.0 - weight) * F.col("priority")
                           + weight * F.col("__nr"), 10))
            .otherwise(F.col("priority")),
        )
        .drop("__nr")
    )
