"""Graph operators over relational edge lists (SURVEY §2 C-extensions).

The engine's graph surface is deliberately DataFrame-native: an edge list
is just a (src, dst, weight) relation, and iterative algorithms are
bounded loops of join + groupBy — the same pattern GraphX/GraphFrames use
underneath, without the dependency. Connected components already lives in
operators/dedup.py (min-label propagation); this module adds weighted
PageRank.

Scale notes: each iteration is one shuffle (contributions grouped by
dst). Rank state is one row per node — O(|V|), which at web scale is
far past any broadcast threshold, so the edge⋈rank join carries NO
forced broadcast hint: AQE picks broadcast when the rank relation's
runtime size is under ``spark.sql.autoBroadcastJoinThreshold`` (the
sf0.1 case) and degrades to a shuffled join when it is not (the 10⁹-node
case), instead of OOMing executors on a mandatory hint. For long
iteration counts the logical plan grows linearly; ``checkpoint_every``
truncates lineage with localCheckpoint so the optimizer never sees an
unbounded join tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Weighted PageRank with dangling-mass redistribution.

    ``nodes``: one column ``node`` (every vertex, including sinks).
    ``edges``: ``src``, ``dst``, ``weight`` (>0; parallel edges summed).

    Per iteration::

        out(s)      = Σ_dst weight(s, dst)
        contrib(d)  = Σ_src rank(s) · weight(s, d) / out(s)
        dangling    = Σ_{s: out(s)=0} rank(s)
        rank'(d)    = (1−α)/N + α · (contrib(d) + dangling/N)

    which preserves Σ rank = 1 exactly (up to float) every iteration.
    The rank relation (one row per node) joins the edge list UNHINTED —
    rank state is O(|V|), so forcing a broadcast would OOM executors on
    web-scale graphs; AQE broadcast-converts at runtime when the state
    actually fits (``test_scale.test_pagerank_rank_state_not_hinted``
    pins the absence of the hint). The per-iteration shuffle is the
    groupBy(dst) on edge contributions. The only forced broadcast is the
    dangling-mass scalar — a literal 1-row aggregate.
    """
    # Materialize the loop-invariant relations once: every iteration
    # re-reads them, and leaving their lineage inline makes the final
    # plan re-embed the whole upstream join tree 10× (analysis time
    # explodes superlinearly — measured minutes at 10 iterations even on
    # a 25-node graph). At cluster scale this is a persist(); in-process
    # localCheckpoint carries the same contract.
    edges = (
        edges.groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
        .localCheckpoint(eager=True)
    )
    out = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    n = nodes.count()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))

    for i in range(iterations):
        dangling = (
            ranks.join(out, ranks.node == out.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        contrib = (
            # no broadcast hint on ranks/out: both are O(|V|) relations.
            # AQE broadcast-converts when their runtime size is under the
            # threshold; a forced hint would ignore the threshold and OOM
            # at 10^9 nodes.
            edges.join(ranks, edges.src == ranks.node)
            .join(out, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") * F.col("weight") / F.col("out_w")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dm") / n)
                ).alias("rank"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            # Rank state is one row per node — checkpointing it is O(|V|)
            # and bounds the plan at ~checkpoint_every iterations of
            # joins instead of a tree that compounds per step. Eager: the
            # next iteration's analysis must see a leaf, not the
            # un-truncated lineage. Cadence 2 measured best at sf0.1
            # (every-1 pays 3× in per-job scheduling, every-5 pays ~2×
            # in Catalyst analysis of the deeper plan).
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
