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
iteration counts the per-iteration contribution state materializes
eagerly (Pregel-superstep style), so the optimizer sees a
constant-depth plan no matter the iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank with dangling-mass redistribution.

    ``nodes``: one column ``node`` (every vertex, including sinks).
    ``edges``: ``src``, ``dst``, ``weight`` (>0; parallel edges summed).

    Per iteration::

        share(s, d) = weight(s, d) / out(s)          (precomputed once)
        contrib(d)  = Σ_src rank(s) · share(s, d)
        dangling    = Σ_{s: out(s)=0} rank(s)
        rank'(d)    = (1−α)/N + α · (contrib(d) + dangling/N)

    which preserves Σ rank = 1 exactly (up to float) every iteration.

    Round-11 shape (6.1 s → headroom at sf0.1, same semantics):

    - The out-weight normalization happens ONCE on the checkpointed
      edge relation (``share``), dropping the per-iteration rank⋈out
      join the previous shape paid.
    - The dangling-mass aggregate is FUSED into the contribution
      aggregate: dangling-node ranks enter the same groupBy under a
      NULL key (one aggregation pass per iteration instead of two
      separate jobs, each of which re-evaluated the rank lineage).
    - Contribution state — O(|V|) rows — materializes per iteration
      via eager localCheckpoint, the Pregel-superstep state write: the
      next iteration and the dangling-scalar broadcast both read a
      LEAF, so nothing re-executes and the analyzed plan stays
      constant-depth for any iteration count. At cluster scale this is
      a persist()/checkpoint of the per-superstep state, the standard
      iterative-graph cost.

    The rank relation (one row per node) joins the edge list UNHINTED —
    rank state is O(|V|), so forcing a broadcast would OOM executors on
    web-scale graphs; AQE broadcast-converts at runtime when the state
    actually fits (``test_scale.test_pagerank_rank_state_not_hinted``
    pins the absence of the hint). The per-iteration shuffle is the
    groupBy on edge contributions. The only forced broadcast is the
    dangling-mass scalar — a literal 1-row aggregate over the
    checkpointed contribution state.
    """
    # Materialize the loop-invariant normalized edge relation once:
    # every iteration re-reads it, and leaving the lineage inline makes
    # the final plan re-embed the whole upstream join tree 10×.
    # Drop NULL-endpoint edges up front: the contribution pass uses a
    # NULL cnode key to carry dangling-node rank, so a dirty edge row
    # with a NULL dst would silently masquerade as dangling mass (and
    # a NULL src can never match a node) — round-12 advice fix.
    edges = edges.filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )
    edges = edges.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
    out = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    edges = (
        edges.join(out, "src")
        .select("src", "dst", (F.col("weight") / F.col("out_w")).alias("share"))
        .localCheckpoint(eager=True)
    )
    # dangling nodes (no outgoing edges), loop-invariant
    dang_nodes = (
        nodes.join(edges.select("src").distinct(),
                   nodes.node == F.col("src"), "left_anti")
        .select("node")
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))

    for _ in range(iterations):
        # One aggregation pass: edge contributions keyed by dst, plus
        # the dangling ranks under a NULL key. No broadcast hint on
        # ranks: it is O(|V|); AQE broadcast-converts when the runtime
        # size is under the threshold and degrades to a shuffled join
        # at 10^9 nodes instead of OOMing.
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .select(
                F.col("dst").alias("cnode"),
                (F.col("rank") * F.col("share")).alias("c"),
            )
            .unionByName(
                ranks.join(dang_nodes, "node").select(
                    F.lit(None).cast(dict(nodes.dtypes)["node"]).alias("cnode"),
                    F.col("rank").alias("c"),
                )
            )
            .groupBy("cnode")
            .agg(F.sum("c").alias("c"))
            .localCheckpoint(eager=True)
        )
        dangling = contrib.filter(F.col("cnode").isNull()).agg(
            F.coalesce(F.sum("c"), F.lit(0.0)).alias("dm")
        )
        ranks = (
            nodes.join(
                contrib.filter(F.col("cnode").isNotNull())
                .withColumnRenamed("cnode", "node"),
                "node",
                "left",
            )
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
    return ranks


def pagerank_bounded(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    max_edges: int = 100_000,
) -> DataFrame:
    """PageRank for DIMENSION-BOUNDED graphs: one Spark pass builds the
    normalized edge relation, then the iteration runs driver-local over
    the collected edges (the bpe_train / Gram-matrix shape — a linear
    per-iteration update over metadata-sized state must not cost one
    scheduled Spark job per step; measured 4.3 s → ~1.3 s at sf0.1 for
    the 25-node nation trade graph, where all ten join+groupBy+
    checkpoint rounds were pure scheduling overhead).

    Use ONLY when the VERTEX DOMAIN is bounded by construction (a
    dimension table — nations, regions, warehouses), independent of
    fact-table scale: the collect is then bounded metadata exactly like
    the k-means centroid and band-census collects. ``max_edges`` is a
    loud guard, not a sampling knob — a graph past it belongs on
    :func:`pagerank`, whose per-iteration shuffles are the right cost
    model for data-scale vertex sets.

    Semantics are identical to :func:`pagerank`: same normalization,
    same dangling-mass redistribution, same double arithmetic per term
    (share = weight/out_w is an exact-integer quotient; rank terms are
    IEEE doubles). Contribution sums accumulate in sorted (dst, src)
    order — a fixed order where the distributed version's aggregation
    order is partition-dependent; both land on the same 6-dp rounded
    values (the entry's output precision), verified against the
    unrolled DuckDB oracle at every SF.
    """
    edges = edges.filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )
    edges = edges.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
    out = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    shares_df = edges.join(out, "src").select(
        "src", "dst", (F.col("weight") / F.col("out_w")).alias("share")
    )
    # Guard BEFORE materializing: collecting first and counting after
    # would OOM the driver on exactly the data-scale graph the guard
    # exists to reject (round-15 review finding). limit() truncates
    # arbitrarily, but the content only matters when within the bound —
    # where limit(max+1) returns every row — and share_list is sorted
    # below regardless.
    shares = shares_df.limit(max_edges + 1).collect()
    if len(shares) > max_edges:
        raise ValueError(
            f"pagerank_bounded collected more than max_edges="
            f"{max_edges} normalized edges; use pagerank() for "
            "data-scale graphs"
        )
    # nodes may contain a NULL (dirty dim row): pagerank() keeps it —
    # it counts toward n and receives base + damped dangling share, but
    # its rank never enters the dangling mass (the equi-join on NULL
    # never matches) and no non-null edge endpoint can touch it. Sort
    # with a None-first key so mixed None/value rows stay orderable.
    node_rows = sorted(
        (r[0] for r in nodes.collect()), key=lambda v: (v is not None, v)
    )
    n = len(node_rows)
    in_graph = set(node_rows)
    src_nodes = {r["src"] for r in shares}
    # Parity with pagerank() on referential-integrity drift: an edge
    # whose src has no node row contributes nothing (the distributed
    # edges⋈ranks join drops it); contributions to an unknown dst are
    # dropped by the nodes left-join there, and here by never reading
    # them — filtered up front so the loop touches only live edges
    # (round-15 review finding: rank[src] raised KeyError instead).
    share_list = sorted(
        (r["dst"], r["src"], r["share"])
        for r in shares
        if r["src"] in in_graph and r["dst"] in in_graph
    )
    # dangling set is loop-invariant: hoist it (NULL node excluded, see
    # above)
    dangling_nodes = [
        v for v in node_rows if v is not None and v not in src_nodes
    ]
    rank = {v: 1.0 / n for v in node_rows}
    for _ in range(iterations):
        contrib: dict = {}
        for dst, src, share in share_list:
            c = rank[src] * share
            contrib[dst] = contrib.get(dst, 0.0) + c
        dm = 0.0
        for v in dangling_nodes:
            dm += rank[v]
        rank = {
            v: (1.0 - damping) / n
            + damping * (contrib.get(v, 0.0) + dm / n)
            for v in node_rows
        }
    spark = nodes.sparkSession
    node_type = dict(nodes.dtypes)["node"]
    return spark.createDataFrame(
        [(v, rank[v]) for v in node_rows],
        schema=f"node {node_type}, rank double",
    )
