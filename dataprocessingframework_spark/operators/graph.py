"""Graph operators over edge DataFrames.

The graph tier complements dedup's connected components
(`operators/dedup.py` cluster derivation): edges live in ordinary
DataFrames, every iteration is one join + one aggregate — the
standard distributed formulation where the edge table shuffles on its
join key and rank state stays node-sized. No graph library, no
driver-resident adjacency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank with a FIXED iteration count (deterministic —
    oracle-checkable cross-engine, unlike tolerance-based stopping).

    Per iteration: contributions flow along out-weight-normalized
    edges (one join + one groupBy on dst); dangling mass (nodes with
    no out-edges) redistributes uniformly. Rank state is one row per
    node; the edge table is the only big operand and shuffles once per
    iteration on its join key — the textbook distributed shape that
    holds at any node count.

    Returns (node, rank) with rank rounded to 6 decimals.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_w = e.groupBy("src").agg(F.sum("w").alias("ow"))
    # normalized edge weights computed once; reused every iteration
    norm = e.join(out_w, "src").select(
        "src", "dst", (F.col("w") / F.col("ow")).alias("nw")
    )
    n = nodes.count()
    # nodes/norm/out_w are reused every iteration — materialize once
    nodes = nodes.localCheckpoint(eager=True)
    norm = norm.localCheckpoint(eager=True)
    out_w = out_w.localCheckpoint(eager=True)
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contrib = (
            norm.join(ranks, norm["src"] == ranks["node"])
            .select("dst", (F.col("rank") * F.col("nw")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        dangling = (
            ranks.join(out_w, ranks["node"] == out_w["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("d"))
        )
        ranks = (
            nodes.join(
                contrib, nodes["node"] == contrib["dst"], "left"
            )
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("d") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
        )
        # ranks feeds BOTH the contribution join and the dangling agg
        # next iteration — without truncation the logical plan doubles
        # per iteration (2^k blowup in analysis time). Checkpointing
        # per iteration is the standard iterative-algorithm pattern
        # (node-sized state, bounded lineage).
        ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.round("rank", 6).alias("rank"))
