"""Link-graph analytics for corpus curation — PageRank as a quality
signal (the classic web-scale document-importance score: Common-Crawl
pipelines rank hosts/pages by link authority before sampling; see
Brin & Page 1998 and the host-level CC-PageRank releases).

Spark-first shape, same discipline as the repo's other iterative
kernels (``dedup.connected_components``, ``similarity.kmeans_lloyd``):

- **Integer-exact trajectory.** Ranks live in BIGINT micro-units
  (``total`` = 1e12 mass split evenly at t=0); per-edge contributions
  are ``rank DIV outdeg`` (floor), the damping update is
  ``teleport + (num * sum) DIV den`` — every operation is
  order-independent integer arithmetic, so the whole trajectory is
  bit-reproducible in any engine (the gate's DuckDB oracle unrolls
  the identical iterations; float PageRank would hash-drift on
  summation order).
- **Per iteration: ONE co-partitioned join + ONE map-side-combined
  aggregate.** Out-degrees join into the edge list ONCE before the
  loop; each round joins current ranks to that edge relation on src
  (shuffle by src), aggregates contributions by dst (partial
  aggregation shuffles one row per (partition, dst)), and
  left-joins back to the node set for the teleport floor. No
  all-pairs anything, no driver-side edge materialization.
- **Lineage truncation.** Each round's rank table is
  ``localCheckpoint``-ed (eager) — the CC lesson: an iterative plan
  otherwise doubles in depth per round and the final collect replays
  every join.

Dangling nodes (no out-edges) simply leak their mass — the standard
simplification; callers who need mass conservation add a sink node.
At 100 TB: edges are the big table (shuffled by src once per round),
ranks are |V| rows, and nothing is broadcast except the two integer
scalars, so the plan survives a 1000-executor scale-up unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    n_iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "id",
    damping_num: int = 85,
    damping_den: int = 100,
    total: int = 10**12,
) -> DataFrame:
    """Integer-exact PageRank over ``n_iters`` rounds.

    ``edges``: (src, dst) rows — parallel edges count twice, matching
    the multigraph semantics of a raw link extraction. ``nodes``: the
    node universe (one row per ``id_col``); nodes with no in-edges get
    the bare teleport rank, contributions to dsts outside ``nodes``
    are dropped by the final join in every engine identically.

    Returns (id, rank) with rank in integer micro-units of ``total``.
    """
    n = nodes.count()  # one scalar — the only driver-side value
    if n == 0:
        raise ValueError("pagerank: empty node set")
    base = total // n
    teleport = ((damping_den - damping_num) * base) // damping_den

    outdeg = edges.groupBy(src_col).agg(F.count(F.lit(1)).alias("_deg"))
    # degree rides WITH the edge list so the loop pays one join, not two
    edges_w = edges.join(outdeg, src_col).select(
        F.col(src_col), F.col(dst_col), F.col("_deg")
    )
    edges_w = edges_w.localCheckpoint(eager=True)

    ranks = nodes.select(F.col(id_col), F.lit(base).cast("long").alias("rank"))
    for _ in range(n_iters):
        contribs = (
            edges_w.join(ranks, edges_w[src_col] == ranks[id_col])
            .select(
                F.col(dst_col).alias("_to"),
                F.expr("rank DIV _deg").alias("_c"),
            )
            .groupBy("_to")
            .agg(F.sum("_c").alias("_s"))
        )
        ranks = (
            nodes.join(contribs, nodes[id_col] == contribs["_to"], "left")
            .select(
                F.col(id_col),
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({damping_num} * coalesce(_s, 0L)) DIV {damping_den}"
                    )
                ).cast("long").alias("rank"),
            )
        )
        ranks = ranks.localCheckpoint(eager=True)
    return ranks
