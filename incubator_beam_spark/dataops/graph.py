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
- **Per iteration: ONE join + ONE map-side-combined aggregate.**
  Out-degrees join into the edge list ONCE before the loop; each
  round left-joins the previous round's contribution sums to that
  edge relation on src (rank is computed INLINE — rank = teleport +
  damping * coalesce(s, 0) — so the full |V|-row rank table is never
  re-joined per round; the node set joins exactly once, at the end),
  then aggregates contributions by dst (partial aggregation shuffles
  one row per (partition, dst)). No all-pairs anything, no
  driver-side edge materialization.
- **Lineage truncation, lazily.** The weighted edge list is a LAZY
  ``localCheckpoint`` (computed once inside the final action, read
  from blocks every round, and its by-src Exchange is shared across
  rounds by ReuseExchange); deep loops additionally truncate the
  contribution chain every 8 rounds. The old EAGER per-round
  checkpoints cost one driver-coordinated job per round and hid
  every reusable partitioning from the planner (r12).

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
    damp = f"({damping_num} * coalesce(_s, 0L)) DIV {damping_den}"

    if n_iters <= 0:
        return nodes.select(F.col(id_col), F.lit(base).cast("long").alias("rank"))

    outdeg = edges.groupBy(src_col).agg(F.count(F.lit(1)).alias("_deg"))
    # degree rides WITH the edge list so the loop pays one join, not two.
    # Srcs outside the node universe are dropped HERE (semi-join) — the
    # old per-iteration inner join to the node-complete rank table did
    # the same filtering once per round (``nodes`` is one row per id by
    # contract, so semi-join ≡ inner join for edge multiplicity).
    edges_w = (
        edges.join(outdeg, src_col)
        .join(
            nodes.select(F.col(id_col).alias(src_col)), src_col, "semi"
        )
        .select(F.col(src_col), F.col(dst_col), F.col("_deg"))
    )
    # Lazy checkpoint: computed once inside the FINAL action (honest
    # timing), every iteration then reads stored blocks; the identical
    # by-src Exchange over the checkpointed RDD canonicalizes, so
    # ReuseExchange shares it across rounds (r12 — the old EAGER
    # per-stage checkpoints cost one driver-coordinated job per round
    # and hid every reusable partitioning from the planner).
    edges_w = edges_w.localCheckpoint(eager=False)

    # Rank is a pure function of the previous round's contribution sums
    # (rank = teleport + damping * coalesce(s, 0)), so the loop carries
    # only the (_sid, _s) aggregate and computes rank INLINE at the next
    # join — the per-iteration left-join back to the full node table
    # (one shuffle of |V| rows per round) is gone; nodes are joined
    # exactly once, at the end. Integer arithmetic is unchanged, so the
    # trajectory stays bit-identical (oracle-verified).
    s = None
    for i in range(n_iters):
        if s is None:  # round 1: every node holds the uniform base rank
            ranked = edges_w.withColumn("_rank", F.lit(base).cast("long"))
        else:
            ranked = edges_w.join(
                s, edges_w[src_col] == s["_sid"], "left"
            ).withColumn(
                "_rank", (F.lit(teleport) + F.expr(damp)).cast("long")
            )
        s = (
            ranked.select(
                F.col(dst_col).alias("_sid"),
                F.expr("_rank DIV _deg").alias("_c"),
            )
            .groupBy("_sid")
            .agg(F.sum("_c").alias("_s"))
        )
        # deep loops: truncate lineage every 8 rounds (plan depth grows
        # linearly; 3-iteration gates never hit this)
        if (i + 1) % 8 == 0 and i + 1 < n_iters:
            s = s.localCheckpoint(eager=False)
    return nodes.join(s, nodes[id_col] == s["_sid"], "left").select(
        F.col(id_col),
        (F.lit(teleport) + F.expr(damp)).cast("long").alias("rank"),
    )
