"""Graph-analytics queries over the events stream: link-analysis
scoring as a curation signal (SURVEY.md §7 Phase 5 beyond-reference
surface; the reference has no graph operator).

q_pagerank runs integer fixed-point PageRank
(ella_spark.operators.graph.pagerank) over a co-activity graph derived
from events, and — because every arithmetic step is either exact int64
or one correctly-rounded IEEE double op + floor() — the DuckDB oracle
can replay all iterations as chained CTEs and hash-match bit-for-bit.
The co-activity edge derivation is deliberately linear: one
min/max pair per (event_type, hour) group, so the edge list is
O(groups), never a within-group pair explosion.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ella_spark.operators.graph import pagerank
from ella_spark.queries import register
from ella_spark.sources import load_table

_ITERS = 5
_DAMPING = 0.85
_SCALE = 10**12
_TOP = 20


def _pagerank_oracle() -> str:
    # IMPORTANT: (1.0 - 0.85) != 0.15 in binary doubles — the oracle
    # must spell the damping-complement EXACTLY as the Spark side
    # computes it (1.0 - d), not as the algebraic constant.
    one_minus_d = "(CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))"
    scale_d = f"CAST({_SCALE} AS DOUBLE)"
    ctes = [
        """g0 AS (
      SELECT event_type, epoch_ns(ts) // 3600000000000 AS h,
             min(user_id) AS u, max(user_id) AS v
      FROM events GROUP BY event_type, epoch_ns(ts) // 3600000000000)""",
        "e0 AS (SELECT DISTINCT u, v FROM g0 WHERE u <> v)",
        """edges AS (
      SELECT u AS src, v AS dst FROM e0
      UNION
      SELECT v AS src, u AS dst FROM e0)""",
        "deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg)",
        f"""pr0 AS (
      SELECT src AS node,
             CAST(floor({scale_d} / (SELECT n FROM nn)) AS BIGINT) AS pr
      FROM deg)""",
    ]
    for i in range(1, _ITERS + 1):
        ctes.append(
            f"""s{i} AS (
      SELECT e.dst AS node,
             SUM(CAST(floor(CAST(p.pr AS DOUBLE) / d.outdeg) AS BIGINT)) AS s
      FROM pr{i - 1} p
      JOIN edges e ON e.src = p.node
      JOIN deg d ON d.src = p.node
      GROUP BY e.dst)"""
        )
        ctes.append(
            f"""pr{i} AS (
      SELECT node,
             CAST(floor({one_minus_d} * {scale_d} / (SELECT n FROM nn))
                  AS BIGINT)
             + CAST(floor(CAST(0.85 AS DOUBLE) * CAST(s AS DOUBLE)) AS BIGINT)
               AS pr
      FROM s{i})"""
        )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT node, pr AS rank_fp,
           CAST(pr AS DOUBLE) / {scale_d} AS score
    FROM pr{_ITERS}
    ORDER BY pr DESC, node
    LIMIT {_TOP}
    """


@register(
    "q_pagerank",
    oracle=_pagerank_oracle(),
    doc="Integer fixed-point PageRank (5 iterations, d=0.85) over the "
    "events co-activity graph: one (min_user, max_user) edge per "
    "(event_type, hour) group — O(groups) edges, no pair explosion — "
    "symmetrized so every node has outdeg >= 1. All state is BIGINT "
    "micro-units (1e-12): shuffle-side SUMs are exact int64, every "
    "float step is one correctly-rounded double op + floor, so the "
    "DuckDB oracle replays all 5 iterations as chained CTEs and the "
    "result hash-matches exactly. At scale: per-iteration equi-join + "
    "int64 groupBy keyed on node id, lineage cut by localCheckpoint "
    "per round, only the node count collected (graph.py pagerank).",
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # ts surfaces as int64 nanoseconds (SURVEY §1.4 shim): the hour
    # bucket is integer division, mirrored as epoch_ns(ts) // in DuckDB.
    g0 = ev.groupBy(
        "event_type", F.expr("ts div 3600000000000").alias("h")
    ).agg(F.min("user_id").alias("u"), F.max("user_id").alias("v"))
    e0 = g0.where(F.col("u") != F.col("v")).select("u", "v").distinct()
    edges = (
        e0.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionAll(e0.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .distinct()
    )
    pr = pagerank(edges, iters=_ITERS, damping=_DAMPING, scale=_SCALE)
    return (
        pr.select(
            "node",
            F.col("pr").alias("rank_fp"),
            (F.col("pr").cast("double") / F.lit(float(_SCALE))).alias("score"),
        )
        .orderBy(F.col("rank_fp").desc(), "node")
        .limit(_TOP)
    )


@register(
    "q_triangle_count",
    oracle="""
    WITH g0 AS (
      SELECT event_type, epoch_ns(ts) // 3600000000000 AS h,
             min(user_id) AS u, max(user_id) AS v
      FROM events GROUP BY event_type, epoch_ns(ts) // 3600000000000),
    e0 AS (SELECT DISTINCT u, v FROM g0 WHERE u <> v),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e0 e1
      JOIN e0 e2 ON e2.u = e1.v
      JOIN e0 e3 ON e3.u = e1.u AND e3.v = e2.v),
    corners AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri)
    SELECT node, count(*) AS triangles
    FROM corners GROUP BY node
    ORDER BY triangles DESC, node
    LIMIT 20
    """,
    doc="Per-node triangle counts over the events co-activity graph "
    "(same linear edge derivation as q_pagerank), top-20 by "
    "membership. Spark runs the degree-ORDERED orientation (Suri-"
    "Vassilvitskii: wedges only at each edge's lower endpoint, "
    "O(E^1.5) total work, survives power-law hubs at 100 TB); the "
    "oracle closes id-ordered wedges (a<b<c) — orientation changes "
    "intermediate sizes, never the triangle set, so exact integer "
    "counts match (operators/graph.py triangle_count).",
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ella_spark.operators.graph import triangle_count

    ev = load_table(spark, sf_dir, "events")
    g0 = ev.groupBy(
        "event_type", F.expr("ts div 3600000000000").alias("h")
    ).agg(F.min("user_id").alias("u"), F.max("user_id").alias("v"))
    e0 = g0.where(F.col("u") != F.col("v")).select("u", "v").distinct()
    tc = triangle_count(
        e0.select(F.col("u").alias("src"), F.col("v").alias("dst"))
    )
    return tc.orderBy(F.col("triangles").desc(), "node").limit(20)


_KCORE_K = 3
_KCORE_ROUNDS = 8


def _kcore_oracle(rounds: int = _KCORE_ROUNDS) -> str:
    ctes = [
        """g0 AS (
      SELECT event_type, epoch_ns(ts) // 3600000000000 AS h,
             min(user_id) AS u, max(user_id) AS v
      FROM events GROUP BY event_type, epoch_ns(ts) // 3600000000000)""",
        "e0 AS (SELECT DISTINCT u, v FROM g0 WHERE u <> v)",
        """s0 AS MATERIALIZED (
      SELECT u AS a, v AS b FROM e0
      UNION ALL SELECT v AS a, u AS b FROM e0)""",
    ]
    # AS MATERIALIZED: each s_i is referenced multiple times by the
    # next level; DuckDB's default CTE inlining makes the 8-round
    # chain exponential (measured: the un-materialized form does not
    # finish), materialization makes it the same linear dataflow
    # Spark runs
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"""k{i} AS MATERIALIZED (
      SELECT a FROM s{p} GROUP BY a HAVING count(*) >= {_KCORE_K})"""
        )
        ctes.append(
            f"""s{i} AS MATERIALIZED (
      SELECT s.a, s.b FROM s{p} s
      JOIN k{i} ka ON ka.a = s.a
      JOIN k{i} kb ON kb.a = s.b)"""
        )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT a AS node FROM s{rounds}
    GROUP BY a HAVING count(*) >= {_KCORE_K}
    ORDER BY node
    """


@register(
    "q_kcore",
    oracle=_kcore_oracle(),
    doc=f"{_KCORE_K}-core of the events co-activity graph by "
    f"bounded-round peeling ({_KCORE_ROUNDS} rounds): each round "
    "drops nodes of degree < k and re-filters the edge list — a "
    "FIXED dataflow (not peel-to-fixpoint), so the DuckDB oracle "
    "unrolls the identical rounds as CTEs; peeling is monotone, so "
    "extra rounds past the fixpoint are no-ops and early Spark "
    "convergence (the operator's break + converged flag) cannot "
    "diverge from the unrolled replay. Per round: one degree count + "
    "one semi-join filter, O(E) keyed shuffles, localCheckpoint "
    "lineage cut (operators/graph.py kcore).",
)
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ella_spark.operators.graph import kcore

    ev = load_table(spark, sf_dir, "events")
    g0 = ev.groupBy(
        "event_type", F.expr("ts div 3600000000000").alias("h")
    ).agg(F.min("user_id").alias("u"), F.max("user_id").alias("v"))
    e0 = g0.where(F.col("u") != F.col("v")).select("u", "v").distinct()
    out = kcore(
        e0.select(F.col("u").alias("src"), F.col("v").alias("dst")),
        k=_KCORE_K,
        rounds=_KCORE_ROUNDS,
    )
    return out.select("node").orderBy("node")


@register(
    "q_clustering_coefficient",
    oracle="""
    WITH g0 AS (
      SELECT event_type, epoch_ns(ts) // 3600000000000 AS h,
             min(user_id) AS u, max(user_id) AS v
      FROM events GROUP BY event_type, epoch_ns(ts) // 3600000000000),
    e0 AS (SELECT DISTINCT u, v FROM g0 WHERE u <> v),
    deg AS (
      SELECT a AS node, count(*) AS d FROM (
        SELECT u AS a FROM e0 UNION ALL SELECT v FROM e0)
      GROUP BY a),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e0 e1
      JOIN e0 e2 ON e2.u = e1.v
      JOIN e0 e3 ON e3.u = e1.u AND e3.v = e2.v),
    tcnt AS (
      SELECT node, count(*) AS t FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
      GROUP BY node)
    SELECT d.node, d.d AS degree,
           coalesce(t.t, 0) AS triangles,
           round(CAST(2 * coalesce(t.t, 0) AS DOUBLE)
                 / (d.d * (d.d - 1)), 6) AS coeff
    FROM deg d LEFT JOIN tcnt t ON t.node = d.node
    WHERE d.d >= 3
    ORDER BY coeff DESC, d.node
    LIMIT 20
    """,
    doc="Local clustering coefficient 2T/(d(d-1)) per node (degree >= "
    "3), top-20: the standard graph-cohesion metric, composed from "
    "the degree count and the triangle-membership counts "
    "(operators/graph.triangle_count — degree-ordered, hub-safe). "
    "One extra keyed join over the triangle plan; exact integer "
    "counts, one deterministic double division.",
)
def q_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ella_spark.operators.graph import triangle_count

    ev = load_table(spark, sf_dir, "events")
    g0 = ev.groupBy(
        "event_type", F.expr("ts div 3600000000000").alias("h")
    ).agg(F.min("user_id").alias("u"), F.max("user_id").alias("v"))
    # the edge derivation is read by BOTH the degree branch and the
    # triangle operator: cut it once so neither branch re-embeds the
    # events scan (r14; triangle_count cuts its own canonical and
    # oriented edge lists the same way)
    e0 = (
        g0.where(F.col("u") != F.col("v"))
        .select("u", "v")
        .distinct()
        .localCheckpoint(eager=False)
    )
    edges = e0.select(F.col("u").alias("src"), F.col("v").alias("dst"))
    deg = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    t = triangle_count(edges).select(
        "node", F.col("triangles").alias("triangles")
    )
    return (
        deg.join(t, "node", "left_outer")
        .where(F.col("degree") >= 3)
        .select(
            "node",
            "degree",
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
            F.round(
                (F.lit(2) * F.coalesce("triangles", F.lit(0))).cast("double")
                / (F.col("degree") * (F.col("degree") - 1)),
                6,
            ).alias("coeff"),
        )
        .orderBy(F.col("coeff").desc(), "node")
        .limit(20)
    )


# ── round-7 additions ────────────────────────────────────────────────

_KCORE_FIXPOINT_UNROLL = 12


@register(
    "q_kcore_converged",
    oracle=_kcore_oracle(rounds=_KCORE_FIXPOINT_UNROLL),
    doc=f"Production k-core (VERDICT r6 #4): operators.graph."
    "kcore_converged peels to the TRUE fixpoint (while-not-converged, "
    "runaway backstop only) instead of the bounded-round dataflow. "
    f"The oracle unrolls {_KCORE_FIXPOINT_UNROLL} peel rounds as "
    "CTEs — peeling is monotone, so once the fixpoint is reached "
    "extra unrolled rounds are no-ops and the two agree EXACTLY "
    "whenever the data converges within the unroll (verified at "
    "sf0.001/0.01/0.1; the events co-activity graph peels in <= 3 "
    "rounds — a pathological chain needing more would fail parity "
    "loudly, not silently). Per round: one degree count + two "
    "semi-joins, O(E) keyed shuffles, localCheckpoint lineage cut.",
)
def q_kcore_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ella_spark.operators.graph import kcore_converged

    ev = load_table(spark, sf_dir, "events")
    g0 = ev.groupBy(
        "event_type", F.expr("ts div 3600000000000").alias("h")
    ).agg(F.min("user_id").alias("u"), F.max("user_id").alias("v"))
    e0 = g0.where(F.col("u") != F.col("v")).select("u", "v").distinct()
    out = kcore_converged(
        e0.select(F.col("u").alias("src"), F.col("v").alias("dst")),
        k=_KCORE_K,
    )
    return out.select("node").orderBy("node")


_BFS_CAP = 8


@register(
    "q_recursive_reachability",
    oracle="""
    WITH RECURSIVE g0 AS (
      SELECT event_type, epoch_ns(ts) // 3600000000000 AS h,
             min(user_id) AS u, max(user_id) AS v
      FROM events GROUP BY event_type, epoch_ns(ts) // 3600000000000),
    e0 AS (SELECT DISTINCT u, v FROM g0 WHERE u <> v),
    edges AS (SELECT u AS src, v AS dst FROM e0 UNION SELECT v, u FROM e0),
    r(node, depth) AS (
      SELECT min(src), 0 FROM edges
      UNION ALL
      SELECT DISTINCT e.dst, r.depth + 1
      FROM r JOIN edges e ON e.src = r.node
      WHERE r.depth < 8
    )
    SELECT node, CAST(min(depth) AS INT) AS depth
    FROM r GROUP BY node ORDER BY node
    """,
    doc="Depth-capped BFS from the minimum node over the events "
    "co-activity graph. The oracle stays the depth-capped recursive "
    "CTE (DataFusion's SQL layer ships recursive CTEs; the spec is "
    "unchanged); the Spark side executes it as a VISITED-SET BFS "
    "(operators/graph.py bfs_min_depth — r15, VERDICT #1). Why not "
    "WITH RECURSIVE (the r9-r14 form): SQL recursion has no visited "
    "set, so on cyclic graphs the frontier never empties (the same "
    "~250-node core re-enters every level at sf0.1) and the loop "
    "ALWAYS runs all 8 recursion levels; first-discovery BFS stops "
    "at the first level that finds nothing new — min(true "
    "eccentricity + 1, cap) levels (sf0.1: 5 of 9; the true depth "
    "histogram tops out at 4) with strictly smaller per-level join "
    "inputs (new nodes only, never re-visits). Result set identical "
    "by construction: first-discovery depth IS min(depth), and the "
    "depth-<=cap node set is unchanged (proved by the unchanged "
    "oracle hash + tests/test_graph.py equivalence pins). The edge "
    "list is MATERIALIZED (localCheckpoint) before the loop, bounded "
    "by distinct (event_type, hour) pairs — the CC/pagerank "
    "checkpoint discipline.",
)
def q_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ella_spark.operators.graph import bfs_min_depth

    ev = load_table(spark, sf_dir, "events")
    g0 = ev.groupBy(
        "event_type", F.expr("ts div 3600000000000").alias("h")
    ).agg(F.min("user_id").alias("u"), F.max("user_id").alias("v"))
    e0 = g0.where(F.col("u") != F.col("v")).select("u", "v").distinct()
    edges = (
        e0.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionAll(e0.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .distinct()
    )
    # materialize once; ~4M-edge partitions keep the per-level join
    # from paying empty-partition task overhead at tiny frontiers
    # (coalesce over checkpointed blocks is narrow and cheap). Lazy:
    # the count() is the materializing action.
    edges = edges.localCheckpoint(eager=False)
    n_parts = max(1, math.ceil(edges.count() / 4_000_000))
    if edges.rdd.getNumPartitions() > n_parts:
        edges = edges.coalesce(n_parts)
    reach = bfs_min_depth(edges, _BFS_CAP)
    return reach.select("node", "depth").orderBy("node")
