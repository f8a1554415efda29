"""Graph analytics over the relational tables — fixed-iteration PageRank.

The dedup family already exercises iterative graph dataflow at scale
(``operators/components.py``: pointer-jumping connected components with
disk checkpoints).  PageRank adds the weighted-propagation shape: a
damped random walk over the nation-level trade graph (customer nation →
supplier nation, edge weight = lineitem count), run for a FIXED number of
iterations so the whole computation — edge build, transition normalize,
three propagation rounds — is replayable as chained SQL CTEs in DuckDB
and therefore value-checked, not rows-only.

Scale shape: the edge build is the standard fact-to-dims star join
(broadcast customer/supplier onto lineitem⋈orders); after the first
aggregation the graph is tiny (≤ nations²) and every propagation round is
a broadcast join.  For billion-edge graphs the same loop holds with the
rank table as a keyed shuffle join plus a checkpoint per round — exactly
the components-operator discipline."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tts_data_pipeline_spark.plans.registry import query
from tts_data_pipeline_spark.sources import table

_DAMP = 0.85
_ITERS = 3


def _pagerank_oracle() -> str:
    ctes = ["""
    WITH edges AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(COUNT(*) AS DOUBLE) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ), trans AS (
      SELECT src, dst, w / SUM(w) OVER (PARTITION BY src) AS p FROM edges
    ), nodes AS (
      SELECT n_nationkey AS node, n_name FROM nation
    ), nn AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes
    ), r0 AS (
      SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes
    )"""]
    for i in range(1, _ITERS + 1):
        ctes.append(f"""
    , r{i} AS (
      SELECT nodes.node,
             ROUND((1.0 - {_DAMP}) / (SELECT n FROM nn)
                   + {_DAMP} * COALESCE(SUM(t.p * r{i - 1}.rank), 0.0), 10)
               AS rank
      FROM nodes
      LEFT JOIN trans t ON t.dst = nodes.node
      LEFT JOIN r{i - 1} ON r{i - 1}.node = t.src
      GROUP BY 1
    )""")
    return "".join(ctes) + f"""
    SELECT nodes.n_name, ROUND(r{_ITERS}.rank, 6) AS pagerank
    FROM r{_ITERS} JOIN nodes ON nodes.node = r{_ITERS}.node
    ORDER BY n_name
    """


@query("graph_pagerank_trade", oracle=_pagerank_oracle())
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank (d=0.85, 3 fixed rounds) over the nation trade
    graph.  Edge build: lineitem ⋈ orders (fact-fact equi-join, AQE
    decides) with customer/supplier broadcast; each round is
    nodes ←(left)− transition ⋈ ranks with the rank side broadcast —
    intermediate ranks rounded to 10 dp on both engines so
    accumulation-order noise can't drift across iterations."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node"), "n_name"
    )

    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count("*").cast("double").alias("w"))
    )
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    trans = (
        edges.join(F.broadcast(out_w), "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("p"))
        .cache()
    )
    n_nodes = nation.count()
    ranks = nation.select(
        "node", (F.lit(1.0) / n_nodes).alias("rank")
    )
    for _ in range(_ITERS):
        contrib = (
            trans.join(F.broadcast(ranks), trans.src == ranks.node)
            .select("dst", (F.col("p") * F.col("rank")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = nation.join(
            F.broadcast(contrib), nation.node == contrib.dst, "left"
        ).select(
            "node",
            F.round(
                F.lit((1.0 - _DAMP) / n_nodes)
                + _DAMP * F.coalesce(F.col("inflow"), F.lit(0.0)),
                10,
            ).alias("rank"),
        )
    return (
        nation.join(ranks, "node")
        .select("n_name", F.round("rank", 6).alias("pagerank"))
        .orderBy("n_name")
    )
