"""Document-relationship-graph operators.

The reference keeps a property graph of doc→doc edges (contradicts /
references; internal/database/graph.go:35-48) with node derivation by
union-distinct (A5, graph.go:123-142) and disjunctive neighborhood
lookups (J5, graph.go:99-120). Here the same operators run over an
edge set derived from the relational testdata (order→part "contains"
edges and customer→order "placed" edges, namespaced ids), so the
oracle can check them — the engine-side graph over real doc edges uses
the same functions via HiveEngine.graph.

Scale: nodes/degree are single-shuffle aggregations; neighborhood is
two pruned index lookups union'd — no all-pairs anything.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from the_hive_spark.registry import query
from the_hive_spark.tables import table


def derived_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge table (src, dst, relationship) from orders/lineitem."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    contains = li.select(
        F.concat(F.lit("o:"), F.col("l_orderkey").cast("string")).alias("src"),
        F.concat(F.lit("p:"), F.col("l_partkey").cast("string")).alias("dst"),
        F.lit("contains").alias("relationship"),
    )
    placed = orders.select(
        F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("o:"), F.col("o_orderkey").cast("string")).alias("dst"),
        F.lit("placed").alias("relationship"),
    )
    return contains.unionAll(placed)


_EDGES_SQL = """
  SELECT concat('o:', CAST(l_orderkey AS VARCHAR)) AS src,
         concat('p:', CAST(l_partkey AS VARCHAR)) AS dst,
         'contains' AS relationship
  FROM lineitem
  UNION ALL
  SELECT concat('c:', CAST(o_custkey AS VARCHAR)),
         concat('o:', CAST(o_orderkey AS VARCHAR)),
         'placed'
  FROM orders
"""


@query(
    "graph_nodes",
    oracle=f"""
WITH edges AS ({_EDGES_SQL})
SELECT node_id FROM (
  SELECT src AS node_id FROM edges UNION SELECT dst FROM edges
)
""",
)
def graph_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 node derivation: distinct union of edge endpoints
    (graph.go:123-142's UNION made distributed)."""
    edges = derived_edges(spark, sf_dir)
    return (
        edges.select(F.col("src").alias("node_id"))
        .union(edges.select(F.col("dst").alias("node_id")))
        .distinct()
    )


@query(
    "graph_degree_topk",
    oracle=f"""
WITH edges AS ({_EDGES_SQL}),
endpoints AS (
  SELECT src AS node_id FROM edges UNION ALL SELECT dst FROM edges
)
SELECT node_id, COUNT(*) AS degree
FROM endpoints
GROUP BY node_id
ORDER BY degree DESC, node_id
LIMIT 20
""",
)
def graph_degree_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 nodes by (undirected) degree — hub detection."""
    edges = derived_edges(spark, sf_dir)
    endpoints = edges.select(F.col("src").alias("node_id")).unionAll(
        edges.select(F.col("dst").alias("node_id"))
    )
    return (
        endpoints.groupBy("node_id")
        .agg(F.count(F.lit(1)).alias("degree"))
        .orderBy(F.desc("degree"), F.asc("node_id"))
        .limit(20)
    )


@query(
    "graph_neighborhood",
    oracle=f"""
WITH edges AS ({_EDGES_SQL})
SELECT src, dst, relationship
FROM edges
WHERE src = 'o:1' OR dst = 'o:1'
""",
)
def graph_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/P5 disjunctive neighborhood: all edges touching node o:1
    (graph.go:99-120's `source = ? OR target = ?`)."""
    edges = derived_edges(spark, sf_dir)
    return edges.filter((F.col("src") == "o:1") | (F.col("dst") == "o:1"))
