"""Connected components over near-duplicate pair edges — the union-find
step a training-data dedup pipeline runs AFTER pair generation (MinHash/
winnowing emit pairs; keep-one-per-component needs the components).

Algorithm: min-label propagation, label_{k+1}(v) = min(label_k(v),
min_{u~v} label_k(u)), run a FIXED number of iterations. A fixed count
(instead of propagate-to-convergence) is deliberate: the DuckDB oracle
unrolls the same k steps with materialized CTEs (the pagerank-oracle
pattern), so Spark and the oracle agree bit-for-bit even on graphs whose
diameter exceeds k — correctness of the OPERATOR is checked exactly, and
callers size ``iters`` ≥ the expected component diameter (near-dup
families are dense; diameter is small). Each iteration localCheckpoints
(eager) to truncate lineage — the standard iterative-DataFrame shape used
by pagerank/BFS here.

At 100 TB scale this is the alternating small-star/large-star algorithm's
simple cousin: every step is one shuffle on dst + one shuffle on node,
both on evenly-hashed keys; no driver-side state beyond the loop counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, a: str = "a", b: str = "b", iters: int = 8
) -> DataFrame:
    """(node, label) with label = min node id reachable within ``iters``
    hops. Input: undirected edges as (a, b) pairs."""
    e = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst")).unionByName(
        pairs.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    )
    e = e.localCheckpoint(eager=True)  # reused every iteration
    labels = (
        e.select(F.col("src").alias("node")).distinct().withColumn("label", F.col("node"))
    )
    for _ in range(iters):
        msgs = (
            e.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.min("label").alias("nb"))
            .withColumnRenamed("dst", "node")
        )
        labels = (
            labels.join(msgs, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nb"), F.col("label"))).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
    return labels


def component_sizes(labels: DataFrame) -> DataFrame:
    """(component, size) histogram — keep-one-per-component's driver."""
    return labels.groupBy(F.col("label").alias("component")).agg(
        F.count(F.lit(1)).alias("size")
    )
