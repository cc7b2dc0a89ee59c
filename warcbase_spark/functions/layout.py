"""Scan-layout helpers (guide §2.5 "input skew").

A parquet file is splittable only at rowgroup boundaries: a table written
as one file with one rowgroup scans as ONE task no matter how many cores
the cluster has, so every narrow operator before the first Exchange
(tokenization, hashing, quantized dot products) serializes on a single
core. The driver's generated tables are exactly that shape (documents /
embeddings / events at every SF are single-rowgroup files), which is why
expression-heavy queries scaled ~linearly in SF instead of using the other
31 cores.

``spread_scan`` is the guide's remedy — "one huge unsplittable file …
repartition immediately after the read" — made scale-adaptive: it is a
no-op whenever the scan already has enough partitions (a 100 TB table has
thousands of files/rowgroups, so production scans never pay the extra
exchange), and only round-robin-repartitions genuinely under-parallel
scans to the cluster's core count. Round-robin repartition is
deterministic under task retry (Spark sorts each input partition before
assigning rows — spark.sql.execution.sortBeforeRepartition, on by
default), and every caller feeds aggregates/joins whose results are
partitioning-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def spread_scan(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` to ``target`` partitions (default: the session's
    ``sparkContext.defaultParallelism`` — total cores, local or cluster,
    overridable via ``SPARK_GRAFT_SPREAD_PARTS``) when its current plan
    yields fewer than half that many partitions; otherwise return ``df``
    unchanged. Intended for scans feeding expression-heavy narrow stages."""
    if target is None:
        env = os.environ.get("SPARK_GRAFT_SPREAD_PARTS")
        if env:
            target = int(env)
        else:
            target = df.sparkSession.sparkContext.defaultParallelism
    try:
        parts = df.rdd.getNumPartitions()
    except Exception:
        return df
    if parts * 2 >= target:
        return df
    return df.repartition(target)
