"""countItems — the reference's workhorse aggregate.

Reference: RecordRDD.scala:37-41 — ``map(r→(r,1)).reduceByKey(_+_)
.sortBy(_._2, desc)``.  In Spark SQL this is a partial+final HashAggregate
followed by a TakeOrderedAndProject when a limit is present — the map-side
combine the reference hand-codes is free from Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_items(df: DataFrame, *cols: str, limit: int | None = None) -> DataFrame:
    """Group-identical → count desc. Ties broken by the group columns so the
    output is fully deterministic under any parallelism (SURVEY §7.3)."""
    out = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), *[F.asc(c) for c in cols])
    )
    return out.limit(limit) if limit else out
