"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (A5 domain-pair link counts over the
derived web) at sf0.001. ``queries()``/``oracle_sql()`` — the operator
registry from warcbase_spark.queries (SURVEY.md §2 coverage), each Spark
DataFrame pipeline paired with DuckDB-runnable ANSI SQL where expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from warcbase_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: monthly domain-pair link counts (reference
    CrawlStatistics.scala:50-71) over the derived web at sf0.001."""
    return QUERIES["domain_links_monthly"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
