"""Sink tests (S7/S8): partitioned writes, single sorted file, tab output,
GDF writer."""

import json
import os

from pyspark.sql import functions as F

from warcbase_spark.operators.sinks import (
    merged_json_file,
    write_gdf,
    write_partitioned,
    write_sorted_single,
    write_tab_delimited,
)


def _df(spark):
    return spark.createDataFrame(
        [("a", "x", 3, "202401"), ("b", "y", 1, "202401"), ("c", "x", 2, "202402")],
        "src string, dst string, count int, month string",
    )


def test_write_partitioned_layout(spark, tmp_path):
    p = str(tmp_path / "part_out")
    write_partitioned(_df(spark), p, ["month"])
    assert sorted(d for d in os.listdir(p) if d.startswith("month=")) == [
        "month=202401", "month=202402",
    ]
    back = spark.read.parquet(p)
    assert back.count() == 3
    # partition pruning: a month filter must prune to one partition dir
    plan = back.filter(F.col("month") == "202401")._jdf.queryExecution().executedPlan().toString()
    assert "202402" not in plan


def test_write_sorted_single_and_tab(spark, tmp_path):
    p1 = str(tmp_path / "single")
    write_sorted_single(_df(spark), p1, [F.desc("count")])
    parts = [f for f in os.listdir(p1) if f.startswith("part-")]
    assert len(parts) == 1
    lines = open(os.path.join(p1, parts[0])).read().splitlines()
    assert [json.loads(ln)["count"] for ln in lines] == [3, 2, 1]

    p2 = str(tmp_path / "tab")
    write_tab_delimited(_df(spark).orderBy("src").coalesce(1), p2)
    part = next(f for f in os.listdir(p2) if f.startswith("part-"))
    first = open(os.path.join(p2, part)).read().splitlines()[0]
    assert first.split("\t") == ["a", "x", "3", "202401"]


def test_write_gdf(spark, tmp_path):
    p = str(tmp_path / "g.gdf")
    write_gdf(_df(spark), p)
    txt = open(p).read()
    assert txt.startswith("nodedef>name VARCHAR\n")
    assert "edgedef>node1 VARCHAR,node2 VARCHAR,weight DOUBLE" in txt
    assert "a,x,3" in txt


def test_merged_json_file(spark, tmp_path):
    p = str(tmp_path / "merged.json")
    out = merged_json_file(_df(spark), p, ["src"])
    rows = [json.loads(ln) for ln in open(out).read().splitlines()]
    assert [r["src"] for r in rows] == ["a", "b", "c"]
