"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the baseline (queries.embedding_topk_cosine);
these operators add the SCALE paths:

- sign-bucket LSH (coarse quantization on leading components) → bucket join,
  so candidate generation costs Σ bucket² instead of n²;
- cosine kernels stay in JVM Column expressions (zip_with/aggregate dot
  product) — no Python in the hot path;
- scores rounded at a fixed decimal for engine-portable comparison; both
  engines sum in identical (document) order so the doubles match bitwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double(emb) -> Column:
    return F.transform(emb, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def cosine(a, b) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def sign_bucket(emb, n_bits: int = 6) -> Column:
    """Bucket id from the signs of the first n_bits components — a
    deterministic coarse quantizer (IVF-flavoured; no trained centroids so
    both engines derive it identically)."""
    out = F.lit(0)
    for i in range(n_bits):
        out = out + F.when(F.element_at(emb, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return out


def bucketed_neighbors(emb_df: DataFrame, n_bits: int = 6,
                       id_col: str = "vec_id", emb_col: str = "embedding") -> DataFrame:
    """All same-bucket pairs (a < b) with cosine — the LSH candidate join."""
    e = emb_df.select(
        F.col(id_col).alias("id"),
        as_double(F.col(emb_col)).alias("v"),
        sign_bucket(as_double(F.col(emb_col)), n_bits).alias("bkt"),
    )
    a = e.select(F.col("id").alias("a"), F.col("v").alias("va"), "bkt")
    b = e.select(F.col("id").alias("b"), F.col("v").alias("vb"), "bkt")
    return (
        a.join(b, "bkt")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.round(cosine(F.col("va"), F.col("vb")), 3).alias("sim"))
    )


def ann_topk(emb_df: DataFrame, query_id: int, k: int = 10, n_bits: int = 6,
             id_col: str = "vec_id", emb_col: str = "embedding") -> DataFrame:
    """Approximate top-k for one query: search only the query's sign bucket
    (broadcast the 1-row query side)."""
    e = emb_df.select(
        F.col(id_col).alias("vec_id"),
        as_double(F.col(emb_col)).alias("v"),
        sign_bucket(as_double(F.col(emb_col)), n_bits).alias("bkt"),
    )
    q = e.filter(F.col("vec_id") == query_id).select(
        F.col("v").alias("qv"), F.col("bkt").alias("qbkt")
    )
    return (
        e.join(F.broadcast(q), F.col("bkt") == F.col("qbkt"))
        .filter(F.col("vec_id") != query_id)
        .select("vec_id", F.round(cosine(F.col("v"), F.col("qv")), 3).alias("sim"))
        .orderBy(F.desc("sim"), "vec_id")
        .limit(k)
    )
