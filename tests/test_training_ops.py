"""Unit tests for the training-data pipeline operators: near-dup dedup,
similarity search, multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_minhash_lsh_finds_near_dup(spark):
    from warcbase_spark.operators.dedup import (
        doc_shingles,
        lsh_candidate_pairs,
        minhash_signatures,
        verified_jaccard,
    )

    base = "the quick brown fox jumps over the lazy dog near the old river bank"
    near = base.replace("old", "new")  # one token differs
    far = "completely unrelated words about spark shuffles and bloom filters here"
    d = _docs(spark, [("a", base), ("b", near), ("c", far)])
    sh = doc_shingles(d)
    pairs = lsh_candidate_pairs(minhash_signatures(sh, 8), 8)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert ("a", "b") in got
    v = verified_jaccard(pairs, sh, min_inter=3).collect()
    ab = [r for r in v if (r["a"], r["b"]) == ("a", "b")]
    assert ab and ab[0]["inter"] >= 3
    assert all((r["a"], r["b"]) != ("a", "c") for r in v)


def test_shingles_and_jaccard_counts(spark):
    from warcbase_spark.operators.dedup import doc_shingles

    d = _docs(spark, [("x", "a b c d"), ("y", "a b c d")])
    sh = doc_shingles(d, k=3)
    per = {r["doc"]: r["n"] for r in sh.groupBy("doc").agg(F.count("*").alias("n")).collect()}
    assert per == {"x": 2, "y": 2}  # "a b c", "b c d"


def test_simhash_deterministic_and_equal_for_dups(spark):
    from warcbase_spark.operators.dedup import simhash16_col

    d = _docs(spark, [("a", "spark bloom frontier"), ("b", "spark bloom frontier"),
                      ("c", "other words entirely different")])
    rows = {r["doc_id"]: r["h"] for r in d.select("doc_id", simhash16_col(F.col("text")).alias("h")).collect()}
    assert rows["a"] == rows["b"]
    assert 0 <= rows["a"] < (1 << 16)
    # rerun → identical (pure function of text)
    rows2 = {r["doc_id"]: r["h"] for r in d.select("doc_id", simhash16_col(F.col("text")).alias("h")).collect()}
    assert rows == rows2


def test_ann_topk_matches_numpy_within_bucket(spark):
    from warcbase_spark.operators.similarity import ann_topk, sign_bucket, as_double

    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 8).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]], 0) for i in range(40)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = ann_topk(e, query_id=0, k=5, n_bits=4).collect()

    def bucket(v):
        return sum((1 << i) for i in range(4) if v[i] >= 0)

    q = vecs[0].astype("float64")
    cands = [i for i in range(1, 40) if bucket(vecs[i]) == bucket(vecs[0])]
    sims = sorted(
        ((round(float(np.dot(vecs[i].astype("float64"), q) /
                      (np.linalg.norm(vecs[i].astype("float64")) * np.linalg.norm(q))), 3), i)
         for i in cands),
        key=lambda t: (-t[0], t[1]),
    )[:5]
    assert [(r["vec_id"], r["sim"]) for r in got] == [(i, s) for s, i in sims]


def test_multimodal_decode_fake_and_real_gate(spark):
    from warcbase_spark.operators.multimodal import _fake_decode, decode_media, resize_media

    d = spark.createDataFrame([("d1", "hello world! padding text")], "doc_id string, text string")
    payloads = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    out = decode_media(payloads, mode="fake").collect()
    w, h, hs = _fake_decode(b"hello world! padding text")
    assert out[0]["width"] == w and out[0]["height"] == h and out[0]["head_sum"] == hs
    assert out[0]["n_bytes"] == len("hello world! padding text")

    rz = resize_media(decode_media(payloads, mode="fake"), max_side=100).collect()[0]
    assert max(rz["width"], rz["height"]) <= 100 or rz["scale_milli"] == 1000

    with pytest.raises(NotImplementedError):
        decode_media(payloads, mode="real")

    with pytest.raises(ValueError):
        decode_media(payloads, mode="bogus")


def test_multimodal_decode_real(spark):
    """Real PIL decode branch (skipped where Pillow is absent): valid PNG →
    true dimensions; undecodable payload → (0,0) per ComputeImageSize
    semantics."""
    pytest.importorskip("PIL")
    import io

    import PIL.Image

    from warcbase_spark.operators.multimodal import decode_media

    buf = io.BytesIO()
    PIL.Image.new("RGB", (3, 2)).save(buf, format="PNG")
    rows = [("ok", bytearray(buf.getvalue())), ("bad", bytearray(b"not an image"))]
    d = spark.createDataFrame(rows, "doc_id string, payload binary")
    got = {r["doc_id"]: (r["width"], r["height"]) for r in decode_media(d, mode="real").collect()}
    assert got["ok"] == (3, 2)
    assert got["bad"] == (0, 0)


def test_frame_sample_plan(spark):
    from warcbase_spark.operators.multimodal import frame_sample_plan

    d = spark.createDataFrame([("v1", 3500)], "doc_id string, duration_ms int")
    out = frame_sample_plan(d, every_ms=1000).select("frame_ms").collect()
    assert sorted(r["frame_ms"] for r in out) == [0, 1000, 2000, 3000]
