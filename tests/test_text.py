"""Golden vectors for the character-trigram language classifier (X11).

The confusion-matrix oracle (`lang_id_trigram`) pins the arithmetic against
DuckDB; these tests pin the CLASSIFIER QUALITY on real sentences — the thing
the synthetic corpus (whose text does not vary by label) cannot check.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from warcbase_spark.functions.text import (
    LANG_GOLDEN_SENTENCES as REAL_SENTENCES,
    LANG_TRIGRAM_ORDER,
    LANG_TRIGRAM_PROFILES,
    detect_language_trigram,
)


def test_real_sentences_classified(spark):
    rows = [(lang, s) for lang, s in REAL_SENTENCES.items()]
    df = spark.createDataFrame(rows, "truth string, text string").select(
        "truth", detect_language_trigram(F.col("text")).alias("got")
    )
    got = {r["truth"]: r["got"] for r in df.collect()}
    assert got == {lang: lang for lang in REAL_SENTENCES}


def test_null_empty_und(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "qqq xxx")], "id long, text string"
    ).select("id", detect_language_trigram(F.col("text")).alias("got"))
    got = {r["id"]: r["got"] for r in df.collect()}
    assert got[1] == "und" and got[2] == "und" and got[3] == "und"
    # zero-evidence latin junk is also 'und', not a coin-flip language
    assert got[4] == "und"


def test_profiles_well_formed():
    assert set(LANG_TRIGRAM_ORDER) == set(LANG_TRIGRAM_PROFILES)
    for lang, tris in LANG_TRIGRAM_PROFILES.items():
        assert len(tris) == len(set(tris)), f"duplicate trigram in {lang}"
        assert all(len(t) == 3 for t in tris)
        assert all("'" not in t for t in tris)  # oracle SQL embeds them


def test_trigram_hof_matches_unrolled(spark):
    """detect_language_trigram's folded (HOF) scoring must be byte-identical
    to the unrolled trigram_lang_scores arithmetic the DuckDB oracles are
    generated from — the HOF rewrite exists only to keep generated code
    under Janino's 64 KB method limit, never to change semantics."""
    from warcbase_spark.functions.text import trigram_lang_scores

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    s = trigram_lang_scores(F.col("text"))
    n = len(LANG_TRIGRAM_ORDER)
    structs = [
        F.struct(s[l].alias("score"), F.lit(n - i).alias("pref"), F.lit(l).alias("lang"))
        for i, l in enumerate(LANG_TRIGRAM_ORDER)
    ]
    structs.append(
        F.struct(F.lit(0).cast("long").alias("score"), F.lit(n + 1).alias("pref"), F.lit("und").alias("lang"))
    )
    unrolled = F.when(F.col("text").isNull(), F.lit("und")).otherwise(
        F.array_max(F.array(*structs)).getField("lang")
    )
    rows = d.select(
        detect_language_trigram(F.col("text")).alias("hof"), unrolled.alias("unr")
    ).collect()
    assert rows and all(r["hof"] == r["unr"] for r in rows)


def test_golden_sentences_all_detected(spark):
    """Every golden sentence classifies to its own language against the
    FULL 27-profile set (argmax quality, not just parity)."""
    from warcbase_spark.functions.text import LANG_GOLDEN_SENTENCES

    assert set(LANG_GOLDEN_SENTENCES) == set(LANG_TRIGRAM_ORDER)
    g = spark.createDataFrame(
        list(LANG_GOLDEN_SENTENCES.items()), "truth string, text string"
    )
    rows = g.select("truth", detect_language_trigram(F.col("text")).alias("det")).collect()
    assert len(rows) == 27
    wrong = [(r["truth"], r["det"]) for r in rows if r["truth"] != r["det"]]
    assert not wrong, wrong


def test_tie_break_deterministic(spark):
    # a text scoring equally for two langs resolves to the earlier one in
    # LANG_TRIGRAM_ORDER — same CASE-chain order as the DuckDB oracle
    df = spark.createDataFrame([("x",)], "text string").select(
        detect_language_trigram(F.lit("que que")).alias("got")
    )
    # 'que'/' qu' are in both fr and es profiles; es carries them at higher
    # rank weight (plus 'ue '), so es must win — pinned so profile edits
    # that change the outcome are caught here, not in the oracle diff
    assert df.collect()[0]["got"] == "es"
