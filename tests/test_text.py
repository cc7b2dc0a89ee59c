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
