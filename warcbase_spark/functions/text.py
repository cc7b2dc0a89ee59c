"""Text-analysis functions for training-data pipelines.

All pure Column expressions (JVM-side, codegen'd) so the same logic is
expressible 1:1 in the DuckDB oracle SQL. These extend the reference's
DetectLanguage/RemoveHTML surface (DetectLanguage.scala:22-25) with the
operations a 100 TB training-data pipeline needs: language ID, quality
scoring, token counting, fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword markers for the heuristic language-ID;
# chosen to be unambiguous across the five fixture languages
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "los"],
    "de": ["der", "die", "und"],
    "fr": ["le", "les", "des"],
    "zh": ["de", "shi", "zai"],
}


def normalize_ws(text: Column) -> Column:
    """Collapse whitespace runs to single spaces and trim."""
    return F.trim(F.regexp_replace(text, r"\s+", " "))


def token_count(text: Column) -> Column:
    """Whitespace token count (bigint; 0 for empty)."""
    t = normalize_ws(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, " "))).cast("long")


def word_tokens(text: Column) -> Column:
    """BPE-ish subword-friendly tokens: words, numbers, and punctuation runs."""
    return F.regexp_extract_all(F.lower(text), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]+"), 0)


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are common-English stopwords."""
    sw = stopwords or ["the", "a", "and", "of", "to", "in", "is"]
    t = normalize_ws(F.lower(text))
    toks = F.split(t, " ")
    hits = F.size(F.filter(toks, lambda x: x.isin(sw)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation."""
    n = F.length(text)
    stripped = F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return F.when(n > 0, (n - stripped) / n).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: rewards reasonable length,
    penalizes punctuation soup and stopword-free keyword stuffing."""
    ntok = token_count(text)
    len_score = F.least(ntok / F.lit(100.0), F.lit(1.0))
    sw = stopword_ratio(text)
    sw_score = F.least(sw * F.lit(4.0), F.lit(1.0))
    p_score = F.lit(1.0) - F.least(punct_ratio(text) * F.lit(4.0), F.lit(1.0))
    return F.round((len_score + sw_score + p_score) / F.lit(3.0), 6)


def detect_language(text: Column) -> Column:
    """Heuristic n-gram/stopword language ID over the fixture languages
    (maps the reference's Tika LanguageIdentifier, DetectLanguage.scala:22-25).
    Returns the language whose marker tokens occur most; 'und' when none."""
    toks = F.split(normalize_ws(F.lower(text)), " ")
    scores = []
    for lang, markers in LANG_MARKERS.items():
        s = F.size(F.filter(toks, lambda x: x.isin(markers)))
        scores.append(F.struct(s.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best.getField("score") > 0, best.getField("lang")).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the whitespace/case-normalized text.
    Stable under reflow — the exact-dedup key."""
    return F.md5(F.lower(normalize_ws(text)))


def sim_hash16(text: Column) -> Column:
    """16-bit SimHash over word tokens, built from md5-derived per-token bits
    so the identical computation is expressible in DuckDB SQL.

    For each token t: h(t) = first 4 hex chars of md5(t) as a 16-bit int.
    Bit b of the output is 1 iff tokens with bit b set outnumber those
    without. Near-duplicate docs differ in few bits (hamming distance).
    """
    toks = word_tokens(text)
    th = F.transform(toks, lambda t: F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("long"))
    bits = []
    for b in range(16):
        mask = 1 << b
        ones = F.size(F.filter(th, lambda h: h.bitwiseAND(F.lit(mask)) != 0))
        vote = F.when(ones * 2 > F.size(th), F.lit(mask)).otherwise(F.lit(0))
        bits.append(vote)
    out = bits[0]
    for v in bits[1:]:
        out = out + v
    return out.cast("long")
