"""Document deduplication operators for training-data pipelines.

All engine-visible arithmetic is chosen to be ENGINE-PORTABLE so every
operator has a bit-exact DuckDB oracle:

- hashing = md5 hex strings (identical lowercase hex in Spark and DuckDB);
  a lexicographic MIN over salted md5 hex strings is a valid min-hash.
- similarity scores are kept as integer (intersection, union) pairs or
  integer-division fixed-point — no float aggregation order dependence.

Reference analogue: warcbase's only dedup is exact MD5 grouping
(ExtractPopularImages.scala:17-24) and the FST URL-seen gate; the near-dup
family (MinHash/SimHash/Jaccard) is the training-data extension the spec
asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# normalized whitespace-token array (same normalization as functions.text)
def tokens_col(text) -> F.Column:
    return F.split(F.lower(F.trim(F.regexp_replace(text, r"\s+", " "))), " ")


def shingles_col(text, k: int = 3) -> F.Column:
    """Word k-gram shingles, document order, possibly with duplicates."""
    w = tokens_col(text)
    n = F.size(w)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(-1)))
    return F.when(
        n >= k,
        F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(w, i + j + 1) for j in range(k)])),
    ).otherwise(F.array())


def doc_shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                 k: int = 3) -> DataFrame:
    """(doc, sh) distinct shingle set per document.

    Shape (r06 optimization, result-identical):

    - the token array is MATERIALIZED as a column in its own Project below
      the Generate before the shingle ``transform`` reads it. Referencing
      the tokenizer expression inside the lambda (the old
      ``shingles_col(text)`` inlining) re-evaluates
      regexp_replace+lower+split once per ``element_at`` — 3 tokenizer
      passes per shingle, O(words²) regex work per document (measured 12×
      of this operator's cost at 50k docs; guide §4.2's "expression
      choice" point). ``_w`` is referenced many times and is non-cheap, so
      CollapseProject keeps the barrier.
    - per-doc dedup is ``array_distinct`` on the shingle array (per-row,
      shuffle-free) instead of a global ``.distinct()``: (doc, sh) rows
      from different docs are already distinct, so the output SET is
      identical with one less Exchange of the full shingle table
      (guide §2.4).
    - the scan is ``spread_scan``-ed: a single-rowgroup parquet input
      otherwise runs all tokenization on one task (guide §2.5).
    """
    from warcbase_spark.functions.layout import spread_scan

    toks = spread_scan(docs).select(
        F.col(id_col).alias("doc"), tokens_col(F.col(text_col)).alias("_w")
    )
    w = F.col("_w")
    n = F.size(w)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(-1)))
    sh_arr = F.when(
        n >= k,
        F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(w, i + j + 1) for j in range(k)])),
    ).otherwise(F.array())
    return toks.select("doc", F.explode(F.array_distinct(sh_arr)).alias("sh"))


def minhash_chunk(i: int, col: str = "sh") -> F.Column:
    """The i-th minhash function: an 8-hex-char chunk of one of two salted
    md5s (2 digests yield 8 independent-enough 32-bit hash functions — 4×
    fewer md5 evaluations per shingle than one digest per function)."""
    salt = "a:" if i < 4 else "b:"
    off = (i % 4) * 8 + 1
    return F.substring(F.md5(F.concat(F.lit(salt), F.col(col))), off, 8)


def minhash_signatures(
    sh: DataFrame, n_hashes: int = 8, hash_mode: str = "md5"
) -> DataFrame:
    """Per-doc minhash signature: sig_i = min over shingles of a salted
    hash of the shingle; all aggregates partial-combine map-side.

    ``hash_mode='md5'`` (oracle mode): 8-hex-char chunks of two salted md5
    digests — identical lowercase hex in Spark and DuckDB, so the oracle
    matches bit-for-bit. The two digests are PROJECTED once per shingle
    row before the aggregate; each min() then reads a cheap substring of
    the digest attribute. Inlining minhash_chunk(i) into the aggregates
    re-evaluates md5 once per aggregate expression (Catalyst doesn't CSE
    across aggregate buffers) — 8 digests/row instead of 2.

    ``hash_mode='fast'`` (engine mode): sig_i = min(xxhash64(seed_i, sh))
    — long-typed signatures, no digest string materialization, no hex
    substring; the production kernel when DuckDB portability isn't needed
    (md5 costs a full digest + 32-char hex per shingle; xxhash64 is a few
    integer rounds). Same banding/verification downstream — candidate
    recall is statistically identical (both are uniform hash families)
    and the verify step is exact Jaccard either way; parity is pinned by
    test_minhash_fast_mode_parity on a planted-near-dup corpus.
    """
    if hash_mode == "fast":
        aggs = [
            F.min(F.xxhash64(F.lit(f"mh{i}"), F.col("sh"))).alias(f"sig{i}")
            for i in range(n_hashes)
        ]
        return sh.groupBy("doc").agg(*aggs)
    if hash_mode != "md5":
        raise ValueError(f"hash_mode must be 'md5' or 'fast', got {hash_mode!r}")
    assert n_hashes <= 8
    digested = sh.select(
        "doc",
        F.md5(F.concat(F.lit("a:"), F.col("sh"))).alias("_da"),
        F.md5(F.concat(F.lit("b:"), F.col("sh"))).alias("_db"),
    )
    # The 8-hex-char chunk is parsed to a LONG before the min: an 8-char
    # lowercase-hex string's lexicographic order IS its numeric order
    # (fixed width, zero-padded), so min-of-longs selects the same hash
    # per (doc, i) and the downstream (band, v) bucketing — the ONLY thing
    # signature values feed — is bit-identical to the hex-string form the
    # DuckDB oracle uses. The win: min(string) plans as SortAggregate
    # (strings have no mutable agg buffer — the shingle table gets sorted
    # per evaluation), min(long) as a map-side-combining HashAggregate
    # (guide §1.2 "per-task work").
    aggs = [
        F.min(
            F.conv(
                F.substring(F.col("_da" if i < 4 else "_db"), (i % 4) * 8 + 1, 8), 16, 10
            ).cast("long")
        ).alias(f"sig{i}")
        for i in range(n_hashes)
    ]
    return digested.groupBy("doc").agg(*aggs)


def lsh_candidate_pairs(
    sigs: DataFrame,
    n_hashes: int = 8,
    bucket_cap: int | None = None,
    cap_mode: str = "drop",
    cache_registry: "list[DataFrame] | None" = None,
) -> DataFrame:
    """Banded LSH with band width 1: docs sharing ANY signature value are
    candidates. The self-join is per (band, value) bucket — the classic
    bucket-join that scales as Σ bucket² instead of n².

    Hot-bucket guard (the 100 TB requirement): a corpus with thousands of
    identical boilerplate docs puts them ALL in one (band, value) bucket →
    quadratic join. With ``bucket_cap`` set, buckets larger than the cap are
    - ``cap_mode='drop'``: removed before pairing (identical-doc clusters
      are exact-dedup's job; engine-portable, used by the oracle queries);
    - ``cap_mode='split'``: salted into ⌈size/cap⌉ sub-buckets by
      xxhash64(doc) — within-sub-bucket pairs survive, so recall degrades
      gracefully while the join stays bounded at size·cap.
    The hot-bucket list is ≤ n/cap rows → broadcast (anti-)join, no extra
    full shuffle of the bands.

    ``sigs`` is cached here: the band table derives from it three times
    (hot-bucket count, a-leg, b-leg of the self-join), and without the
    cache each reference re-runs the full signature aggregation over the
    shingle table — the executed plan showed the whole min-hash pipeline
    THREE times (guide §2.4 / §5 "caching is worth it when a DataFrame is
    reused"). The cache is one row per doc (8 longs) — tiny. Callers with
    a release hook pass ``cache_registry`` (the training pipeline does);
    bench repeats are isolated by bench.py's clearCache.
    """
    sigs = sigs.cache()
    if cache_registry is not None:
        cache_registry.append(sigs)
    bands = sigs.select(
        "doc",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("band"), F.col(f"sig{i}").alias("v"))
                for i in range(n_hashes)
            ])
        ).alias("b"),
    ).select("doc", "b.band", "b.v")
    if bucket_cap is not None:
        hot = (
            bands.groupBy("band", "v")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") > bucket_cap)
        )
        if cap_mode == "drop":
            bands = bands.join(F.broadcast(hot.select("band", "v")), ["band", "v"], "left_anti")
            bands = bands.withColumn("sub", F.lit(0))
        elif cap_mode == "split":
            bands = bands.join(F.broadcast(hot), ["band", "v"], "left").withColumn(
                "sub",
                F.when(
                    F.col("c").isNotNull(),
                    F.pmod(F.xxhash64("doc"), F.ceil(F.col("c") / bucket_cap).cast("long")),
                ).otherwise(F.lit(0)),
            ).drop("c")
        else:
            raise ValueError(f"cap_mode must be 'drop' or 'split', got {cap_mode!r}")
    else:
        bands = bands.withColumn("sub", F.lit(0))
    a = bands.select(F.col("doc").alias("a"), "band", "v", "sub")
    b = bands.select(F.col("doc").alias("b"), "band", "v", "sub")
    return (
        a.join(b, ["band", "v", "sub"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def rare_shingles(sh: DataFrame, max_df: int) -> DataFrame:
    """Drop shingles with document frequency > max_df before inverted-index
    pair generation: a high-df shingle ("click here to") makes the self-join
    quadratic in its df. High-df shingles carry no dedup signal (they are
    corpus boilerplate); verification still runs on the FULL shingle sets.
    The hot list is tiny → broadcast anti-join."""
    hot = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("c")).filter(F.col("c") > max_df)
    return sh.join(F.broadcast(hot.select("sh")), "sh", "left_anti")


VERIFY_BROADCAST_SHINGLE_LIMIT = 8_000_000


def verified_jaccard(
    pairs: DataFrame,
    sh: DataFrame,
    min_inter: int = 3,
    broadcast_shingle_limit: int = VERIFY_BROADCAST_SHINGLE_LIMIT,
    cache_registry: "list[DataFrame] | None" = None,
) -> DataFrame:
    """Exact shingle-set Jaccard evidence for candidate pairs, integer-only:
    (a, b, inter, union_sz) with inter >= min_inter.

    r06 algorithm change (result-identical, A/B'd 228.9s → 8.9s on 8.19M
    candidate pairs at sf1.0, parity ``exceptAll`` both ways = 0 rows):
    the old form joined ``pairs`` against the exploded shingle table twice
    — the a-leg join expands to Σ_pairs |shingles(a)| rows (~390M at
    sf1.0) which then sort-merge through a (b, sh)-keyed Exchange; the
    dominant cost of the whole minhash query (guide §2.3 "shuffle fewer
    bytes" / §1.2 "the distributed algorithm"). Instead, collapse the
    shingle table to one ARRAY row per doc and compute
    ``size(array_intersect(...))`` per pair: per-pair work is the same
    O(na+nb) hash intersection, but nothing explodes — the pair table is
    streamed through two hash joins.

    Broadcast gate (same crossover pattern as seen.py / decontaminate):
    below ``broadcast_shingle_limit`` total shingle rows (~hundreds of MB
    framed) the per-doc array table is broadcast, so the 8M-row pair table
    is never shuffled at all; past the gate both joins fall back to
    AQE-planned shuffle joins (arrays ride the pair shuffle — still far
    cheaper than the exploded form). The gate's count is one job over the
    (caller-cached) shingle table.
    """
    # cached: the a-leg and b-leg joins are two references, and the two
    # (renamed) broadcast builds do not canonicalize to one reusable
    # exchange — without the cache the collect_list aggregate over the
    # shingle table runs twice (executed-plan-verified). Same release-hook
    # pattern as lsh_candidate_pairs; bench repeats are isolated by
    # clearCache.
    arr = sh.groupBy("doc").agg(
        F.collect_list("sh").alias("_arr"), F.count(F.lit(1)).alias("_n")
    ).cache()
    if cache_registry is not None:
        cache_registry.append(arr)
    n_shingles = sh.agg(F.count(F.lit(1)).alias("c")).collect()[0]["c"]
    if n_shingles <= broadcast_shingle_limit:
        arr = F.broadcast(arr)
    aa = arr.select(F.col("doc").alias("a"), F.col("_arr").alias("_aa"), F.col("_n").alias("na"))
    ab = arr.select(F.col("doc").alias("b"), F.col("_arr").alias("_ab"), F.col("_n").alias("nb"))
    return (
        pairs.join(aa, "a")
        .join(ab, "b")
        # size() is int — cast to long so the (a, b, inter, union_sz)
        # schema is bit-identical to the old count(*)-based evidence
        .withColumn("inter", F.size(F.array_intersect("_aa", "_ab")).cast("long"))
        .withColumn("union_sz", F.col("na") + F.col("nb") - F.col("inter"))
        .filter(F.col("inter") >= min_inter)
        .select("a", "b", "inter", "union_sz")
    )


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 8,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD
    2003 — the MOSS algorithm): hash every character k-gram of the
    normalized text, slide a w-hash window, keep each window's minimum.
    Guarantees a match ≥ w+k-1 chars long always shares a fingerprint,
    while storing only ~1/w of the grams.

    Engine-portable shape: the k-gram rows are exploded and the window min
    runs as a plain SQL window (ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING)
    — identical syntax/semantics in DuckDB, everything JVM-side. This is
    deliberately NOT a nested higher-order-function expression: an inner
    array reference inside a transform() lambda is re-evaluated per
    element (Catalyst has no let-binding), turning O(n) hashing into
    O(n·w). Hashes are md5-hex prefixes so lexicographic MIN agrees across
    engines. Returns distinct (doc, fp) rows.
    """
    from pyspark.sql import Window

    normed = docs.select(
        F.col(id_col).alias("doc"),
        F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))).alias("_t"),
    ).filter(F.length("_t") >= k)
    grams = normed.select(
        "doc",
        F.explode(F.sequence(F.lit(1), F.length("_t") - (k - 1))).alias("pos"),
        "_t",
    ).select(
        "doc",
        "pos",
        F.substring(F.md5(F.substring(F.col("_t"), F.col("pos"), F.lit(k))), 1, 8).alias("h"),
        (F.length("_t") - (k - 1)).alias("m"),
    )
    wspec = Window.partitionBy("doc").orderBy("pos").rowsBetween(0, w - 1)
    return (
        grams.withColumn("fp", F.min("h").over(wspec))
        .filter(F.col("pos") <= F.greatest(F.col("m") - (w - 1), F.lit(1)))
        .select("doc", "fp")
        .distinct()
    )


def winnow_pairs(
    fps: DataFrame, max_df: int = 100, min_shared: int = 3
) -> DataFrame:
    """(a, b, shared) doc pairs sharing ≥ min_shared winnowed fingerprints,
    via the fingerprint inverted index. Same hot-key guard as
    ``rare_shingles``: fingerprints with document frequency > max_df are
    corpus boilerplate and would make the self-join quadratic in their df —
    dropped via a broadcast anti-join before pairing."""
    hot = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("c")).filter(F.col("c") > max_df)
    rare = fps.join(F.broadcast(hot.select("fp")), "fp", "left_anti")
    a = rare.select(F.col("doc").alias("a"), "fp")
    b = rare.select(F.col("doc").alias("b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def simhash16_col(text) -> F.Column:
    """16-bit SimHash over normalized tokens, engine-portable.

    bit_b = 1 iff Σ_tokens (±1 by bit b of md5(token)) > 0; the per-token
    bit is hex digit b of the md5 (0-15), tested via a portable integer
    trick: position of the hex char in '0123456789abcdef' gives its value,
    bit j = (value >> (j%4)) & 1 using digit (b//4).

    Simplification for portability: use hex digit b's LOW bit as the
    projection for bit b (16 independent-ish projections from 16 digits).

    Cost shape (VERDICT r2 #3): md5 runs ONCE per token — ``transform``
    digests the token array up front, then a single ``aggregate`` pass
    carries a 16-counter struct accumulator whose merge only reads hex
    digits of the bound digest variable (already-evaluated array elements,
    no re-hashing). The old form ran one aggregate per bit, each calling
    F.md5 on the same token — 16× the hashing for the same result.
    """
    w = tokens_col(text)
    hexpos = "0123456789abcdef"
    digests = F.transform(w, F.md5)

    zero = F.struct(*[F.lit(0).alias(f"c{b}") for b in range(16)])

    def merge(acc: F.Column, d: F.Column) -> F.Column:
        fields = []
        for b in range(16):
            # hex digit `b` of the digest → 0..15; its low bit is the ±1 sign
            val = F.instr(F.lit(hexpos), F.substring(d, b + 1, 1)) - 1
            fields.append(
                (acc[f"c{b}"] + F.when((val % 2) == 1, 1).otherwise(-1)).alias(f"c{b}")
            )
        return F.struct(*fields)

    def finish(acc: F.Column) -> F.Column:
        # `finish` binds the final accumulator as a lambda VARIABLE, so the
        # 16 field reads below are bound-variable lookups — referencing the
        # aggregate expression itself 16 times would re-evaluate the whole
        # (CodegenFallback) fold 16 times
        out = F.when(acc["c0"] > 0, F.lit(1)).otherwise(F.lit(0))
        for b in range(1, 16):
            out = out + F.when(acc[f"c{b}"] > 0, F.lit(1 << b)).otherwise(F.lit(0))
        return out

    # NULL text → NULL token array → the whole fold is NULL; the previous
    # per-bit form returned 0 there (when(NULL > 0) takes the otherwise
    # branch), and the DuckDB oracle's CASE...ELSE 0 agrees — keep 0.
    return F.coalesce(F.aggregate(digests, zero, merge, finish), F.lit(0))
