"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting — all JVM-side column expressions except the rolling
hash, which is a banded winnowing built from shingle hashes (still no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import porthash

# small stopword profiles for the n-gram/stopword-ratio language heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "as"],
    "de": ["der", "die", "und", "das", "nicht", "ist", "von", "mit", "den", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "pour", "dans", "que", "une"],
}


def tokens_expr(text: Column | str) -> Column:
    """Whitespace+punct tokenization as an array column (lowercased)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(t), r"[^a-zA-Z0-9']+"), lambda x: x != "")


def token_count(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (≈ chars/4, the common
    byte-pair heuristic) per document."""
    return docs.select(
        F.col(id_col),
        F.size(tokens_expr(text_col)).cast("long").alias("n_tokens"),
        F.ceil(F.length(text_col) / 4).cast("long").alias("n_subwords_est"),
        F.length(text_col).cast("long").alias("n_chars_measured"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + composite score ∈ [0,1]:
    length band, alpha ratio, punctuation density, mean word length,
    stopword hit ratio. Pure expressions, one pass, no shuffle."""
    t = F.col(text_col)
    toks = tokens_expr(text_col)
    n_chars = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    n_tokens = F.size(toks)
    all_stop = F.array(*[F.lit(w) for ws in STOPWORDS.values() for w in ws])
    n_stop = F.size(F.array_intersect(toks, all_stop))
    alpha_ratio = F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 6)
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    mean_word_len = F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 6)
    stop_ratio = F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6)
    length_ok = ((n_chars >= 20) & (n_chars <= 100000)).cast("int")
    score = F.round(
        (
            length_ok * 0.25
            + F.least(alpha_ratio * 1.25, F.lit(1.0)) * 0.35
            + (1 - F.least(punct_ratio * 5, F.lit(1.0))) * 0.15
            + F.least(stop_ratio * 5, F.lit(1.0)) * 0.25
        ),
        6,
    )
    return docs.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars_measured"),
        n_tokens.cast("long").alias("n_tokens"),
        alpha_ratio.alias("alpha_ratio"),
        punct_ratio.alias("punct_ratio"),
        mean_word_len.alias("mean_word_len"),
        stop_ratio.alias("stop_ratio"),
        score.alias("quality_score"),
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-profile language ID: argmax over per-language hit counts,
    'und' (undetermined) when nothing matches. Deterministic tie-break by
    language code."""
    toks = tokens_expr(text_col)
    scores = [
        F.struct(
            F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws]))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, ws in sorted(STOPWORDS.items())
    ]
    # array_max on structs orders by (hits, lang); invert lang for
    # deterministic ascending tie-break, then pick
    best = F.sort_array(F.array(*scores), asc=False)[0]
    return docs.select(
        F.col(id_col),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
        best["hits"].cast("long").alias("lang_hits"),
    )


def text_profile(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """token_count + quality_score + language_id fused into ONE projection —
    one scan, zero shuffle, zero join. This is the shape the crawl's
    postprocessing lane uses (plans/indexer.py text_features_epoch): at
    100 TB, three separate operator passes would re-scan the documents table
    three times and join narrow outputs twice for no semantic gain.

    Column-for-column identical to the three standalone operators
    (asserted in tests/test_textstats.py)."""
    t = F.col(text_col)
    toks = tokens_expr(text_col)
    n_chars = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    n_tokens = F.size(toks)
    all_stop = F.array(*[F.lit(w) for ws in STOPWORDS.values() for w in ws])
    n_stop = F.size(F.array_intersect(toks, all_stop))
    alpha_ratio = F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 6)
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    mean_word_len = F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 6)
    stop_ratio = F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6)
    length_ok = ((n_chars >= 20) & (n_chars <= 100000)).cast("int")
    score = F.round(
        (
            length_ok * 0.25
            + F.least(alpha_ratio * 1.25, F.lit(1.0)) * 0.35
            + (1 - F.least(punct_ratio * 5, F.lit(1.0))) * 0.15
            + F.least(stop_ratio * 5, F.lit(1.0)) * 0.25
        ),
        6,
    )
    lang_scores = [
        F.struct(
            F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws]))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, ws in sorted(STOPWORDS.items())
    ]
    best = F.sort_array(F.array(*lang_scores), asc=False)[0]
    return docs.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        F.ceil(F.length(text_col) / 4).cast("long").alias("n_subwords_est"),
        n_chars.cast("long").alias("n_chars_measured"),
        alpha_ratio.alias("alpha_ratio"),
        punct_ratio.alias("punct_ratio"),
        mean_word_len.alias("mean_word_len"),
        stop_ratio.alias("stop_ratio"),
        score.alias("quality_score"),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
        best["hits"].cast("long").alias("lang_hits"),
    )


def repetition_profile(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dup_line_frac_max: float = 0.30,
    dup_line_char_frac_max: float = 0.20,
    top_bigram_frac_max: float = 0.18,
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 "Scaling Language
    Models", appendix A1.1 heuristics — public paper): per-document
    duplicate-line fraction (by line count and by character mass) and the
    occurrence fraction of the most frequent word bigram, with the paper's
    reject thresholds (0.30 / 0.20 / 0.18) as the default ``flagged`` rule.
    Boilerplate-heavy crawl text (nav menus, cookie banners, SEO keyword
    stuffing) scores high on all three.

    Plan shape: two explode→groupBy aggregations, both keyed by doc_id —
    map-side combinable, no cross-document state, the final joins are thin
    per-doc summaries co-partitioned on the id. Deliberately NOT a Catalyst
    array-fold: a per-row mode over an array accumulator is the O(len·|acc|)
    interpreted trap r3's caption lane hit; explode+groupBy keeps the count
    in whole-stage codegen and scales linearly at 100 TB."""
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    toks = tokens_expr(text_col)
    base = docs.select(F.col(id_col), lines.alias("lines"), toks.alias("toks"))

    line_stats = (
        base.select(id_col, F.explode("lines").alias("line"))
        .groupBy(id_col, "line")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_lines"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("n_dup_lines"),
            F.sum(F.length("line") * F.col("c")).alias("line_chars"),
            F.sum(
                F.when(F.col("c") > 1, F.length("line") * F.col("c")).otherwise(0)
            ).alias("dup_line_chars"),
        )
    )
    bigram = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.concat(
                F.element_at("toks", i), F.lit(" "), F.element_at("toks", i + F.lit(1))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bigram_stats = (
        base.select(id_col, F.explode(bigram).alias("bg"))
        .groupBy(id_col, "bg")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("top_bigram_n"), F.sum("c").alias("n_bigrams"))
    )

    n_lines = F.coalesce("n_lines", F.lit(0))
    dup_line_frac = F.round(
        F.coalesce("n_dup_lines", F.lit(0)) / F.greatest(n_lines, F.lit(1)), 6
    )
    dup_line_char_frac = F.round(
        F.coalesce("dup_line_chars", F.lit(0))
        / F.greatest(F.coalesce("line_chars", F.lit(0)), F.lit(1)),
        6,
    )
    n_bigrams = F.coalesce("n_bigrams", F.lit(0))
    top_bigram_frac = F.round(
        F.coalesce("top_bigram_n", F.lit(0)) / F.greatest(n_bigrams, F.lit(1)), 6
    )
    return (
        base.select(id_col)
        .join(line_stats, id_col, "left")
        .join(bigram_stats, id_col, "left")
        .select(
            F.col(id_col),
            n_lines.cast("long").alias("n_lines"),
            dup_line_frac.alias("dup_line_frac"),
            dup_line_char_frac.alias("dup_line_char_frac"),
            n_bigrams.cast("long").alias("n_bigrams"),
            top_bigram_frac.alias("top_bigram_frac"),
            (
                (dup_line_frac > dup_line_frac_max)
                | (dup_line_char_frac > dup_line_char_frac_max)
                | (top_bigram_frac > top_bigram_frac_max)
            ).alias("flagged"),
        )
    )


def c4_quality_profile(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """C4-style page cleaning (Raffel et al. 2020 "Exploring the Limits of
    Transfer Learning", §2.2 heuristics — public paper): a line is KEPT only
    when it ends in terminal punctuation (``. ! ?`` or a closing double
    quote), has at least ``min_words_per_line`` words, and does not contain
    the word "javascript"; the page as a whole is kept only when the
    retained lines hold at least ``min_sentences`` sentences and the raw
    text contains neither "lorem ipsum" nor a curly brace (the paper's
    leaked-code tell). Complements the Gopher repetition filters
    (repetition_profile) — C4 targets boilerplate/code leakage, Gopher
    targets repetition.

    Plan shape: a pure per-row projection — line split, per-line predicates
    inside ``filter``/``transform`` (independent per element, constant-size
    state), and scalar regexp counts. Zero shuffles, zero Python stages;
    the whole filter runs in one codegen'd scan at any corpus size. The
    only per-element HOF work is O(n_lines) with scalar accumulators —
    NOT the O(len·|acc|) array-accumulator trap from r3's caption lane."""
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )

    def line_tokens(x):
        return F.filter(F.split(F.lower(x), r"[^a-zA-Z0-9']+"), lambda t: t != "")

    kept = F.filter(
        lines,
        lambda x: x.rlike('[.!?"]$')
        & (F.size(line_tokens(x)) >= min_words_per_line)
        & ~F.array_contains(line_tokens(x), "javascript"),
    )
    kept_text = F.array_join(kept, "\n")
    n_sentences = F.length(kept_text) - F.length(
        F.regexp_replace(kept_text, r"[.!?]", "")
    )
    kept_chars = F.aggregate(
        kept, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    has_lorem = F.contains(F.lower(F.col(text_col)), F.lit("lorem ipsum"))
    has_brace = F.contains(F.col(text_col), F.lit("{"))
    return docs.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        kept_chars.cast("long").alias("kept_chars"),
        n_sentences.cast("long").alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        (
            (n_sentences >= min_sentences) & ~has_lorem & ~has_brace
        ).alias("keep"),
    )


CLASSIFIER_FEATURES = 4096  # hashed-BoW buckets; power of two like fastText's
CLASSIFIER_WEIGHT_SEED = 7  # porthash affine-family member deriving the weights


def classifier_weights(spark, n_features: int = CLASSIFIER_FEATURES) -> DataFrame:
    """The (bucket, w) model-weight dimension for quality_classifier —
    deterministic integer weights in [-500, 500] derived from the porthash
    affine family, so the DuckDB oracle recomputes every score bit-exactly.
    In production this is where trained fastText/CCNet weights load from a
    table; the plan downstream is identical either way."""
    b = F.col("id")
    w = porthash.affine(b, CLASSIFIER_WEIGHT_SEED) % 1001 - 500
    return spark.range(n_features).select(
        b.cast("long").alias("bucket"), w.cast("long").alias("w")
    )


def quality_classifier(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = CLASSIFIER_FEATURES,
    threshold: float = 0.0,
) -> DataFrame:
    """Model-based quality scoring in the CCNet / fastText linear-classifier
    shape (Wenzek et al. 2020; Joulin et al. 2017 — public papers): hashed
    bag-of-words features scored against a weight table, mean-pooled over
    tokens, thresholded into a keep verdict. Heuristic filters (text_quality,
    c4_quality_profile, repetition_profile) catch structural junk; the
    model lane is the learned complement every production pipeline adds.

    Plan shape — the canonical one for linear model scoring at 100 TB:
    explode_outer(tokens) → bucket hash → per-(doc, bucket) count
    (map-side combinable) → BROADCAST join against the weight dimension
    (model weights are ~n_features rows, never shuffle-worthy) → per-doc
    integer sum. explode_outer (not explode) keeps token-less documents
    in-band as a null-bucket row, so the one-row-per-document contract
    needs NO reattach join — a plain explode would force a second
    doc-keyed shuffle of the full corpus just to re-emit empty pages.
    Weighted sums stay in int64 until the final division, so the score is
    order-of-summation independent and the DuckDB oracle matches
    bit-for-bit — float partial sums would not survive a shuffle-order
    change, let alone a cross-engine compare."""
    spark = docs.sparkSession
    toks = tokens_expr(text_col)
    scored = (
        docs.select(F.col(id_col), F.explode_outer(toks).alias("tok"))
        .select(
            id_col, (porthash.poly_hash(F.col("tok")) % n_features).alias("bucket")
        )
        .groupBy(id_col, "bucket")
        .agg(F.count("bucket").alias("c"))  # the null-bucket sentinel counts 0
        .join(F.broadcast(classifier_weights(spark, n_features)), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.col("c") * F.coalesce("w", F.lit(0))).alias("score_int"),
        )
    )
    score = F.round(
        F.col("score_int") / (F.lit(1000.0) * F.greatest("n_tokens", F.lit(1))), 6
    )
    return scored.select(
        F.col(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        score.alias("score"),
        (score > threshold).alias("keep"),
    )


def budget_pack(
    docs: DataFrame,
    token_budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Greedy corpus packing under a global TOKEN BUDGET: keep the
    highest-quality documents, in (quality_score DESC, id ASC) order, while
    the running token total stays ≤ ``token_budget`` — the selection step of
    a training-data mixing pipeline ("fill 1T tokens with the best of this
    crawl").

    The running total is a GLOBAL prefix sum, which naively is a
    single-partition window — the classic scale-killer. Here it is computed
    in three scale-safe steps:

    1. bucket rows by a VALUE-derived range key (``floor((1-quality)·B)``) —
       deterministic, no sampling, and bucket order == global quality order,
       so rows in bucket i all precede bucket i+1;
    2. per-bucket token subtotals (one tiny B-row aggregate) are
       prefix-summed on the driver — B is a constant (default 64), never a
       function of data size;
    3. a WITHIN-bucket running sum (window partitioned by bucket) plus the
       broadcast bucket offset gives every row its exact global prefix sum.

    No global window, no driver collect of data rows. Quality ties across a
    bucket boundary cannot split wrongly (equal scores always share a
    bucket); within a bucket the order is total via the id tiebreak.
    Output: (id, n_tokens, quality_score, cum_tokens) for the kept rows."""
    scored = quality_score(docs, text_col, id_col).select(
        id_col, "n_tokens", "quality_score"
    )
    b = F.least(
        F.floor((F.lit(1.0) - F.col("quality_score")) * n_buckets),
        F.lit(n_buckets - 1),
    ).cast("int")
    with_b = scored.withColumn("_b", F.greatest(b, F.lit(0)))
    totals = {
        r._b: r._t
        for r in with_b.groupBy("_b").agg(F.sum("n_tokens").alias("_t")).collect()
    }  # ≤ n_buckets rows — bounded by the constant, not the data
    offsets, run = [], 0
    for i in range(n_buckets):
        offsets.append((i, run))
        run += int(totals.get(i, 0))
    spark = docs.sparkSession
    off = F.broadcast(
        spark.createDataFrame(offsets, "_b int, _offset long")
    )
    w = (
        Window.partitionBy("_b")
        .orderBy(F.col("quality_score").desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        with_b.join(off, "_b")
        .withColumn("cum_tokens", (F.sum("n_tokens").over(w) + F.col("_offset")))
        .filter(F.col("cum_tokens") <= token_budget)
        .select(id_col, "n_tokens", "quality_score", "cum_tokens")
    )


def fingerprint(
    docs: DataFrame, n: int = 8, window: int = 4,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprint: rolling n-gram hashes, min per
    window of w consecutive positions, distinct selected hashes per doc.
    (Schleimer et al., SIGMOD'03 — the standard near-copy fingerprint.)
    Implemented with posexplode + a per-doc sliding window min.

    Gram hash: Rabin-Karp polynomial (functions/porthash.py) — the classic
    winnowing choice (MOSS uses a 32-bit rolling hash) AND cross-engine
    portable, so the fingerprint summary is value-checked by the DuckDB
    oracle; winnowing's coverage guarantee holds for any hash family."""
    # gram hashes computed from a per-doc char-code array (one split per
    # doc, n element_at + Horner per gram) instead of per-gram substr +
    # fold — same values, no per-gram allocation, O(L) not O(L^2)
    pos = (
        docs.filter(F.length(text_col) >= n)
        .select(
            F.col(id_col).alias("doc_id"),
            porthash.char_codes(F.col(text_col)).alias("_codes"),
        )
        .select(
            "doc_id",
            F.posexplode(
                porthash.ngram_poly_hashes(F.col("_codes"), n)
            ).alias("pos", "gh"),
        )
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(0, window - 1)
    )
    return (
        pos.withColumn("winmin", F.min("gh").over(w))
        .select("doc_id", F.col("winmin").alias("fp_hash"))
        .distinct()
    )


def fingerprint_summary(docs: DataFrame, **kw) -> DataFrame:
    """Per-doc fingerprint cardinality + xor-fold (a compact comparable id)."""
    fp = fingerprint(docs, **kw)
    return fp.groupBy("doc_id").agg(
        F.count("*").alias("n_fp"),
        F.min("fp_hash").alias("fp_min"),
        F.max("fp_hash").alias("fp_max"),
    )


# --- PII / contamination scan -------------------------------------------

# patterns chosen to parse identically under Java regex (Spark) and RE2
# (DuckDB): character classes, bounded repetition, no lookaround
PII_PATTERNS = {
    "n_emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "n_urls": r"https?://[^\s]+",
    "n_phones": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
    "n_digit_runs": r"[0-9]{4,}",
}


def pii_scan(
    docs: DataFrame,
    canaries: list[str] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document PII / contamination scan — the pre-release gate every
    training corpus runs: counts of email-, URL-, phone- and long-digit-run
    patterns plus a flag for verbatim eval-set canary strings. Pure column
    expressions (regexp_count is JVM-side, one projection, zero shuffle);
    the patterns are dialect-portable so the lane is value-checked against
    DuckDB via ``pii_scan_sql``. Redaction policy belongs to the caller —
    this lane only measures (filter / regexp_replace compose on top)."""
    cols = [F.col(id_col)]
    for name, pat in PII_PATTERNS.items():
        cols.append(F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(name))
    canary = F.lit(False)
    for c in canaries or []:
        canary = canary | F.col(text_col).contains(c)
    cols.append(canary.alias("has_canary"))
    return docs.select(*cols)


def pii_scan_sql(
    canaries: list[str] | None = None,
    table: str = "documents",
    text_expr: str = "text",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB mirror of ``pii_scan`` (len(regexp_extract_all) ==
    non-overlapping match count == regexp_count)."""
    cols = [id_expr]
    for name, pat in PII_PATTERNS.items():
        cols.append(
            f"CAST(len(regexp_extract_all({text_expr}, '{pat}')) AS BIGINT) AS {name}"
        )
    if canaries:
        flag = " OR ".join(
            f"position('{c}' IN {text_expr}) > 0" for c in canaries
        )
    else:
        flag = "FALSE"
    cols.append(f"({flag}) AS has_canary")
    return f"SELECT {', '.join(cols)} FROM {table}"


def vocab_topk(
    docs: DataFrame, k: int = 50, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus vocabulary top-k: token → TOTAL occurrence count across the
    corpus (every occurrence counts, not per-document distinct — a tokenizer
    build weights by frequency mass; callers needing document frequency add
    a per-doc ``distinct()`` before the groupBy), highest first (ties broken
    by token, so the cut is deterministic). Plan:
    explode → partial-aggregated groupBy → TakeOrdered(k) — the corpus never
    sorts globally; only k rows reach the driver. The input vocabulary
    pass every tokenizer build starts from."""
    toks = docs.select(F.explode(tokens_expr(text_col)).alias("tok"))
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(k)
    )


def winnow_pairs(
    docs: DataFrame,
    n: int = 8,
    window: int = 4,
    min_shared: int = 2,
    df_cap: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MOSS-style copy-detection pairs: documents sharing ≥ ``min_shared``
    winnowing fingerprints (Schleimer et al. SIGMOD'03 — the guarantee is
    that any shared substring of length ≥ n + window - 1 shares ≥ 1
    selected fingerprint, so real copies can't hide). ``df_cap`` drops
    fingerprints present in more than df_cap documents (shared boilerplate
    — the same Σdf² self-join bound as shingle dedup; at corpus scale
    ALWAYS set it). Output: (id_a, id_b, n_shared), id_a < id_b."""
    fp = fingerprint(docs, n=n, window=window, text_col=text_col, id_col=id_col)
    if df_cap is not None:
        rare = (
            fp.groupBy("fp_hash")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= df_cap)
            .select("fp_hash")
        )
        fp = fp.join(rare, "fp_hash", "left_semi")
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(b, "fp_hash")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


SEQPACK_MEMBER = 46  # affine member for the deterministic packing shuffle


def sequence_pack(
    docs: DataFrame,
    window_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Assign every document its position in the stream of fixed-size
    training windows ("sequence packing"): documents are laid end-to-end in
    a DETERMINISTIC shuffled order (the portable hash of the id — stable
    under re-runs and partitioning, unlike a seeded shuffle), and each gets
    its global token start offset, the window it starts in, and the offset
    within that window. Documents crossing a boundary simply span windows —
    the standard packing a data loader consumes.

    The global prefix sum uses the same scale-safe 3-step plan as
    ``budget_pack`` — value-range buckets (here: ranges of the uniform hash
    u, so bucket order == global shuffle order by construction), a
    driver-side prefix over the B bucket subtotals, and a within-bucket
    window — no global single-partition window at any size."""
    toks = docs.select(
        F.col(id_col),
        F.size(tokens_expr(text_col)).cast("long").alias("n_tokens"),
    )
    u = porthash.affine(
        F.pmod(F.col(id_col).cast("long"), F.lit(porthash.P)), SEQPACK_MEMBER
    ) / F.lit(float(porthash.P))
    with_b = toks.withColumn("_u", u).withColumn(
        "_b",
        F.least(F.floor(F.col("_u") * n_buckets), F.lit(n_buckets - 1))
        .cast("int"),
    )
    totals = {
        r._b: r._t
        for r in with_b.groupBy("_b").agg(F.sum("n_tokens").alias("_t")).collect()
    }  # ≤ n_buckets rows — bounded by the constant, not the data
    offsets, run = [], 0
    for i in range(n_buckets):
        offsets.append((i, run))
        run += int(totals.get(i, 0))
    spark = docs.sparkSession
    off = F.broadcast(spark.createDataFrame(offsets, "_b int, _offset long"))
    w = (
        Window.partitionBy("_b")
        .orderBy(F.col("_u").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) + F.col("_offset") - F.col("n_tokens"))
    return (
        with_b.join(off, "_b")
        .withColumn("start_offset", start)
        .select(
            id_col,
            "n_tokens",
            "start_offset",
            F.floor(F.col("start_offset") / window_tokens)
            .cast("long")
            .alias("window_id"),
            (F.col("start_offset") % window_tokens).alias("offset_in_window"),
        )
    )


PII_REPLACEMENTS = {
    "n_emails": "[EMAIL]",
    "n_urls": "[URL]",
    "n_phones": "[PHONE]",
}


def pii_redact(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redaction counterpart of ``pii_scan``: replace every email / URL /
    phone match with a typed placeholder, applied in a FIXED pattern order
    (order matters for overlapping matches — e.g. an email-shaped userinfo
    inside a URL — so the mirror must replay the identical sequence, which
    ``pii_redact_sql`` does). Long-digit runs are measured but NOT
    redacted: they are usually legitimate content (years, ids) — callers
    with stricter policy compose another regexp_replace. Pure JVM-side
    projection; DuckDB mirrors each rewrite with regexp_replace(..., 'g')."""
    out = F.col(text_col)
    for key in PII_REPLACEMENTS:
        out = F.regexp_replace(out, PII_PATTERNS[key], PII_REPLACEMENTS[key])
    return docs.select(
        F.col(id_col),
        out.alias("text_redacted"),
        F.length(text_col).cast("long").alias("n_chars_before"),
        F.length(out).cast("long").alias("n_chars_after"),
    )


def pii_redact_sql(
    table: str = "documents", text_expr: str = "text", id_expr: str = "doc_id"
) -> str:
    """DuckDB mirror of ``pii_redact`` (same patterns, same order)."""
    out = text_expr
    for key, repl in PII_REPLACEMENTS.items():
        out = f"regexp_replace({out}, '{PII_PATTERNS[key]}', '{repl}', 'g')"
    return (
        f"SELECT {id_expr}, {out} AS text_redacted, "
        f"CAST(length({text_expr}) AS BIGINT) AS n_chars_before, "
        f"CAST(length({out}) AS BIGINT) AS n_chars_after FROM {table}"
    )
