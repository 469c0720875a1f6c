"""Text-analysis operators for training-data pipelines.

Outside the reference's scope (its scalar surface is arithmetic only —
SURVEY.md §2.3) but first-class for a transcript/document engine at
100 TB: language-ID, quality scoring, token counting, fingerprinting.

All operators are pure Catalyst column expressions (no UDFs): they
codegen into the scan stage and cost one pass over the text. Each has a
DuckDB-replicable definition so the driver value-checks them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_text(col: str | Column) -> Column:
    """lower + collapse whitespace + trim (SQL twin: LOWER/TRIM +
    regexp_replace(.., '\\s+', ' ', 'g'))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def words(col: str | Column) -> Column:
    return F.split(normalize_text(col), " ")


def word_shingles(col: str | Column, n: int = 3) -> Column:
    """Distinct n-word shingles; whole text if shorter than n words."""
    w = words(col)
    shingled = F.transform(
        F.sequence(F.lit(1), F.size(w) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(w, i, n)),
    )
    return F.array_distinct(
        F.when(F.size(w) >= n, shingled).otherwise(F.array(F.concat_ws(" ", w)))
    )


def char_ngrams(col: str | Column, n: int = 8) -> Column:
    """Distinct character n-grams of the normalized text."""
    t = normalize_text(col)
    return F.array_distinct(
        F.when(
            F.length(t) >= n,
            F.transform(
                F.sequence(F.lit(1), F.length(t) - (n - 1)),
                lambda i: F.substring(t, i, n),
            ),
        ).otherwise(F.array(t))
    )


def token_count(col: str | Column) -> Column:
    """Whitespace token count."""
    return F.size(words(col))


def bpe_ish_token_count(col: str | Column) -> Column:
    """BPE-ish proxy: alpha runs + digit runs + single punctuation marks
    each count as one token (same RE2/Java-regex-compatible pattern as
    the SQL oracle)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0))


#: stopwords for quality scoring / language scoring (deterministic list)
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on")

_LANG_MARKERS = {
    "en": ("the", "data", "is"),
    "de": ("der", "und", "das"),
    "es": ("el", "los", "que"),
    "fr": ("le", "les", "est"),
    "zh": ("zh0", "zh1", "zh2"),  # placeholder markers (synthetic corpus)
}


def _count_word(w: Column, target: str) -> Column:
    return F.size(F.filter(w, lambda x: x == F.lit(target)))


def stopword_ratio(col: str | Column) -> Column:
    w = words(col)
    cnt = None
    for s in STOPWORDS:
        c = _count_word(w, s)
        cnt = c if cnt is None else cnt + c
    return F.round(cnt / F.size(w), 6)


def quality_score(col: str | Column) -> Column:
    """Deterministic [0,1] quality heuristic: length band + stopword
    presence + punctuation sparsity + mean word length band. The exact
    formula is the contract (SQL twin in pipeline_queries.py)."""
    c = F.col(col) if isinstance(col, str) else col
    t = normalize_text(c)
    w = words(c)
    n_chars = F.length(t)
    n_words = F.size(w)
    mean_wl = (n_chars - (n_words - 1)) / n_words  # chars minus separators
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[^a-z0-9\s]", ""))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    score = (
        F.when((n_chars >= 50) & (n_chars <= 2000), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(stopword_ratio(c) > 0.02, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(punct_ratio < 0.1, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((mean_wl >= 3) & (mean_wl <= 12), F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return F.round(score, 2)


def lang_scores(col: str | Column) -> dict[str, Column]:
    """Marker-word frequency score per language (n-gram heuristic)."""
    w = words(col)
    return {
        lang: sum((_count_word(w, m) for m in markers), F.lit(0)) / F.size(w)
        for lang, markers in _LANG_MARKERS.items()
    }


def predicted_lang(col: str | Column) -> Column:
    """argmax of lang_scores, ties broken by language-code order; all-zero
    scores fall back to 'und'."""
    scores = lang_scores(col)
    langs = sorted(scores)
    best = None
    best_score = None
    for lang in langs:
        s = scores[lang]
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def fingerprint(col: str | Column, ngram: int = 8) -> Column:
    """Winnowing-style document fingerprint: the lexicographic minimum of
    md5(char-8-gram) over the normalized text — a rolling-hash content
    fingerprint robust to local edits (equal for docs sharing their
    minimal gram)."""
    grams = char_ngrams(col, ngram)
    return F.array_min(F.transform(grams, lambda g: F.md5(g)))


#: hex digits of md5 parsed into the bucket value. 8 digits span 2^32
#: values, so the modulo bias for n_buckets=1000 is (2^32 mod 1000)/2^32
#: ≈ 7e-8 — negligible (4 digits = 65536 values gave buckets 0-535 a
#: ~1.5% over-representation).
MD5_BUCKET_DIGITS = 8


def md5_bucket(col: Column | str, n_buckets: int = 1000) -> Column:
    """Deterministic, engine-portable hash bucket in [0, n_buckets):
    the first 8 hex digits of md5 parsed positionally (instr arithmetic
    — identical in DuckDB), mod n_buckets. The primitive behind
    reproducible sampling: the same row lands in the same bucket in any
    engine, at any parallelism, forever."""
    from saber_spark.operators.dedup import _hex_digit

    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(c.cast("string"))
    val = None
    for i in range(1, MD5_BUCKET_DIGITS + 1):
        d = _hex_digit(h, i).cast("long")  # 16^8 > 2^31: accumulate in long
        val = d if val is None else val * 16 + d
    return F.pmod(val, F.lit(n_buckets))


#: PII patterns, applied longest/most-specific first so substrings of an
#: already-redacted span don't double-match (e.g. the last 4 digits of a
#: redacted card matching the zip-ish rule). Pure regexp_replace chain —
#: codegens into the scan like every other textop.
PII_PATTERNS: list[tuple[str, str]] = [
    # emails before anything that could eat their digits
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # 13-19 digit runs with optional space/dash separators (card-ish)
    (r"\b(?:\d[ -]?){13,19}\b", "<CARD>"),
    # SSN-shaped 3-2-4
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # IPv4 BEFORE phone: dotted octets would otherwise match the
    # phone shape's dot-separated digit groups
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # phone-ish: optional +country, separators, 7-11 digits total
    (r"(?:\+?\d{1,3}[ .-]?)?(?:\(\d{2,4}\)[ .-]?)?\d{3}[ .-]\d{3,4}[ .-]?\d{0,4}\b",
     "<PHONE>"),
]


def redact_pii(col: str | Column) -> Column:
    """Replace common PII shapes (emails, card/SSN/phone-like digit runs,
    IPv4) with typed placeholder tokens — the scrubbing stage of a
    training-data pipeline. Regex heuristics by design: recall-oriented,
    deterministic, single pass; a production pipeline layers an NER model
    behind the same column contract (text in → text out). Pure Catalyst,
    so it fuses into the scan with the other curation gates."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c


# Gopher-style repetition thresholds (Rae et al. 2021, table A1 spirit):
# a doc is kept only if no single word dominates, the vocabulary is not
# degenerate, and no bigram loops. Computed from the ROUNDED fractions so
# the keep decision is identical on any engine.
TOP_WORD_FRAC_MAX = 0.2
DISTINCT_WORD_RATIO_MIN = 0.3
TOP_BIGRAM_FRAC_MAX = 0.18


def repetition_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Repetition / boilerplate filters over a document corpus: per doc,
    the most-frequent-word fraction, distinct-word ratio, and
    most-frequent-bigram fraction, plus the keep decision under the
    module thresholds — the repetition-removal gate of a training-data
    curation pipeline (quality_score catches junk, this catches loops).

    Scale shape: explode-then-aggregate — token counts partial-aggregate
    map-side before the (id, token) shuffle, the per-doc reduction is a
    second partial-aggregated groupBy, and the word/bigram branches join
    back on the id hash. Row volume is O(total tokens), the same order
    as reading the text; no driver-side state.
    """
    i = F.col(id_col)
    base = df.select(i, words(text_col).alias("ws"))
    grams = base.select(
        i,
        F.col("ws"),
        F.when(
            F.size("ws") >= 2,
            F.expr(
                "transform(sequence(1, size(ws)-1),"
                " k -> concat(element_at(ws, k), ' ', element_at(ws, k+1)))"
            ),
        ).otherwise(F.array().cast("array<string>")).alias("bs"),
    )
    wagg = (
        grams.select(i, F.explode("ws").alias("t"))
        .groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col).agg(
            F.sum("c").alias("n_words"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("top_word_n"),
        )
    )
    bagg = (
        grams.select(i, F.explode("bs").alias("g"))
        .groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col).agg(
            F.sum("c").alias("n_bigrams"),
            F.max("c").alias("top_bigram_n"),
        )
    )
    prof = wagg.join(bagg, id_col, "left").select(
        i,
        F.col("n_words").cast("long").alias("n_words"),
        F.round(F.col("top_word_n") / F.col("n_words"), 6).alias("top_word_frac"),
        F.round(F.col("n_distinct") / F.col("n_words"), 6).alias("distinct_word_ratio"),
        F.round(
            F.coalesce(F.col("top_bigram_n") / F.col("n_bigrams"), F.lit(0.0)), 6
        ).alias("top_bigram_frac"),
    )
    return prof.withColumn(
        "keep",
        (F.col("top_word_frac") <= TOP_WORD_FRAC_MAX)
        & (F.col("distinct_word_ratio") >= DISTINCT_WORD_RATIO_MIN)
        & (F.col("top_bigram_frac") <= TOP_BIGRAM_FRAC_MAX),
    )
