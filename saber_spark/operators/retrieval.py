"""Keyword-retrieval operators for training-data curation: BM25 scoring
and exact heavy-hitter vocabulary mining over a document corpus.

Outside the reference's operator set (SURVEY.md §2.3 — its scalar
surface is arithmetic only) but first-class for an LLM-data engine:
quality-weighted keyword retrieval is how curation pipelines pull
topic-targeted subsets out of a 100 TB corpus, and heavy-hitter terms
drive stopword/boilerplate detection.

Scale design
------------
``bm25_topk`` never shuffles the corpus. The query is a small literal
term list, so per-term term frequencies are pure Catalyst array
expressions evaluated in the scan stage; corpus statistics (N, avgdl,
per-term document frequency) reduce to ONE single-row partial-merged
aggregate that is broadcast back via a 1-row cross join. The final
top-k is `TakeOrderedAndProject` (per-partition heap + driver merge of
k rows), not a global sort. Cost at 100 TB: two codegen'd scans, zero
wide exchanges.

``heavy_hitter_terms`` is the exact two-phase frequency mine: explode
per-doc DISTINCT terms (so a doc spamming one word counts once),
hash-aggregate on the term (map-side partials collapse the explosion
before the exchange — |vocab| rows cross the wire, not |corpus×terms|),
threshold, top-n.

Both have exact DuckDB twins (list lambdas / unnest) and are
value-checked against them in tests/test_retrieval.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textops import words

__all__ = ["bm25_topk", "heavy_hitter_terms"]


def _tf(w: Column, term: str) -> Column:
    """Occurrences of `term` in the tokenized text — an array expression,
    no UDF. DuckDB twin: len(list_filter(w, x -> x = 'term'))."""
    return F.size(F.filter(w, lambda x: x == F.lit(term)))


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 score for a bag-of-words query.

    Okapi BM25 (Robertson et al., public formulation):
        idf(t)   = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
        score(d) = Σ_t idf(t) · tf · (k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))

    Returns (id_col, score) — k rows, score desc, id asc tiebreak.
    Docs matching no term are pruned map-side before the top-k.
    """
    if not query_terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("bm25_topk: query_terms must be distinct")

    tok = docs.select(
        F.col(id_col), words(text_col).alias("_w")
    ).withColumn("_dl", F.size("_w"))

    # One single-row aggregate for every corpus statistic the scorer
    # needs: partial aggregation collapses it map-side, and the 1-row
    # result broadcasts back for free.
    stats = tok.agg(
        F.count(F.lit(1)).cast("double").alias("_n_docs"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.sum(F.array_contains("_w", t).cast("int"))
            .cast("double")
            .alias(f"_df_{i}")
            for i, t in enumerate(query_terms)
        ],
    )

    scored = tok.crossJoin(F.broadcast(stats))
    per_term = []
    for i, t in enumerate(query_terms):
        tf = _tf(F.col("_w"), t).cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n_docs") - F.col(f"_df_{i}") + F.lit(0.5))
            / (F.col(f"_df_{i}") + F.lit(0.5))
        )
        norm = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl")
        )
        per_term.append(idf * tf * F.lit(k1 + 1.0) / norm)

    score = per_term[0]
    for c in per_term[1:]:
        score = score + c

    # rank on the 6dp-rounded score: ln() is only faithfully rounded, so
    # JVM vs libm can disagree by an ulp — ranking raw scores would let
    # the k-boundary row SET differ across engines; rounded, the order
    # (and the cut) is decided by (score6, id) identically everywhere
    return (
        scored.select(F.col(id_col), F.round(score, 6).alias("score"))
        .where(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def heavy_hitter_terms(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_doc_frac: float = 0.5,
    top_n: int = 50,
) -> DataFrame:
    """Terms appearing in ≥ `min_doc_frac` of documents (exact, not a
    sketch): per-doc DISTINCT terms exploded, hash-aggregated on the
    term. Map-side combine means only |vocab| partial rows shuffle.
    The document-count denominator is a 1-row broadcast cross join, so
    the whole plan has one wide exchange.

    Returns (term, doc_freq, doc_frac) — top_n rows, doc_freq desc,
    term asc tiebreak.
    """
    if not (0.0 < min_doc_frac <= 1.0):
        raise ValueError("heavy_hitter_terms: min_doc_frac must be in (0, 1]")

    terms = docs.select(
        F.explode(F.array_distinct(words(text_col))).alias("term")
    ).where(F.col("term") != "")
    total = docs.agg(F.count(F.lit(1)).cast("double").alias("_n_docs"))
    return (
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .crossJoin(F.broadcast(total))
        .withColumn("doc_frac", F.col("doc_freq") / F.col("_n_docs"))
        .where(F.col("doc_frac") >= min_doc_frac)
        .select("term", "doc_freq", "doc_frac")
        .orderBy(F.desc("doc_freq"), F.asc("term"))
        .limit(top_n)
    )
