"""BM25 retrieval + heavy-hitter terms vs exact DuckDB twins."""

from __future__ import annotations

import pytest

from tests.oracle import assert_matches_oracle

TERMS = ["spark", "window", "stream"]
K1, B = 1.2, 0.75


def _bm25_oracle(k: int) -> str:
    tf = {t: f"len(list_filter(w, x -> x = '{t}'))::double" for t in TERMS}
    df = {
        t: f"sum(CASE WHEN list_contains(w, '{t}') THEN 1 ELSE 0 END)::double"
        for t in TERMS
    }
    per_term = " + ".join(
        f"(ln(1 + (n_docs - df_{t} + 0.5) / (df_{t} + 0.5))"
        f" * tf_{t} * {K1 + 1.0}"
        f" / (tf_{t} + {K1} * ({1.0 - B} + {B} * dl / avgdl)))"
        for t in TERMS
    )
    return f"""
WITH d AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents
), tokd AS (
  SELECT doc_id, w, len(w)::double AS dl,
         {', '.join(f"{tf[t]} AS tf_{t}" for t in TERMS)}
  FROM d
), stats AS (
  SELECT count(*)::double AS n_docs, avg(len(w))::double AS avgdl,
         {', '.join(f"{df[t]} AS df_{t}" for t in TERMS)}
  FROM d
), scored AS (
  -- round(.,6) before the cut, mirroring the operator's cross-engine
  -- k-boundary contract
  SELECT doc_id, round({per_term}, 6) AS score
  FROM tokd CROSS JOIN stats
)
SELECT doc_id, score FROM scored WHERE score > 0
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


HEAVY_ORACLE = """
WITH terms AS (
  SELECT doc_id, unnest(list_distinct(
    string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')
  )) AS term
  FROM documents
), counted AS (
  SELECT term, count(*)::bigint AS doc_freq
  FROM terms WHERE term <> '' GROUP BY term
), total AS (SELECT count(*)::double AS n_docs FROM documents)
SELECT term, doc_freq, doc_freq / n_docs AS doc_frac
FROM counted CROSS JOIN total
WHERE doc_freq / n_docs >= 0.5
ORDER BY doc_freq DESC, term ASC LIMIT 50
"""


def test_bm25_topk_matches_oracle(spark, duck):
    from saber_spark.operators.retrieval import bm25_topk
    from saber_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    got = bm25_topk(docs, TERMS, k=25)
    assert_matches_oracle(got, duck, _bm25_oracle(25), rel_tol=1e-9)


def test_bm25_plan_has_no_wide_exchange(spark):
    """The corpus side must never shuffle: the only exchanges allowed
    are the 1-row stats broadcast; the top-k must be
    TakeOrderedAndProject, not a global Sort."""
    from saber_spark.operators.retrieval import bm25_topk
    from saber_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = (
        bm25_topk(docs, TERMS, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line:
            raise AssertionError(f"unexpected wide exchange in BM25 plan: {line}")


def test_bm25_guards(spark):
    from saber_spark.operators.retrieval import bm25_topk
    from saber_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    with pytest.raises(ValueError):
        bm25_topk(docs, [])
    with pytest.raises(ValueError):
        bm25_topk(docs, ["spark", "spark"])


def test_heavy_hitter_terms_matches_oracle(spark, duck):
    from saber_spark.operators.retrieval import heavy_hitter_terms
    from saber_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    got = heavy_hitter_terms(docs, min_doc_frac=0.5, top_n=50)
    assert_matches_oracle(got, duck, HEAVY_ORACLE, rel_tol=1e-9)
