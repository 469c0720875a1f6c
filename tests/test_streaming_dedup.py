"""Streaming near-duplicate detection (streaming/dedup.py): per-row
minhash parity with the batch grouped form, and stream-vs-batch parity
of the full LSH index -> candidate join -> Jaccard-verify pipeline."""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F

from saber_spark.operators.dedup import (
    minhash_signatures_wide,
    row_minhashes,
)
from saber_spark.streaming.dedup import lsh_index, streaming_near_dup_matches
from tests.conftest import SF_SMOKE

TMP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp"
)


def _docs(spark, lo: int, hi: int):
    return (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        .select("doc_id", "text")
    )


def test_row_minhashes_match_grouped_signatures(spark):
    """array_min-over-shingles == min-aggregate-over-exploded-postings,
    column for column — the invariant that lets the stream side skip
    the groupBy entirely."""
    docs = _docs(spark, 0, 60)
    grouped = {
        r["_id"]: [r[f"_m{j}"] for j in range(16)]
        for r in minhash_signatures_wide(docs).collect()
    }
    per_row = {
        r["_id"]: [r[f"_m{j}"] for j in range(16)]
        for r in docs.select(
            F.col("doc_id").alias("_id"), *row_minhashes("text")
        ).collect()
    }
    assert per_row == grouped and len(grouped) == 60


def _staged_queries(spark, corpus):
    """30 query docs: 10 exact corpus copies, 10 prefix-mutated corpus
    docs, 10 disjoint fresh docs — ids offset so no self-pairs, a
    deterministic minute-spaced event time each."""
    exact = corpus.where(F.col("doc_id") % 10 == 3).limit(10).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    mutated = corpus.where(F.col("doc_id") % 10 == 7).limit(10).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.lit("prefix drift token "), F.col("text")).alias("text"),
    )
    fresh = spark.range(10).select(
        (F.col("id") + 300000).alias("doc_id"),
        F.concat(
            F.lit("entirely unrelated content block number "),
            F.col("id").cast("string"),
            F.lit(" zz qq xx yy ww vv uu tt ss rr"),
        ).alias("text"),
    )
    return (
        exact.unionByName(mutated)
        .unionByName(fresh)
        .withColumn(
            "ts",
            F.expr(
                "timestamp_ntz'2024-01-01 00:00:00' "
                "+ make_interval(0,0,0,0,0,cast(doc_id % 1000 as int),0)"
            ),
        )
    )


def test_streaming_near_dup_matches_batch_parity(spark):
    """Streamed matches == the same plan run in batch, row for row; the
    exact copies all surface with jaccard 1.0 and the fresh docs never
    match."""
    corpus = _docs(spark, 0, 150)
    queries = _staged_queries(spark, corpus)

    path = os.path.join(TMP, "neardup_stream")
    shutil.rmtree(path, ignore_errors=True)
    # three chronological chunks so the run spans micro-batches
    for i, bucket in enumerate((0, 1, 2)):
        queries.where(F.col("doc_id") % 3 == bucket).coalesce(1).write.parquet(
            os.path.join(path, f"chunk={i:03d}")
        )

    index = lsh_index(corpus).persist()
    kwargs = dict(threshold=0.5, rows_per_band=1, index=index)

    # batch leg reads the staged files back: _staged_queries has an
    # unordered limit(10), so a fresh evaluation could pick different
    # rows than the ones written above
    staged = spark.read.parquet(f"{path}/chunk=*")
    want = streaming_near_dup_matches(staged, corpus, **kwargs).toPandas()

    stream = (
        spark.readStream.schema("doc_id bigint, text string, ts timestamp_ntz")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{path}/chunk=*")
    )
    out = streaming_near_dup_matches(stream, corpus, **kwargs)
    shutil.rmtree(os.path.join(TMP, "ckpt_neardup"), ignore_errors=True)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("neardup")
        .option("checkpointLocation", os.path.join(TMP, "ckpt_neardup"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT doc_id, dup_of, jaccard FROM neardup"
        ).toPandas()
    finally:
        q.stop()
    index.unpersist()

    cols = ["doc_id", "dup_of", "jaccard"]
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = want[cols].sort_values(cols).reset_index(drop=True)
    assert got.equals(want)

    # the 10 exact copies match their source at jaccard 1.0
    exact = want[(want.doc_id >= 100000) & (want.doc_id < 200000)]
    hits = set(
        exact[exact.jaccard == 1.0].itertuples(index=False, name=None)
    )
    assert {(d, d - 100000) for d in exact.doc_id} <= {
        (a, b) for a, b, _ in hits
    } or len(exact[exact.jaccard == 1.0]) >= 10
    # fresh docs never match anything
    assert (want.doc_id < 300000).all()


_NEARDUP_ORACLE = """
WITH q0 AS (SELECT doc_id, text FROM read_parquet('{qglob}')),
c0 AS (
    SELECT doc_id, text FROM read_parquet('{corpus}')
    WHERE doc_id >= 0 AND doc_id < 150
),
qs AS (
    SELECT doc_id, list_distinct(sh) AS shingles FROM (
        SELECT doc_id,
               CASE WHEN len(w) >= 3
                    THEN list_transform(range(1, len(w) - 1),
                                        i -> array_to_string(w[i:i+2], ' '))
                    ELSE [array_to_string(w, ' ')] END AS sh
        FROM (SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)),
                                                 '\\s+', ' ', 'g'), ' ') AS w
              FROM q0))
),
cs AS (
    SELECT doc_id, list_distinct(sh) AS shingles FROM (
        SELECT doc_id,
               CASE WHEN len(w) >= 3
                    THEN list_transform(range(1, len(w) - 1),
                                        i -> array_to_string(w[i:i+2], ' '))
                    ELSE [array_to_string(w, ' ')] END AS sh
        FROM (SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)),
                                                 '\\s+', ' ', 'g'), ' ') AS w
              FROM c0))
),
qp AS (SELECT doc_id, unnest(shingles) AS s FROM qs),
cp AS (SELECT doc_id, unnest(shingles) AS s FROM cs),
qn AS (SELECT doc_id, count(*) AS n FROM qp GROUP BY 1),
cn AS (SELECT doc_id, count(*) AS n FROM cp GROUP BY 1),
common AS (
    SELECT qp.doc_id AS qid, cp.doc_id AS cid, count(*) AS c
    FROM qp JOIN cp ON qp.s = cp.s AND qp.doc_id <> cp.doc_id
    GROUP BY 1, 2
)
SELECT qid AS doc_id, cid AS dup_of,
       round(c / (qn.n + cn.n - c), 6) AS jaccard
FROM common
JOIN qn ON qn.doc_id = qid
JOIN cn ON cn.doc_id = cid
WHERE c / (qn.n + cn.n - c) >= 0.5
"""


def test_streaming_near_dup_matches_duckdb_oracle(spark, duck):
    """Independent value-level oracle: the pipeline's verified pairs ==
    ALL (query, corpus) pairs with exact shingle-Jaccard >= 0.5,
    recomputed from the staged parquet by DuckDB with no shared code.
    This breaks the stream==batch symmetry of the parity test (both
    sides there share the Spark plan) AND certifies that r=1 x k=16
    banding loses no qualifying pair on this corpus — the same
    corpus-independent-recall argument the batch `minhash_lsh` driver
    oracle rests on."""
    corpus = _docs(spark, 0, 150)
    queries = _staged_queries(spark, corpus)

    path = os.path.join(TMP, "neardup_oracle_q")
    shutil.rmtree(path, ignore_errors=True)
    queries.coalesce(1).write.parquet(path)
    # re-read so Spark and DuckDB see the SAME materialized rows
    # (_staged_queries has a limit(10), unordered by design)
    staged = spark.read.parquet(path)

    got = (
        streaming_near_dup_matches(
            staged, corpus, threshold=0.5, rows_per_band=1
        )
        .select("doc_id", "dup_of", "jaccard")
        .toPandas()
        .sort_values(["doc_id", "dup_of"])
        .reset_index(drop=True)
    )
    want = (
        duck.execute(
            _NEARDUP_ORACLE.format(
                qglob=f"{path}/*.parquet",
                corpus=f"{SF_SMOKE}/documents.parquet",
            )
        )
        .df()
        .sort_values(["doc_id", "dup_of"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert (got.doc_id.values == want.doc_id.values).all()
    assert (got.dup_of.values == want.dup_of.values).all()
    assert (abs(got.jaccard.values - want.jaccard.values) < 1e-6).all()
