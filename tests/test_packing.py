"""Sequence packing invariants (operators/packing.py).

The driver entry value-checks both strategies against the DuckDB twin
(window cumsum / recursive CTE); these tests pin the packing *laws* the
hash comparison can't articulate: full assignment, budget respect,
straddle semantics, determinism, and the pure-Catalyst plan of the
overflow scale path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from saber_spark.operators import packing as pk
from saber_spark.operators import textops as tx
from saber_spark.sources.tables import load_table

BUDGET = 128
SHARDS = 4


@pytest.fixture(scope="module")
def docs(spark):
    return (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", tx.token_count("text").alias("n_tokens"))
        .cache()
    )


@pytest.fixture(scope="module", params=pk.STRATEGIES)
def packed(request, docs):
    return pk.pack_sequences(
        docs, BUDGET, n_shards=SHARDS, strategy=request.param
    ).cache()


def test_every_doc_assigned_exactly_once(docs, packed):
    n = docs.count()
    assert packed.count() == n
    assert packed.select("doc_id").distinct().count() == n


def test_offsets_consistent_within_sequence(packed):
    # within a (shard, seq_idx), docs in id order tile the sequence:
    # every non-first doc's offset is the previous doc's offset + tokens
    # (first-doc offset is strategy-specific: 0 for greedy, the
    # straddle carry-over for overflow — pinned by the tests below)
    from pyspark.sql import Window

    w = Window.partitionBy("shard", "seq_idx").orderBy("doc_id")
    with_prev = packed.withColumn(
        "prev_end", F.lag(F.col("off_tokens") + F.col("n_tokens")).over(w)
    )
    bad = with_prev.where(
        F.col("prev_end").isNotNull() & (F.col("off_tokens") != F.col("prev_end"))
    )
    assert bad.count() == 0


def test_greedy_never_exceeds_budget(docs):
    packed = pk.pack_sequences(docs, BUDGET, n_shards=SHARDS, strategy="greedy")
    per_seq = packed.groupBy("shard", "seq_idx").agg(
        F.sum("n_tokens").alias("total"), F.count(F.lit(1)).alias("n_docs")
    )
    # a sequence over budget is legal only as a single oversized doc
    bad = per_seq.where((F.col("total") > BUDGET) & (F.col("n_docs") > 1))
    assert bad.count() == 0


def test_overflow_straddles_by_at_most_one_doc(docs):
    packed = pk.pack_sequences(docs, BUDGET, n_shards=SHARDS, strategy="overflow")
    # every doc STARTS inside its budget window (off < budget) ...
    assert packed.where(F.col("off_tokens") >= BUDGET).count() == 0
    # ... and at most one doc per sequence runs past the boundary, and
    # it is the sequence's last doc (highest id)
    straddler = (F.col("off_tokens") + F.col("n_tokens")) > BUDGET
    per_seq = packed.groupBy("shard", "seq_idx").agg(
        F.sum(straddler.cast("int")).alias("n_straddle"),
        F.max("doc_id").alias("last_id"),
        F.max_by("doc_id", F.when(straddler, F.col("doc_id"))).alias("straddle_id"),
    )
    assert per_seq.where(F.col("n_straddle") > 1).count() == 0
    bad = per_seq.where(
        (F.col("n_straddle") == 1) & (F.col("straddle_id") != F.col("last_id"))
    )
    assert bad.count() == 0


def test_greedy_seq_indices_dense_from_zero(docs):
    # greedy opens sequences one at a time, so indices are dense per
    # shard; overflow bins by running offset, so an oversized doc can
    # legitimately skip bins — dense only claimed for greedy
    packed = pk.pack_sequences(docs, BUDGET, n_shards=SHARDS, strategy="greedy")
    per_shard = packed.groupBy("shard").agg(
        F.min("seq_idx").alias("lo"),
        F.max("seq_idx").alias("hi"),
        F.countDistinct("seq_idx").alias("n"),
    )
    bad = per_shard.where((F.col("lo") != 0) | (F.col("n") != F.col("hi") + 1))
    assert bad.count() == 0


def test_greedy_first_doc_of_sequence_starts_at_zero(docs):
    packed = pk.pack_sequences(docs, BUDGET, n_shards=SHARDS, strategy="greedy")
    firsts = packed.groupBy("shard", "seq_idx").agg(
        F.min_by("off_tokens", "doc_id").alias("first_off")
    )
    assert firsts.where(F.col("first_off") != 0).count() == 0


def test_strategies_agree_when_docs_tile_budget(spark):
    # docs of uniform size dividing the budget never straddle, so
    # overflow and greedy must produce the identical assignment
    rows = [(i, 32) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    a = pk.pack_sequences(df, BUDGET, n_shards=SHARDS, strategy="overflow")
    b = pk.pack_sequences(df, BUDGET, n_shards=SHARDS, strategy="greedy")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_oversized_doc_sits_alone_in_greedy(spark):
    rows = [(1, 50), (2, 500), (3, 50), (4, 60)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    packed = pk.pack_sequences(df, BUDGET, n_shards=1, strategy="greedy")
    by_id = {r["doc_id"]: r for r in packed.collect()}
    seq_of_big = by_id[2]["seq_idx"]
    mates = [r for r in by_id.values() if r["seq_idx"] == seq_of_big]
    assert len(mates) == 1 and by_id[2]["off_tokens"] == 0


def test_overflow_plan_is_pure_catalyst(docs):
    plan = (
        pk.pack_sequences(docs, BUDGET, n_shards=SHARDS, strategy="overflow")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FlatMapGroupsInPandas" not in plan
    assert "BatchEvalPython" not in plan


def test_sequence_stats(docs):
    packed = pk.pack_sequences(docs, BUDGET, n_shards=SHARDS, strategy="greedy")
    stats = pk.sequence_stats(packed, BUDGET).collect()[0]
    assert stats["n_docs"] == docs.count()
    assert 0 < stats["mean_fill"] <= 1.0
    assert stats["n_overflow"] == 0 or stats["max_seq_tokens"] > BUDGET


def test_materialize_sequences(spark, docs):
    full = load_table(spark, "/root/testdata/sf0.001", "documents")
    packed = pk.pack_sequences(docs, BUDGET, n_shards=SHARDS, strategy="greedy")
    seqs = pk.materialize_sequences(full, packed).cache()
    assert seqs.count() == packed.select("shard", "seq_idx").distinct().count()
    assert seqs.agg(F.sum("n_docs")).collect()[0][0] == docs.count()
    # whitespace-joined gather preserves the token accounting exactly
    bad = seqs.where(tx.token_count("seq_text") != F.col("seq_tokens"))
    assert bad.count() == 0


def test_validation():
    import pandas as pd  # noqa: F401 — ensures arrow path importable

    with pytest.raises(ValueError):
        pk.pack_sequences(None, 0)
    with pytest.raises(ValueError):
        pk.pack_sequences(None, 10, n_shards=0)
    with pytest.raises(ValueError):
        pk.pack_sequences(None, 10, strategy="best-fit")


# -- chunk_documents (RAG chunking) --------------------------------------------


def test_chunk_documents_matches_duckdb_twin(spark):
    import duckdb

    from tests.oracle import assert_matches_oracle

    full = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = pk.chunk_documents(full, chunk_tokens=16, overlap_tokens=4)
    duck = duckdb.connect()
    duck.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    assert_matches_oracle(
        got,
        duck,
        """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'),
                               t -> t <> '') AS tk
            FROM documents
        ),
        st AS (
            SELECT doc_id, tk, len(tk) AS n,
                   unnest(range(0, greatest(len(tk), 0), 12)) AS start_tok
            FROM toks WHERE len(tk) > 0
        )
        SELECT doc_id,
               CAST(start_tok / 12 AS INTEGER)                  AS chunk_idx,
               CAST(start_tok AS INTEGER)                       AS start_tok,
               CAST(least(16, n - start_tok) AS INTEGER)        AS n_tok,
               array_to_string(tk[start_tok + 1 : start_tok + 16], ' ')
                                                                AS chunk_text
        FROM st
        """,
    )


def test_chunk_documents_laws(spark):
    full = load_table(spark, "/root/testdata/sf0.001", "documents")
    chunks = pk.chunk_documents(full, chunk_tokens=16, overlap_tokens=4).cache()
    # every chunk is non-empty and within budget
    row = chunks.agg(
        F.min("n_tok").alias("lo"), F.max("n_tok").alias("hi")
    ).first()
    assert row["lo"] >= 1 and row["hi"] <= 16
    # consecutive chunks of one doc overlap by exactly 4 token positions
    assert (
        chunks.where(F.col("chunk_idx") > 0)
        .where(F.col("start_tok") != F.col("chunk_idx") * 12)
        .count()
        == 0
    )
    # reconstruction: stitching non-overlap prefixes + the last chunk's
    # tail reproduces every doc's token stream length
    from saber_spark.operators import textops as tx

    n_tokens = full.select(
        "doc_id", tx.token_count("text").alias("n")
    )
    covered = chunks.groupBy("doc_id").agg(
        (F.max(F.col("start_tok") + F.col("n_tok"))).alias("covered")
    )
    bad = n_tokens.join(covered, "doc_id").where(
        (F.col("n") > 0) & (F.col("covered") != F.col("n"))
    )
    assert bad.count() == 0
    # no UDFs: the whole operator is one Catalyst projection
    plan = chunks._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "Python" not in plan
    with pytest.raises(ValueError, match="overlap"):
        pk.chunk_documents(full, chunk_tokens=8, overlap_tokens=8)
