"""Streaming near-duplicate detection against an indexed corpus — the
MinHash-LSH twin of ``streaming_exact_dedup``: tag documents on a live
ingest with the already-indexed corpus documents they near-duplicate,
without ever scanning the corpus per micro-batch.

Plan shape (every join is stream-static; per-batch cost tracks
CANDIDATES, never corpus size):

1. **Index, built once in batch** (``lsh_index``): banded minhash
   postings (band, band_key) -> corpus id. At 100 TB the index is a
   table partitioned/bucketed by band key; here it is a DataFrame the
   planner hash-joins each micro-batch.
2. **Stream-side signatures are per-row expressions**
   (``row_minhashes``: ``array_min`` over the shingle array) — no
   explode+groupBy, so no aggregation state and no shuffle; the k
   md5-minhashes and the band keys evaluate inside whole-stage codegen.
   Band construction shares ``band_structs`` with the batch operator,
   so keys match bit-for-bit.
3. **Candidates** = equi-join on (band, band_key) — the LSH S-curve
   does the pruning, exactly like the batch
   ``minhash_lsh_candidates``. Pairs sharing several bands are deduped
   with ``dropDuplicatesWithinWatermark`` — state bounded by the
   watermark horizon (the ``streaming_exact_dedup`` bound), not stream
   life (dedup state stores the key tuple, not the row). At-scale note:
   the stream carries its text through the k/r band rows, so if the
   index is too big to broadcast the candidate shuffle moves each
   streamed doc's text k/r times; with the default k=16, r=2 that is a
   bounded 8× on the INGEST (small) side only — the corpus side ships
   ids, never text, and verification re-joins text for candidates only.
4. **Verification on candidates only**: the corpus text joins back by
   id (stream-static) and exact shingle-Jaccard is computed as
   ``|array_intersect| / |array_union|`` of the two distinct-shingle
   arrays — same sets the batch ``jaccard_pairs`` measures via its
   posting self-join, vectorized per pair, zero Python.

Emits one row per verified (streamed doc, corpus doc) pair at or above
``threshold``. Batch parity is pytest-pinned by running the identical
plan on the staged data as a batch DataFrame.

Reference analogue: none (Saber has no dedup surface; the brief's
LLM-pipeline operators) — extends the batch family in
``operators/dedup.py:183`` to the ingest path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from saber_spark.operators.dedup import (
    band_structs,
    minhash_signatures_wide,
    row_minhashes,
)
from saber_spark.operators.textops import word_shingles


def lsh_index(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 16,
    rows_per_band: int = 2,
) -> DataFrame:
    """Static banded posting index (index_id, _band, _bk): k/r rows per
    corpus doc. Built once (one scan + one shuffle); persist it or
    write it to a table keyed on the band columns for reuse across
    micro-batches and restarts."""
    if k % rows_per_band != 0:
        raise ValueError(f"rows_per_band {rows_per_band} must divide k {k}")
    wide = minhash_signatures_wide(corpus, id_col, text_col, n, k)
    return wide.select(
        F.col("_id").alias("index_id"),
        F.explode(band_structs(k, rows_per_band)).alias("_x"),
    ).select("index_id", F.col("_x._band").alias("_band"), F.col("_x._bk").alias("_bk"))


def streaming_near_dup_matches(
    stream: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "30 minutes",
    n: int = 3,
    k: int = 16,
    rows_per_band: int = 2,
    threshold: float = 0.5,
    index: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, ts, dup_of, jaccard) for every streamed document whose
    shingle-Jaccard with an indexed corpus document reaches
    ``threshold`` (candidates via banded LSH — recall follows the
    banding S-curve, see ``minhash_lsh_candidates``). Self-pairs
    (same id on both sides, e.g. a replayed corpus doc) are dropped.

    Works identically on a batch DataFrame (the parity path): the only
    streaming-specific operator, candidate dedup, degrades to a plain
    ``dropDuplicates``.
    """
    if index is None:
        index = lsh_index(corpus, id_col, text_col, n, k, rows_per_band)
    mh = row_minhashes(text_col, n, k)
    bands = stream.select(
        F.col(id_col).alias("_sid"),
        F.col(ts_col).cast("timestamp").alias("_ts"),
        F.col(text_col).alias("_stext"),
        F.explode(band_structs(k, rows_per_band, lambda i: mh[i])).alias("_x"),
    ).select(
        "_sid", "_ts", "_stext",
        F.col("_x._band").alias("_band"), F.col("_x._bk").alias("_bk"),
    )
    cand = bands.join(index, ["_band", "_bk"]).where(
        F.col("_sid") != F.col("index_id")
    )
    if cand.isStreaming:
        cand = cand.withWatermark("_ts", watermark).dropDuplicatesWithinWatermark(
            ["_sid", "index_id"]
        )
    else:
        cand = cand.dropDuplicates(["_sid", "index_id"])
    ctext = corpus.select(
        F.col(id_col).alias("index_id"), F.col(text_col).alias("_itext")
    )
    sh_s, sh_i = word_shingles("_stext", n), word_shingles("_itext", n)
    return (
        cand.join(ctext, "index_id")
        .select(
            F.col("_sid").alias(id_col),
            F.col("_ts").alias(ts_col),
            F.col("index_id").alias("dup_of"),
            F.round(
                F.size(F.array_intersect(sh_s, sh_i))
                / F.size(F.array_union(sh_s, sh_i)),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
