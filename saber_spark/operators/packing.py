"""Sequence packing: assemble variable-length documents into
fixed-token-budget training sequences.

The reference engine has no packing operator — this extends the
training-data-pipeline surface the task brief asks for (the step after
curation: packed sequences are what actually feeds a trainer). The
design constraint at 100 TB is that strict sequential bin-packing is
order-dependent state, so the corpus is first hash-sharded with the
portable ``md5_bucket`` primitive (same row → same shard in any engine,
at any parallelism) and packing runs independently per shard. ``n_shards``
is the parallelism/state knob: at cluster scale you pick it so one
shard's (id, n_tokens) pairs fit an executor (the *text* never moves —
packing assigns ids to sequences; the gather join happens afterwards,
shuffling each doc once to its sequence).

Two strategies, same output contract:

- ``overflow`` — the closed-form scale path, pure Catalyst. Docs are
  ordered by id within their shard and binned by running token offset:
  ``seq_idx = floor(cum_tokens_before / budget)``. A document whose
  span crosses a budget boundary stays in the bin where it starts, so
  a sequence can overflow by at most one document (the trainer
  truncates or the gather splits the straddler). In exchange the whole
  assignment is one shuffle-by-shard + sort-within + window cumsum —
  no sequential Python state, AQE-splittable, map-side prunable.

- ``greedy`` — strict first-fit-sequential: a document never straddles
  a boundary; one that would overflow opens the next sequence, and a
  document longer than the budget sits alone in its own sequence.
  Inherently a left-to-right scan, so it runs as one vectorless pass
  per shard under ``applyInPandas`` (Arrow-batched; state is two ints).
  The semantic oracle / highest-fill path; shard size bounds memory.

Both return one row per document: ``(shard, <id>, n_tokens, seq_idx,
off_tokens)`` where ``off_tokens`` is the doc's starting offset inside
its sequence — enough for a downstream gather to materialize sequences
deterministically.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from saber_spark.operators.textops import md5_bucket

STRATEGIES = ("overflow", "greedy")


def pack_sequences(
    df: DataFrame,
    token_budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_shards: int = 8,
    strategy: str = "overflow",
) -> DataFrame:
    """Assign each document to a (shard, seq_idx) training sequence of at
    most ``token_budget`` tokens (see module docstring for the two
    strategies' boundary semantics). ``df`` needs ``id_col`` (unique,
    orderable) and ``tokens_col`` (non-negative int); ordering within a
    shard is by ``id_col``, so the packing is deterministic and
    reproducible across engines and parallelism levels.
    """
    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive, got {token_budget}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    if strategy not in STRATEGIES:
        raise ValueError(f"strategy must be one of {STRATEGIES}, got {strategy!r}")

    base = df.select(
        md5_bucket(F.col(id_col), n_shards).cast("int").alias("shard"),
        F.col(id_col),
        F.col(tokens_col).cast("int").alias("n_tokens"),
    )

    if strategy == "overflow":
        w = (
            Window.partitionBy("shard")
            .orderBy(id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum_before = F.sum("n_tokens").over(w) - F.col("n_tokens")
        return base.select(
            "shard",
            id_col,
            "n_tokens",
            F.floor(cum_before / token_budget).cast("int").alias("seq_idx"),
            (cum_before % token_budget).cast("int").alias("off_tokens"),
        )

    out_schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType()),
            T.StructField(id_col, base.schema[id_col].dataType),
            T.StructField("n_tokens", T.IntegerType()),
            T.StructField("seq_idx", T.IntegerType()),
            T.StructField("off_tokens", T.IntegerType()),
        ]
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        toks = pdf["n_tokens"].to_list()
        seq = [0] * len(toks)
        off = [0] * len(toks)
        cur_seq = 0
        cur_off = 0  # tokens already occupied in the current sequence
        for j, t in enumerate(toks):
            # exact twin of the oracle's recursive-CTE step: for every doc
            # after the shard's first, open a new sequence iff appending
            # would exceed the budget (== budget still fits)
            if j > 0 and cur_off + t > token_budget:
                cur_seq += 1
                cur_off = 0
            seq[j] = cur_seq
            off[j] = cur_off
            cur_off += t
        pdf["seq_idx"] = pd.array(seq, dtype="int32")
        pdf["off_tokens"] = pd.array(off, dtype="int32")
        return pdf[["shard", id_col, "n_tokens", "seq_idx", "off_tokens"]]

    return base.groupBy("shard").applyInPandas(_pack, out_schema)


def materialize_sequences(
    docs: DataFrame,
    packed: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = " ",
) -> DataFrame:
    """The gather step after assignment: join text back onto the packed
    ids and concatenate each (shard, seq_idx) group in offset order into
    one training-sequence string. Each doc's text moves exactly once
    (shuffle by id for the join, then by (shard, seq_idx) for the
    group); per-group state is bounded by the token budget, so
    collect_list cannot blow an executor the way an unbounded groupBy
    concat would. Whitespace join keeps the invariant
    ``token_count(seq_text) == sum(per-doc token counts)``.
    """
    joined = packed.join(docs.select(id_col, text_col), id_col)
    parts = F.array_sort(
        F.collect_list(F.struct(F.col("off_tokens"), F.col(text_col).alias("t")))
    )
    return (
        joined.groupBy("shard", "seq_idx")
        .agg(
            F.concat_ws(sep, F.transform(parts, lambda s: s["t"])).alias("seq_text"),
            F.sum("n_tokens").alias("seq_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def sequence_stats(packed: DataFrame, token_budget: int) -> DataFrame:
    """Per-strategy packing quality: sequence count, mean fill fraction,
    and the overflow tally (sequences whose token total exceeds the
    budget — possible only under ``overflow``, by at most one doc).
    Aggregates the assignment frame; one groupBy per level, no text."""
    group = [c for c in ("strategy",) if c in packed.columns]
    per_seq = packed.groupBy(*group, "shard", "seq_idx").agg(
        F.sum("n_tokens").alias("seq_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return per_seq.groupBy(*group).agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.sum("n_docs").alias("n_docs"),
        F.round(F.avg(F.least(F.col("seq_tokens"), F.lit(token_budget)) / token_budget), 4).alias(
            "mean_fill"
        ),
        F.sum((F.col("seq_tokens") > token_budget).cast("int")).alias("n_overflow"),
        F.max("seq_tokens").alias("max_seq_tokens"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap_tokens: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping fixed-token-window chunks —
    the retrieval-indexing prep step (RAG chunking) next to the packing
    operators above: packing ASSEMBLES short docs into budget-bounded
    training rows, chunking DECOMPOSES long docs into overlapping
    retrieval units with provenance offsets.

    Tokens are whitespace runs (the exact-twin convention of
    textops.token_stats); chunk ``i`` covers tokens
    ``[i*step, i*step + chunk_tokens)`` with ``step = chunk_tokens -
    overlap_tokens``, every start below ``n_tokens`` emitted, so the
    last chunk may be short and consecutive chunks share
    ``overlap_tokens`` tokens of context. Returns one row per chunk:
    ``(<id>, chunk_idx, start_tok, n_tok, chunk_text)``.

    Scale shape: a single narrow projection — tokenize, build the start
    list with ``sequence`` (O(n_chunks), not O(n_tokens)), explode,
    slice-and-join per chunk. No shuffle, no UDF; fuses into the scan
    and parallelizes by input partition, which is the right plan when
    "chunk the corpus" precedes an embed/index stage at 100 TB.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            "overlap_tokens must satisfy 0 <= overlap < chunk_tokens "
            f"(got {overlap_tokens} vs {chunk_tokens})"
        )
    step = chunk_tokens - overlap_tokens
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )
    base = docs.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.size(toks).alias("_n"),
    )
    starts = F.when(
        F.col("_n") > 0,
        F.sequence(F.lit(0), F.col("_n") - 1, F.lit(step)),
    ).otherwise(F.array().cast("array<int>"))
    out = base.select(
        id_col,
        "_toks",
        F.posexplode(starts).alias("chunk_idx", "start_tok"),
    )
    piece = F.slice(
        F.col("_toks"), F.col("start_tok") + 1, F.lit(chunk_tokens)
    )
    return out.select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("start_tok").cast("int").alias("start_tok"),
        F.size(piece).cast("int").alias("n_tok"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
