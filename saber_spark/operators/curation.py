"""End-to-end corpus curation: the composed training-data pipeline.

A production pretraining-data pipeline is not one operator — it is a
fixed sequence whose stages each shrink the corpus before the next,
more expensive, stage runs:

  annotate (lang-ID + quality, pure Catalyst expressions)
    → filter (quality/language gates — cheapest first, pushes into the
      scan)
    → exact dedup (hash-groupBy keep-min: one shuffle on md5(text))
    → near-dup dedup (SimHash band-join pairs → connected components →
      keep the cluster-minimum doc)
    → deterministic stratified sample (portable md5 bucket per stratum)

Every stage is an operator this engine already ships
(`operators/textops.py`, `operators/dedup.py`); this module is the
composition, in the order a 100-TB run wants it: the Catalyst-expression
filters run inside the scan stage and typically drop most of the data
before the first shuffle; exact dedup (one cheap shuffle) runs before
the band-join pair generation so near-dup clustering only sees unique
texts; sampling last, so sample rates apply to the cleaned population.

Scale notes: stages 1-3 are single-shuffle; stage 4's pair join is the
banded SimHash equi-join (never all-pairs) and the component loop is
O(diameter) rounds over near-dup clusters (tiny diameters in practice —
`connected_components_star` is the O(log n) drop-in for adversarial
graphs); stage 5 is a stateless filter. Nothing in the pipeline holds
state proportional to the corpus on any single node.

Reference analogue: none — lsds/Saber has no data-curation surface;
this is the task-brief "large-scale training-data pipeline" composition
built from its re-expressed operator set.

Sibling stages not wired in by default: ``textops.redact_pii`` (PII
scrubbing — slot it into the annotate projection when the corpus needs
it) and ``streaming/jobs.py::streaming_exact_dedup`` (the exact-dedup
stage for a LIVE ingest, watermark-bounded state; this batch pipeline
is its compaction-time complement).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from saber_spark.operators import dedup as dd
from saber_spark.operators import textops as tx


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stratum_col: str = "source",
    quality_min: float = 0.75,
    langs: tuple[str, ...] = ("en",),
    max_hamming: int = 3,
    rate_for_stratum: Column | None = None,
    n_buckets: int = 1000,
) -> DataFrame:
    """Run the five-stage curation pipeline; returns the curated rows as
    (doc_id, stratum, predicted_lang, quality, bucket).

    ``rate_for_stratum`` is a Column in [0, n_buckets] giving each row's
    keep-rate (evaluated after dedup); default keeps 80% of even-numbered
    strata and 40% of odd ones (``srcN`` parity) — the "mix weights"
    knob of a training-set build. Determinism contract: output depends
    only on row VALUES (md5 buckets + min-id tie-breaks), never on
    partitioning or execution order, so the same corpus curates to the
    same set on any cluster size.
    """
    did, txt = F.col(id_col), F.col(text_col)

    # 1-2) annotate + filter: pure Catalyst expressions, codegen'd into
    # the scan stage — no shuffle yet.
    annotated = docs.select(
        did,
        txt,
        F.col(stratum_col).alias("stratum"),
        tx.predicted_lang(text_col).alias("predicted_lang"),
        tx.quality_score(text_col).alias("quality"),
    )
    filtered = annotated.where(
        (F.col("quality") >= quality_min) & F.col("predicted_lang").isin(*langs)
    )
    # Stage boundary: truncate lineage here. The lang/quality expression
    # trees are hundreds of nodes; without a cut they are re-inlined into
    # BOTH branches of every downstream self-join (dedup keep-min, band
    # join), and Catalyst re-optimizes the duplicated trees per branch —
    # measured 1.6× slower end-to-end than materializing. A production
    # run writes each stage to a table (that is the pipeline's restart
    # point); localCheckpoint is the single-job equivalent.
    filtered = filtered.localCheckpoint(eager=True)

    # 3) exact dedup keep-min within the filtered set (one hash shuffle).
    keeps = dd.exact_dedup(filtered, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    uniq = filtered.join(keeps, id_col, "left_semi")

    # 4) near-dup clustering: banded SimHash pairs among the unique docs,
    # connected components, keep the cluster-minimum doc; singletons
    # (no component row) keep themselves.
    pairs = dd.simhash_pairs(uniq, id_col, text_col, max_hamming=max_hamming)
    comps = dd.connected_components(pairs).withColumnRenamed("node", id_col)
    canon = (
        uniq.join(comps, id_col, "left")
        .where(F.coalesce("component_id", did) == did)
        .drop("component_id")
    )

    # 5) deterministic stratified sample on the cleaned population.
    if rate_for_stratum is None:
        # Default rates are FRACTIONS of n_buckets (80% / 40%), not
        # absolute bucket counts — a caller changing n_buckets keeps the
        # same effective keep-rates (round-3 advice: 800/400 hardcoded
        # against n_buckets=1000 silently rescaled with the knob).
        # Stratum contract: strata are 'srcN'-style; a stratum with no
        # digits has NULL src_num and deliberately takes the odd (lower)
        # rate via the otherwise() branch — made explicit here so the
        # DuckDB twin (which would error casting '') documents the same
        # choice rather than diverging silently.
        src_num = F.nullif(F.regexp_extract("stratum", r"(\d+)", 1), F.lit("")).cast(
            "int"
        )
        even, odd = int(0.8 * n_buckets), int(0.4 * n_buckets)
        rate_for_stratum = (
            F.when(F.coalesce(src_num % 2, F.lit(1)) == 0, F.lit(even))
            .otherwise(F.lit(odd))
        )
    bucket = tx.md5_bucket(did.cast("string"), n_buckets)
    return (
        canon.withColumn("bucket", bucket)
        .where(F.col("bucket") < rate_for_stratum)
        .select(id_col, "stratum", "predicted_lang", "quality", "bucket")
    )
