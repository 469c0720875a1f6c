"""Training-mix construction: temperature-scaled source mixture weights
and deterministic temperature sampling over a multi-source corpus.

Outside the reference's operator set (SURVEY.md §2 is windows/joins/
aggregates) but first-class for an LLM-data engine: when a 100 TB corpus
is a union of sources with wildly different masses (web crawl vs books
vs code), training mixes are built by re-weighting each source's
sampling probability as ``mass^alpha`` — alpha=1 keeps natural
proportions, alpha=0 gives uniform-over-sources, alpha≈0.5-0.7 is the
standard "temperature" compromise that upweights rare high-quality
sources (the multilingual-sampling trick from public multilingual-LM
papers, applied to source mixing).

Scale design
------------
``source_mixture_weights`` is one tiny hash aggregate: |sources| rows
shuffle (map-side combined), and every downstream use broadcasts it.
``temperature_sample`` never shuffles the corpus: per-source keep
thresholds are computed on the (tiny) weights frame, broadcast-joined
back, and the keep decision is the engine-portable md5 bucket
(operators/textops.py::md5_bucket) — so the same doc is kept or dropped
at any parallelism, on any engine, forever. Cost at 100 TB: one scan,
one broadcast join, zero wide exchanges of the corpus.

Determinism vs the DuckDB oracle: for alpha=0.5 the per-source keep
fraction reduces algebraically to ``budget_frac * sqrt(min_mass /
mass)`` (the weight normalizer cancels), and IEEE sqrt/mul/div are
correctly rounded in both engines, so the integer bucket thresholds —
and therefore the sampled row SET — match exactly. The plan entry uses
that form; general alpha goes through ``pow`` (documented last-ulp
caveat, irrelevant in practice away from rounding boundaries).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textops import md5_bucket

__all__ = ["source_mixture_weights", "temperature_sample"]


def _mass(size_col: str | None) -> Column:
    # Source mass = row count, or the sum of a size column (chars/tokens)
    # when the mix should be token-weighted rather than document-weighted.
    if size_col is None:
        return F.count(F.lit(1)).cast("double")
    return F.sum(F.col(size_col).cast("double"))


def _pow_alpha(c: Column, alpha: float) -> Column:
    # sqrt is IEEE-correctly-rounded in every engine; pow is only
    # faithfully rounded — keep the oracle-exact path for alpha=0.5.
    if alpha == 0.5:
        return F.sqrt(c)
    return F.pow(c, F.lit(alpha))


def source_mixture_weights(
    docs: DataFrame,
    *,
    source_col: str = "source",
    size_col: str | None = None,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-source temperature mixture weights: w_i = mass_i^alpha / Σ_j
    mass_j^alpha. Returns (source_col, n_docs, mass, weight) — one row
    per source, weights summing to 1.
    """
    if not (0.0 <= alpha <= 1.0):
        raise ValueError("source_mixture_weights: alpha must be in [0, 1]")

    mass = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"), _mass(size_col).alias("mass")
    )
    scaled = mass.withColumn("_s", _pow_alpha(F.col("mass"), alpha))
    total = scaled.agg(F.sum("_s").alias("_z"))
    return (
        scaled.crossJoin(F.broadcast(total))
        .withColumn("weight", F.col("_s") / F.col("_z"))
        .select(source_col, "n_docs", "mass", "weight")
    )


def temperature_sample(
    docs: DataFrame,
    *,
    source_col: str = "source",
    size_col: str | None = None,
    id_col: str = "doc_id",
    alpha: float = 0.5,
    budget_frac: float = 1.0,
    n_buckets: int = 1000,
) -> DataFrame:
    """Deterministically sample `docs` so the kept mass follows the
    temperature mix, without upsampling any source.

    The largest feasible total under keep_frac ≤ 1 everywhere is
    T_max = min_i mass_i / w_i; `budget_frac` scales down from that
    ceiling. Per source: keep_frac_i = budget_frac · T_max · w_i /
    mass_i, realized as an integer md5-bucket threshold
    round(keep_frac_i · n_buckets) on id_col — reproducible at any
    parallelism. For alpha=0.5 this reduces to budget_frac ·
    sqrt(min_mass / mass_i), computed in exactly that form so the DuckDB
    oracle's thresholds are bit-identical.

    Returns the kept docs rows plus a `bucket` column.
    """
    if not (0.0 < budget_frac <= 1.0):
        raise ValueError("temperature_sample: budget_frac must be in (0, 1]")
    if not (0.0 <= alpha <= 1.0):
        raise ValueError("temperature_sample: alpha must be in [0, 1]")

    mass = docs.groupBy(source_col).agg(_mass(size_col).alias("mass"))
    if alpha == 0.5:
        # Normalizer-free closed form (see module docstring): exact.
        mmin = mass.agg(F.min("mass").alias("_mmin"))
        rates = mass.crossJoin(F.broadcast(mmin)).withColumn(
            "_thr",
            F.round(
                F.lit(budget_frac)
                * F.sqrt(F.col("_mmin") / F.col("mass"))
                * F.lit(n_buckets)
            ).cast("long"),
        )
    else:
        scaled = mass.withColumn("_s", _pow_alpha(F.col("mass"), alpha))
        # T_max = min_i mass_i/w_i = Z * min_i mass_i^(1-alpha); the Z in
        # w_i cancels it, leaving keep_frac_i = bf * min_j m_j^(1-a) / m_i^(1-a).
        lever = scaled.withColumn("_m1a", F.col("mass") / F.col("_s"))
        mmin = lever.agg(F.min("_m1a").alias("_lmin"))
        rates = lever.crossJoin(F.broadcast(mmin)).withColumn(
            "_thr",
            F.round(
                F.lit(budget_frac) * F.col("_lmin") / F.col("_m1a") * F.lit(n_buckets)
            ).cast("long"),
        )

    kept = (
        docs.join(
            F.broadcast(rates.select(source_col, "_thr")), on=source_col, how="inner"
        )
        .withColumn("bucket", md5_bucket(F.col(id_col), n_buckets))
        .where(F.col("bucket") < F.col("_thr"))
        .drop("_thr")
    )
    return kept
