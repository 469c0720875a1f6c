"""Training-data pipeline queries over documents/embeddings.

Dedup (exact / n-gram Jaccard / MinHash-LSH / SimHash), similarity search
(exact cosine pairs + top-k, random-hyperplane LSH ANN), text analysis
(language-ID, quality score, token counts, fingerprint), and multimodal
metadata extraction. Every query has a DuckDB oracle that reproduces the
operator's exact definition (shared hash/arithmetic constructions: md5
strings, integer-arithmetic hyperplanes, hex-digit bit extraction), so
the driver value-checks them, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from saber_spark.operators import dedup as dd
from saber_spark.operators import multimodal as mm
from saber_spark.operators import packing as pk
from saber_spark.operators import similarity as sim
from saber_spark.operators import textops as tx
from saber_spark.plans.registry import register
from saber_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# shared DuckDB fragments (mirror textops.normalize_text / word_shingles)
# --------------------------------------------------------------------------

_W = r"""
w AS (
    SELECT doc_id,
           regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt,
           string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS words
    FROM documents
)
"""

_SHINGLES = r"""
sh AS (
    SELECT doc_id,
           list_distinct(CASE WHEN len(words) >= 3
               THEN list_transform(range(1, len(words) - 1),
                                   i -> array_to_string(words[i:i+2], ' '))
               ELSE [array_to_string(words, ' ')] END) AS shingles
    FROM w
)
"""

_POSTS = "posts AS (SELECT doc_id, unnest(shingles) AS s FROM sh)"

_JACCARD_PAIRS = """
sizes AS (SELECT doc_id, count(*) AS n FROM posts GROUP BY 1),
common AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
    FROM posts a JOIN posts b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
jac AS (
    SELECT id_a, id_b, round(c / (sa.n + sb.n - c), 6) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
)
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


# --------------------------------------------------------------------------
# Dedup
# --------------------------------------------------------------------------

_EXACT_ORACLE = f"""
WITH {_W}
SELECT md5(nt) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
FROM w GROUP BY 1
"""


@register("dedup_exact", _EXACT_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.exact_dedup(_docs(spark, sf_dir))


_JACCARD_ORACLE = f"""
WITH {_W}, {_SHINGLES}, {_POSTS}, {_JACCARD_PAIRS}
SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.8
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs (3-word-shingle Jaccard >= 0.8, inverted index).
    (Driver-checked through dedup_jaccard_strategies since r4.)"""
    return dd.jaccard_pairs(_docs(spark, sf_dir), threshold=0.8)


# MinHash-LSH: banded candidates + exact-Jaccard verification restricted
# to candidate docs. The ORACLE-CHECKED entry uses r=1 (b=16 bands):
# P(candidate | J) = 1-(1-J)^16 ≥ 0.99998 at J = 0.5, so recall vs the
# all-pairs-Jaccard oracle holds on ANY corpus the driver grades, not
# just the validated fixture. r=2 (the sharper S-curve that prunes the
# verifier 493→59 docs on the test corpus) stays the opt-in production/
# bench knob — its per-corpus recall is measured in
# tests/test_pipeline_ops.py rather than assumed by the oracle.
_MINHASH_ORACLE = f"""
WITH {_W}, {_SHINGLES}, {_POSTS}, {_JACCARD_PAIRS}
SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.5
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(Driver-checked through dedup_jaccard_strategies since r4.)"""
    return dd.minhash_lsh_pairs(
        _docs(spark, sf_dir), k=16, threshold=0.5, rows_per_band=1
    )


# Both Jaccard-near-dup strategies in ONE driver row (r4 rotation, same
# discipline as cm1_pane_strategies): the exact inverted-index path at
# threshold 0.8 and the MinHash-LSH banded-candidates path at 0.5 share
# the all-pairs-Jaccard CTE, tagged and unioned so one value-hash checks
# both the exact scorer and the banding+verification pipeline. The freed
# slot funds decontaminate_benchmark below.
_JACCARD_STRATEGIES_ORACLE = f"""
WITH {_W}, {_SHINGLES}, {_POSTS}, {_JACCARD_PAIRS}
SELECT 'inverted_exact' AS strategy, id_a, id_b, jaccard
FROM jac WHERE jaccard >= 0.8
UNION ALL
SELECT 'minhash_lsh' AS strategy, id_a, id_b, jaccard
FROM jac WHERE jaccard >= 0.5
"""


@register("dedup_jaccard_strategies", _JACCARD_STRATEGIES_ORACLE)
def dedup_jaccard_strategies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ex = dedup_ngram_jaccard(spark, sf_dir).select(
        F.lit("inverted_exact").alias("strategy"), "*")
    mh = dedup_minhash_lsh(spark, sf_dir).select(
        F.lit("minhash_lsh").alias("strategy"), "*")
    return ex.unionByName(mh)


# Test-set decontamination (cross-corpus contamination removal): docs
# whose id is ≡ 0 (mod 37) play the held-out benchmark; every OTHER doc
# is flagged when it shares any 3-word shingle with the benchmark set.
# The oracle replays the same shingle construction and overlap semi-join
# in SQL, and the row value-checks the flag over the whole non-benchmark
# corpus (both partitions, not just survivors).
_DECONTAM_ORACLE = f"""
WITH {_W}, {_SHINGLES},
bench AS (SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 37 = 0),
corp AS (SELECT doc_id FROM sh WHERE doc_id % 37 <> 0),
posts AS (SELECT doc_id, unnest(shingles) AS s FROM sh WHERE doc_id % 37 <> 0),
bad AS (SELECT DISTINCT p.doc_id FROM posts p JOIN bench USING (s))
SELECT c.doc_id, (b.doc_id IS NOT NULL) AS contaminated
FROM corp c LEFT JOIN bad b ON c.doc_id = b.doc_id
"""


@register("decontaminate_benchmark", _DECONTAM_ORACLE)
def decontaminate_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") % 37 == 0)
    corpus = docs.where(F.col("doc_id") % 37 != 0)
    return dd.decontaminate(corpus, bench).select("doc_id", "contaminated")


# Cross-document duplicated-substring spans: the distributed n-gram
# approximation of suffix-array exact-substring dedup (Lee et al. 2021,
# arXiv:2107.06499 — remove exact token runs shared across documents).
# Two legs in one driver row (the strategies discipline): 'spans' =
# per-doc maximal duplicated spans [span_start, span_end) in token
# positions with the merged duplicated-gram count; 'clean' = affected
# docs with every covered token removed and the survivors re-joined in
# order (a text-level equality check of the whole pipeline). The oracle
# replays the identical construction in SQL: same normalization, same
# md5-of-8-token-window hash, same count-distinct-docs >= 2 predicate,
# same window-function island merge.
_SPAN_N = 8

_SPANS_ORACLE = f"""
WITH {_W},
toks AS (
    SELECT doc_id, i - 1 AS p, words[i] AS tok
    FROM w, UNNEST(range(1, len(words) + 1)) AS t(i)
),
grams AS (
    SELECT doc_id, i AS pos,
           md5(array_to_string(words[i+1:i+{_SPAN_N}], ' ')) AS g
    FROM w, UNNEST(range(0, len(words) - {_SPAN_N} + 1)) AS t(i)
),
dup AS (SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
hits AS (SELECT doc_id, pos FROM grams JOIN dup USING (g)),
flagged AS (
    SELECT doc_id, pos,
           CASE WHEN pos > coalesce(max(pos + {_SPAN_N}) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
           THEN 1 ELSE 0 END AS ni
    FROM hits
),
islands AS (
    SELECT doc_id, pos, sum(ni) OVER (
        PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
    FROM flagged
),
spans AS (
    SELECT doc_id, min(pos) AS span_start, max(pos) + {_SPAN_N} AS span_end,
           count(*) AS n_dup_grams
    FROM islands GROUP BY doc_id, island
),
covered AS (
    SELECT DISTINCT doc_id, pos + u AS p
    FROM hits, UNNEST(range(0, {_SPAN_N})) AS t(u)
),
affected AS (SELECT DISTINCT doc_id FROM hits),
kept AS (
    SELECT tk.doc_id, tk.p, tk.tok
    FROM toks tk JOIN affected USING (doc_id)
    WHERE NOT EXISTS (SELECT 1 FROM covered c
                      WHERE c.doc_id = tk.doc_id AND c.p = tk.p)
),
clean AS (
    SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text
    FROM kept GROUP BY doc_id
)
SELECT 'spans' AS leg, doc_id, span_start, span_end, n_dup_grams,
       CAST(NULL AS VARCHAR) AS clean_text
FROM spans
UNION ALL
SELECT 'clean' AS leg, doc_id, CAST(NULL AS BIGINT) AS span_start,
       CAST(NULL AS BIGINT) AS span_end, CAST(NULL AS BIGINT) AS n_dup_grams,
       clean_text
FROM clean
"""


@register("dedup_substring_spans", _SPANS_ORACLE)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    spans = dd.duplicate_ngram_spans(docs, n=_SPAN_N).select(
        F.lit("spans").alias("leg"),
        "doc_id",
        "span_start",
        "span_end",
        "n_dup_grams",
        F.lit(None).cast("string").alias("clean_text"),
    )
    clean = dd.remove_duplicate_spans(docs, n=_SPAN_N).select(
        F.lit("clean").alias("leg"),
        "doc_id",
        F.lit(None).cast("long").alias("span_start"),
        F.lit(None).cast("long").alias("span_end"),
        F.lit(None).cast("long").alias("n_dup_grams"),
        "clean_text",
    )
    return spans.unionByName(clean)


def _simhash_sql_cte() -> str:
    """DuckDB CTE computing the identical 60-bit simhash per doc."""
    votes = []
    for i in range(dd.SIMHASH_BITS):
        digit = f"(instr('0123456789abcdef', substr(h, {i // 4 + 1}, 1)) - 1)"
        bit = f"(CAST(floor({digit} / {2 ** (i % 4)}) AS BIGINT) % 2)"
        votes.append(f"SUM({bit} * 2 - 1) AS v{i}")
    sig_terms = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN CAST({2**i} AS BIGINT) ELSE 0 END)"
        for i in range(dd.SIMHASH_BITS)
    )
    return f"""
tok AS (SELECT doc_id, unnest(list_distinct(words)) AS t FROM w),
th AS (SELECT doc_id, md5(t) AS h FROM tok),
votes AS (SELECT doc_id, {", ".join(votes)} FROM th GROUP BY doc_id),
sv AS (SELECT doc_id, {sig_terms} AS simhash FROM votes)
"""


# (Per-doc simhash signatures are not a separate registry entry: the
# strategies oracle below recomputes every signature from scratch in
# SQL, so the signature construction is value-checked through it —
# registry consolidated to 50 driver-checked entries, VERDICT r2 item 1.
# The band join is exact for hamming<=3 by pigeonhole over 4 bands, so
# the oracle can be the plain all-pairs hamming predicate.)


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # driver coverage via dedup_simhash_strategies (part='pair'); kept
    # exported for the plan-quality suite (r4 registry consolidation)
    return dd.simhash_pairs(_docs(spark, sf_dir), max_hamming=3)


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: SimHash near-dup pairs → connected
    components (distributed min-label propagation, operators/dedup.py)
    → every doc labeled with its cluster's min doc id (singletons label
    themselves). The canonical-doc-per-cluster step of a real dedup
    pipeline, checked against a recursive-CTE transitive closure.
    Driver coverage via dedup_simhash_strategies (part='component')."""
    docs = _docs(spark, sf_dir)
    pairs = dd.simhash_pairs(docs, max_hamming=3)
    comps = dd.connected_components(pairs).withColumnRenamed("node", "doc_id")
    return docs.select("doc_id").join(comps, "doc_id", "left").select(
        "doc_id",
        F.coalesce("component_id", F.col("doc_id")).cast("long").alias("component_id"),
    )


# The pairs entry is a strict prefix of the components entry (same band
# join; components adds the transitive closure), so the two share one
# part-tagged driver row — r4 consolidation freeing a registry slot for
# iceberg_changelog while keeping BOTH value checks: hamming distances
# row-for-row AND cluster labels against the recursive-CTE closure.
_SIMHASH_STRATEGIES_ORACLE = f"""
WITH RECURSIVE {_W}, {_simhash_sql_cte()},
prs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sv a JOIN sv b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
),
edges AS (SELECT id_a AS src, id_b AS dst FROM prs
          UNION SELECT id_b, id_a FROM prs),
reach(node, label) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.src, r.label FROM edges e JOIN reach r ON r.node = e.dst
)
SELECT 'pair' AS part, id_a AS a, id_b AS b,
       CAST(hamming AS BIGINT) AS metric
FROM prs
UNION ALL
SELECT 'component', node, CAST(min(label) AS BIGINT), NULL
FROM reach GROUP BY node
"""


@register("dedup_simhash_strategies", _SIMHASH_STRATEGIES_ORACLE)
def dedup_simhash_strategies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup detection end to end, part-tagged in one row:
    'pair' = banded hamming<=3 candidate pairs with their distances
    (exact by pigeonhole over 4x15-bit bands), 'component' = every doc
    labeled with its duplicate-cluster's min doc id via distributed
    min-label propagation (operators/dedup.py)."""
    docs = _docs(spark, sf_dir)
    pairs = dd.simhash_pairs(docs, max_hamming=3)
    comps = dd.connected_components(pairs).withColumnRenamed("node", "doc_id")
    labeled = docs.select("doc_id").join(comps, "doc_id", "left").select(
        "doc_id",
        F.coalesce("component_id", F.col("doc_id")).cast("long").alias("component_id"),
    )
    p = pairs.select(
        F.lit("pair").alias("part"),
        F.col("id_a").alias("a"),
        F.col("id_b").alias("b"),
        F.col("hamming").cast("long").alias("metric"),
    )
    c = labeled.select(
        F.lit("component").alias("part"),
        F.col("doc_id").alias("a"),
        F.col("component_id").alias("b"),
        F.lit(None).cast("long").alias("metric"),
    )
    return p.unionByName(c)


# Deterministic role-stratified sampling (SFT-mix construction): a row is
# kept iff its portable md5 bucket falls under its role's rate — same
# sample in any engine, at any parallelism. 8 hex digits (2^32 values)
# make the mod-1000 bias ~7e-8 (4 digits had a 1.5% bucket skew).
_HEX = "0123456789abcdef"
_BUCKET_SQL = " + ".join(
    f"(instr('{_HEX}', substr(h, {i}, 1)) - 1) * {16 ** (tx.MD5_BUCKET_DIGITS - i)}"
    for i in range(1, tx.MD5_BUCKET_DIGITS + 1)
)

_SAMPLE_ORACLE = """
WITH _ev AS (
    SELECT user_id, event_id, event_type, props, ts,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx
    FROM events
),
transcripts AS (
    SELECT 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
           turn_idx,
           CASE turn_idx % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role
    FROM _ev
),
s AS (
    SELECT conv_id, turn_idx, role,
           md5(conv_id || ':' || CAST(turn_idx AS VARCHAR)) AS h
    FROM transcripts
)
SELECT conv_id, turn_idx, role,
       ({BUCKET}) % 1000 AS bucket
FROM s
WHERE ({BUCKET}) % 1000 < CASE role WHEN 'assistant' THEN 500
                                    WHEN 'user' THEN 250 ELSE 100 END
""".replace("{BUCKET}", _BUCKET_SQL)


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Role-stratified deterministic sampling over the transcript stream
    (assistant 50%, user 25%, tool turns 10%) via the portable md5
    bucket — the reproducible data-mix primitive for training-set
    construction. Driver-checked through `sampling_strategies`."""
    from saber_spark.plans.saber_queries import transcripts as _tx

    t = _tx(spark, sf_dir)
    key = F.concat(F.col("conv_id"), F.lit(":"), F.col("turn_idx").cast("string"))
    bucket = tx.md5_bucket(key, 1000)
    rate = (
        F.when(F.col("role") == "assistant", 500)
        .when(F.col("role") == "user", 250)
        .otherwise(100)
    )
    return t.select(
        "conv_id", "turn_idx", "role", bucket.alias("bucket")
    ).where(F.col("bucket") < rate)


# --------------------------------------------------------------------------
# Sampling strategies: role-stratified turn sampling + temperature-scaled
# source mixture weights + deterministic temperature sampling of the
# documents corpus (one entry, strategy-tagged — operators/mixing.py)
# --------------------------------------------------------------------------

_MIX_BUDGET = 0.8  # of the max feasible total with no source upsampled

_MIX_WEIGHTS_SQL = """
WITH m AS (
  SELECT source, count(*)::BIGINT AS n_docs, CAST(sum(n_chars) AS DOUBLE) AS mass
  FROM documents GROUP BY source
)
SELECT source, n_docs, mass,
       sqrt(mass) / (SELECT sum(sqrt(mass)) FROM m) AS weight
FROM m
"""

_TEMP_SAMPLE_SQL = f"""
WITH m AS (
  SELECT source, CAST(sum(n_chars) AS DOUBLE) AS mass
  FROM documents GROUP BY source
), thr AS (
  SELECT source,
         CAST(round({_MIX_BUDGET} * sqrt((SELECT min(mass) FROM m) / mass) * 1000)
              AS BIGINT) AS thr
  FROM m
), b AS (
  SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents
)
SELECT b.doc_id, b.source, ({{BUCKET}}) % 1000 AS bucket
FROM b JOIN thr ON b.source = thr.source
WHERE ({{BUCKET}}) % 1000 < thr.thr
""".replace("{BUCKET}", _BUCKET_SQL)

_SAMPLING_STRATEGIES_ORACLE = f"""
SELECT 'stratified' AS strategy,
       conv_id || ':' || CAST(turn_idx AS VARCHAR) AS key, role AS grp,
       CAST(NULL AS BIGINT) AS n_docs, CAST(NULL AS DOUBLE) AS mass,
       CAST(NULL AS DOUBLE) AS weight, CAST(bucket AS BIGINT) AS bucket
FROM ({_SAMPLE_ORACLE})
UNION ALL
SELECT 'mix_weights' AS strategy, source AS key, CAST(NULL AS VARCHAR) AS grp,
       n_docs, mass, weight, CAST(NULL AS BIGINT) AS bucket
FROM ({_MIX_WEIGHTS_SQL})
UNION ALL
SELECT 'temp_sample' AS strategy, CAST(doc_id AS VARCHAR) AS key, source AS grp,
       CAST(NULL AS BIGINT) AS n_docs, CAST(NULL AS DOUBLE) AS mass,
       CAST(NULL AS DOUBLE) AS weight, CAST(bucket AS BIGINT) AS bucket
FROM ({_TEMP_SAMPLE_SQL})
"""


@register("sampling_strategies", _SAMPLING_STRATEGIES_ORACLE)
def sampling_strategies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix sampling surface in one entry (absorbing round 3's
    `sample_stratified`): role-stratified deterministic turn sampling,
    temperature-scaled source mixture weights over the documents corpus
    (mass = chars, alpha=0.5 — sqrt, IEEE-exact in both engines), and
    the deterministic temperature sample those weights imply at
    budget_frac=0.8 — all md5-bucket reproducible, union-tagged by
    ``strategy``. operators/mixing.py, operators/textops.py::md5_bucket."""
    from saber_spark.operators import mixing as mx

    null_n = F.lit(None).cast("long")
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")

    strat = sample_stratified(spark, sf_dir).select(
        F.lit("stratified").alias("strategy"),
        F.concat(
            F.col("conv_id"), F.lit(":"), F.col("turn_idx").cast("string")
        ).alias("key"),
        F.col("role").alias("grp"),
        null_n.alias("n_docs"),
        null_d.alias("mass"),
        null_d.alias("weight"),
        F.col("bucket").cast("long").alias("bucket"),
    )

    docs = _docs(spark, sf_dir)
    weights = mx.source_mixture_weights(
        docs, source_col="source", size_col="n_chars", alpha=0.5
    ).select(
        F.lit("mix_weights").alias("strategy"),
        F.col("source").alias("key"),
        null_s.alias("grp"),
        "n_docs",
        "mass",
        "weight",
        null_n.alias("bucket"),
    )

    sampled = mx.temperature_sample(
        docs,
        source_col="source",
        size_col="n_chars",
        id_col="doc_id",
        alpha=0.5,
        budget_frac=_MIX_BUDGET,
        n_buckets=1000,
    ).select(
        F.lit("temp_sample").alias("strategy"),
        F.col("doc_id").cast("string").alias("key"),
        F.col("source").alias("grp"),
        null_n.alias("n_docs"),
        null_d.alias("mass"),
        null_d.alias("weight"),
        F.col("bucket").cast("long").alias("bucket"),
    )

    return strat.unionByName(weights).unionByName(sampled)


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------

def _dotseq(a: str, b: str) -> str:
    """Sequential left-fold dot product — bit-identical to Spark's
    F.aggregate(zip_with(...)) fold (list_dot_product may sum in a
    different order and flip the last ulp)."""
    return (
        f"list_reduce(list_transform(range(1, 65),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)),"
        " (x, y) -> x + y)"
    )


_COS_NORM = f"""
nv AS (SELECT vec_id, embedding,
              sqrt({_dotseq("embedding", "embedding")}) AS nrm
       FROM embeddings)
"""

# (The exact all-pairs cosine baseline is not a registry entry: it is
# the guarded recall oracle for rp_lsh_pairs, exercised by
# tests/test_pipeline_ops.py; exact-cosine arithmetic is value-checked
# by the top-k entry below, which uses the same dot/norm expressions.)

_TOPK_ORACLE = f"""
WITH {_COS_NORM},
scored AS (
    SELECT q.vec_id AS query_id, b.vec_id AS nbr_id,
           round({_dotseq("q.embedding", "b.embedding")} / (q.nrm * b.nrm), 6) AS cosine
    FROM nv q JOIN nv b ON q.vec_id != b.vec_id
    WHERE q.vec_id < 20
)
SELECT query_id, nbr_id, cosine, rk FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id) AS rk
    FROM scored
) WHERE rk <= 5
"""


def similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force top-5 neighbours for query vectors vec_id<20.
    (Driver-checked through similarity_topk_strategies since r4; kept
    exported for bench/tests.)"""
    e = _embs(spark, sf_dir)
    return sim.cosine_topk(e, e.where(F.col("vec_id") < 20), k=5)


def _rp_bucket_sql(n_planes: int = 12) -> str:
    terms = []
    for j in range(n_planes):
        coeff = f"(((i * 2654435761 + {(j + 1) * 40503}) % 997) / 997.0 - 0.5)"
        proj = (
            f"list_reduce(list_transform(range(1, 65),"
            f" i -> CAST(embedding[i] AS DOUBLE) * {coeff}),"
            " (x, y) -> x + y)"
        )
        terms.append(
            f"(CASE WHEN round({proj}, 6) > 0 THEN CAST({2**j} AS BIGINT) ELSE 0 END)"
        )
    return " + ".join(terms)


_RP_ORACLE = f"""
WITH bk AS (SELECT vec_id, embedding, {_rp_bucket_sql()} AS bucket FROM embeddings),
nb AS (SELECT vec_id, embedding, bucket,
              sqrt({_dotseq("embedding", "embedding")}) AS nrm FROM bk)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({_dotseq("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS cosine
FROM nb a JOIN nb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round({_dotseq("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) >= 0.4
"""


@register("similarity_rp_lsh_pairs", _RP_ORACLE)
def similarity_rp_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed ANN: random-hyperplane LSH candidates + exact verification
    (the scale path; recall vs the exact baseline measured in tests)."""
    return sim.rp_lsh_pairs(_embs(spark, sf_dir), n_planes=12, threshold=0.4)


_IVF_STRIDE, _IVF_PROBES = 37, 3

_IVF_ORACLE = f"""
WITH {_COS_NORM},
cents AS (
    SELECT vec_id AS cell_id, embedding AS cv, nrm AS cn
    FROM nv WHERE vec_id % {_IVF_STRIDE} = 0
),
assigned AS (
    SELECT nbr_id, bv, bn, cell_id FROM (
        SELECT b.vec_id AS nbr_id, b.embedding AS bv, b.nrm AS bn, c.cell_id,
               row_number() OVER (
                   PARTITION BY b.vec_id
                   ORDER BY round({_dotseq("b.embedding", "c.cv")} / (b.nrm * c.cn), 6) DESC,
                            c.cell_id) AS crk
        FROM nv b CROSS JOIN cents c
    ) WHERE crk = 1
),
probes AS (
    SELECT query_id, qv, qn, cell_id FROM (
        SELECT q.vec_id AS query_id, q.embedding AS qv, q.nrm AS qn, c.cell_id,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY round({_dotseq("q.embedding", "c.cv")} / (q.nrm * c.cn), 6) DESC,
                            c.cell_id) AS crk
        FROM nv q CROSS JOIN cents c
        WHERE q.vec_id < 20
    ) WHERE crk <= {_IVF_PROBES}
),
scored AS (
    SELECT DISTINCT p.query_id, a.nbr_id,
           round({_dotseq("p.qv", "a.bv")} / (p.qn * a.bn), 6) AS cosine
    FROM probes p JOIN assigned a USING (cell_id)
    WHERE p.query_id != a.nbr_id
)
SELECT query_id, nbr_id, cosine, rk FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id) AS rk
    FROM scored
) WHERE rk <= 5
"""


def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-5: broadcast deterministic centroid codebook, base
    corpus shuffled once into nearest-centroid cells (inverted lists),
    queries (vec_id<20) probe their 3 closest cells, exact cosine ranks
    candidates — the centroid-partitioned counterpart to the LSH path.
    (Driver-checked through similarity_topk_strategies since r4.)"""
    e = _embs(spark, sf_dir)
    return sim.ivf_topk(
        e, e.where(F.col("vec_id") < 20),
        k=5, stride=_IVF_STRIDE, n_probes=_IVF_PROBES,
    )


# Both top-k retrieval strategies in ONE driver row (r4 rotation — same
# discipline as cm1_pane_strategies): the exact brute-force baseline and
# the IVF inverted-file path are strategy-tagged and unioned, so a single
# value-hash check verifies the exact scorer AND the cell-probed ANN
# against their respective SQL twins. Freed slots fund dedup_embedding
# and turn_latency_analytics.
_TOPK_STRATEGIES_ORACLE = f"""
SELECT 'exact' AS strategy, * FROM ({_TOPK_ORACLE})
UNION ALL
SELECT 'ivf' AS strategy, * FROM ({_IVF_ORACLE})
"""


@register("similarity_topk_strategies", _TOPK_STRATEGIES_ORACLE)
def similarity_topk_strategies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ex = similarity_cosine_topk(spark, sf_dir).select(
        F.lit("exact").alias("strategy"), "*")
    iv = similarity_ivf_topk(spark, sf_dir).select(
        F.lit("ivf").alias("strategy"), "*")
    return ex.unionByName(iv)


# Embedding-cosine near-dup dedup — the fifth dedup modality (exact /
# Jaccard / MinHash / SimHash / embedding): RP-LSH bucketed candidate
# pairs verified at cosine >= threshold become the near-dup graph, then
# large-star/small-star connected components (O(log n) rounds — this is
# the star variant's own driver row) label every vector with its
# cluster's min vec_id; singletons label themselves, and the canonical
# representative of a cluster is the vector whose component_id equals
# its own vec_id. At 100 TB the plan is: one bucket equi-join (never
# all-pairs), candidate-restricted exact verification, O(log n)
# contraction rounds — no driver-side loops over data. Oracle: the same
# integer-arithmetic hyperplane buckets + exact cosine in SQL, closed
# transitively with a recursive CTE.
_EMB_DEDUP_ORACLE = f"""
WITH RECURSIVE
bk AS (SELECT vec_id, embedding, {_rp_bucket_sql()} AS bucket FROM embeddings),
nb AS (SELECT vec_id, embedding, bucket,
              sqrt({_dotseq("embedding", "embedding")}) AS nrm FROM bk),
prs AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM nb a JOIN nb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE round({_dotseq("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) >= 0.4
),
edges AS (SELECT id_a AS src, id_b AS dst FROM prs
          UNION SELECT id_b, id_a FROM prs),
reach(node, label) AS (
    SELECT vec_id, vec_id FROM embeddings
    UNION
    SELECT e.src, r.label FROM edges e JOIN reach r ON r.node = e.dst
)
SELECT node AS vec_id, CAST(min(label) AS BIGINT) AS component_id
FROM reach GROUP BY node
"""


# Repetition / boilerplate filters (Gopher-style): per-doc top-word
# fraction, distinct-word ratio, top-bigram fraction, and the keep gate —
# the loop-detector of a curation pipeline. The keep decision is computed
# from the ROUNDED fractions on both engines, so the boolean is portable.
# CTE fragment (expects _W in scope); driver-checked as columns of the
# consolidated text_analysis entry.
_REP_CTES = f"""
tok AS (SELECT doc_id, unnest(words) AS t FROM w),
wc AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1, 2),
wagg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
                count(*) AS n_distinct, max(c) AS top_word_n
         FROM wc GROUP BY 1),
bg AS (SELECT doc_id,
              unnest(list_transform(range(1, len(words)),
                                    k -> words[k] || ' ' || words[k+1])) AS g
       FROM w WHERE len(words) >= 2),
bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
bagg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                max(c) AS top_bigram_n
         FROM bc GROUP BY 1),
prof AS (
    SELECT wagg.doc_id, n_words,
           round(top_word_n / n_words, 6)   AS top_word_frac,
           round(n_distinct / n_words, 6)   AS distinct_word_ratio,
           round(coalesce(top_bigram_n / n_bigrams, 0), 6) AS top_bigram_frac
    FROM wagg LEFT JOIN bagg USING (doc_id)
),
rep AS (
    SELECT doc_id, n_words, top_word_frac, distinct_word_ratio, top_bigram_frac,
           (top_word_frac <= {tx.TOP_WORD_FRAC_MAX}
            AND distinct_word_ratio >= {tx.DISTINCT_WORD_RATIO_MIN}
            AND top_bigram_frac <= {tx.TOP_BIGRAM_FRAC_MAX}) AS rep_keep
    FROM prof
)
"""


@register("dedup_embedding", _EMB_DEDUP_ORACLE)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _embs(spark, sf_dir)
    pairs = sim.rp_lsh_pairs(e, n_planes=12, threshold=0.4)
    comps = dd.connected_components_star(pairs).withColumnRenamed("node", "vec_id")
    return e.select("vec_id").join(comps, "vec_id", "left").select(
        "vec_id",
        F.coalesce("component_id", F.col("vec_id")).cast("long").alias("component_id"),
    )


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------

def _count_word_sql(word: str) -> str:
    return f"len(list_filter(words, x -> x = '{word}'))"


def _lang_sql() -> str:
    scores = []
    for lang, markers in sorted(tx._LANG_MARKERS.items()):
        total = " + ".join(_count_word_sql(m) for m in markers)
        scores.append(f"(({total}) / len(words)) AS s_{lang}")
    langs = sorted(tx._LANG_MARKERS)
    mx = "greatest(" + ", ".join(f"s_{l}" for l in langs) + ")"
    pick = " ".join(f"WHEN s_{l} = {mx} THEN '{l}'" for l in langs)
    return f"""
scores AS (SELECT doc_id, {", ".join(scores)} FROM w),
pred AS (SELECT doc_id,
                CASE WHEN {mx} <= 0 THEN 'und' {pick} END AS predicted_lang
         FROM scores)
"""


_STOP_SUM = " + ".join(_count_word_sql(s) for s in tx.STOPWORDS)

# quality-score CTEs (SQL twin of textops.quality_score) — shared by the
# text_analysis entry and the curation pipeline's filter stage
_QUAL_CTES = f"""
feat AS (
    SELECT doc_id,
           length(nt) AS n_chars,
           len(words) AS n_words,
           (length(nt) - (len(words) - 1)) / len(words) AS mean_wl,
           (length(nt) - length(regexp_replace(nt, '[^a-z0-9\\s]', '', 'g')))
               / greatest(length(nt), 1) AS punct_ratio,
           round(({_STOP_SUM}) / len(words), 6) AS stop_ratio
    FROM w
),
qual AS (
    SELECT doc_id,
           round(
             (CASE WHEN n_chars BETWEEN 50 AND 2000 THEN 0.25 ELSE 0.0 END)
           + (CASE WHEN stop_ratio > 0.02 THEN 0.25 ELSE 0.0 END)
           + (CASE WHEN punct_ratio < 0.1 THEN 0.25 ELSE 0.0 END)
           + (CASE WHEN mean_wl >= 3 AND mean_wl <= 12 THEN 0.25 ELSE 0.0 END), 2)
           AS quality
    FROM feat
)
"""

# One driver-checked entry covers the whole text-analysis surface —
# language-ID, quality score, both token counts, the winnowing
# fingerprint (all pure scan-stage column expressions), plus the
# Gopher-style repetition profile (explode→partial-agg shape, joined
# back on doc_id) — one pass over the corpus producing the per-doc
# profile frame a curation pipeline gates on; each expression still has
# its exact SQL twin here.
_TEXT_ORACLE = f"""
WITH {_W}, {_lang_sql()},
{_QUAL_CTES},
{_REP_CTES},
tk AS (
    SELECT w.doc_id AS doc_id,
           CAST(len(words) AS INTEGER) AS ws_tokens,
           CAST(len(regexp_extract_all(lower(d.text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INTEGER)
               AS bpe_tokens
    FROM w JOIN documents d ON d.doc_id = w.doc_id
),
fp AS (
    SELECT doc_id,
           list_min(list_transform(
               CASE WHEN length(nt) >= 8
                    THEN list_transform(range(1, length(nt) - 6), i -> substr(nt, i, 8))
                    ELSE [nt] END,
               g -> md5(g))) AS fingerprint
    FROM w
)
SELECT p.doc_id AS doc_id, p.predicted_lang, q.quality,
       t.ws_tokens, t.bpe_tokens, f.fingerprint,
       r.n_words, r.top_word_frac, r.distinct_word_ratio,
       r.top_bigram_frac, r.rep_keep
FROM pred p
JOIN qual q USING (doc_id)
JOIN tk t USING (doc_id)
JOIN fp f USING (doc_id)
JOIN rep r USING (doc_id)
"""


@register("text_analysis", _TEXT_ORACLE)
def text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full text-analysis surface as one per-doc profile frame:
    language-ID (marker n-gram heuristic), quality score
    (length/punct/stopword bands), whitespace + BPE-ish token counts,
    and the winnowing-style rolling-hash fingerprint (min md5 of char
    8-grams) — all pure Catalyst column expressions that codegen into
    the scan stage — joined with the Gopher-style repetition profile
    (top-word/top-bigram fractions, distinct-word ratio, keep gate;
    explode→partial-aggregate shape) on the doc id
    (operators/textops.py)."""
    docs = _docs(spark, sf_dir)
    scan_cols = docs.select(
        "doc_id",
        tx.predicted_lang("text").alias("predicted_lang"),
        tx.quality_score("text").alias("quality"),
        tx.token_count("text").alias("ws_tokens"),
        tx.bpe_ish_token_count("text").alias("bpe_tokens"),
        tx.fingerprint("text").alias("fingerprint"),
    )
    rep = tx.repetition_profile(docs).withColumnRenamed("keep", "rep_keep")
    return scan_cols.join(rep, "doc_id")


# --------------------------------------------------------------------------
# Sequence packing (operators/packing.py): documents → fixed-token-budget
# training sequences, hash-sharded for parallelism. Both strategies in one
# strategy-tagged entry: the closed-form window "overflow" packing (pure
# Catalyst twin = window cumsum) and strict first-fit "greedy" packing
# (applyInPandas twin = per-shard recursive CTE stepping one doc per
# iteration — exact sequential semantics, value-checked).
# --------------------------------------------------------------------------

_PACK_BUDGET = 256
_PACK_SHARDS = 8

_PACK_ORACLE = f"""
WITH RECURSIVE {_W},
keyed AS (
    SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
           CAST(len(words) AS INT) AS n_tokens
    FROM w
),
sharded AS (
    SELECT CAST(({{BUCKET}}) % {_PACK_SHARDS} AS INT) AS shard, doc_id, n_tokens
    FROM keyed
),
docs AS (
    SELECT shard, doc_id, n_tokens,
           row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
    FROM sharded
),
ovf AS (
    SELECT shard, doc_id, n_tokens,
           CAST(floor(cb / {_PACK_BUDGET}) AS INT) AS seq_idx,
           CAST(cb % {_PACK_BUDGET} AS INT) AS off_tokens
    FROM (SELECT shard, doc_id, n_tokens,
                 sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - n_tokens AS cb
          FROM docs)
),
greedy AS (
    SELECT shard, doc_id, n_tokens, rn,
           0 AS seq_idx, 0 AS off_tokens
    FROM docs WHERE rn = 1
    UNION ALL
    SELECT d.shard, d.doc_id, d.n_tokens, d.rn,
           CASE WHEN g.off_tokens + g.n_tokens + d.n_tokens > {_PACK_BUDGET}
                THEN g.seq_idx + 1 ELSE g.seq_idx END,
           CASE WHEN g.off_tokens + g.n_tokens + d.n_tokens > {_PACK_BUDGET}
                THEN 0 ELSE g.off_tokens + g.n_tokens END
    FROM docs d JOIN greedy g ON d.shard = g.shard AND d.rn = g.rn + 1
)
SELECT 'overflow' AS strategy, shard, doc_id, n_tokens, seq_idx, off_tokens
FROM ovf
UNION ALL
SELECT 'greedy' AS strategy, shard, doc_id, n_tokens, seq_idx, off_tokens
FROM greedy
""".replace("{BUCKET}", _BUCKET_SQL)


@register("pack_sequences_strategies", _PACK_ORACLE)
def pack_sequences_strategies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training-data assembly, both strategies
    union-tagged: 'overflow' bins by running token offset (pure window
    cumsum — the closed-form 100-TB path, a bin overflows by at most
    one straddling doc) and 'greedy' is strict first-fit-sequential
    (never straddles; per-shard applyInPandas scan, oracled by a
    recursive CTE). Shards come from the portable md5 bucket, so the
    packing is identical in any engine at any parallelism
    (operators/packing.py)."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", tx.token_count("text").alias("n_tokens")
    )
    out = None
    for strat in pk.STRATEGIES:
        packed = pk.pack_sequences(
            docs, _PACK_BUDGET, n_shards=_PACK_SHARDS, strategy=strat
        ).withColumn("strategy", F.lit(strat))
        out = packed if out is None else out.unionByName(packed)
    return out.select("strategy", "shard", "doc_id", "n_tokens", "seq_idx", "off_tokens")


# --------------------------------------------------------------------------
# Multimodal metadata (payload = utf8 bytes of text; corpus is ASCII —
# asserted in tests — so DuckDB codepoints equal Python bytes)
# --------------------------------------------------------------------------

_MEDIA_ORACLE = """
SELECT doc_id AS media_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(ord(substr(text, 1, 1)) AS INTEGER) AS first_byte,
       CAST(ord(substr(text, length(text), 1)) AS INTEGER) AS last_byte,
       CAST(list_sum(list_transform(range(1, length(text) + 1),
                                    i -> ord(substr(text, i, 1)))) % 999983 AS BIGINT)
           AS byte_checksum
FROM documents
"""


@register("multimodal_metadata", _MEDIA_ORACLE)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: documents.text as opaque utf8 payloads →
    byte metadata via mapInPandas (multimodal.py; decode itself is
    stubbed — no codecs in this container)."""
    media = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    return mm.extract_metadata(media)


# --------------------------------------------------------------------------
# End-to-end corpus curation (operators/curation.py): annotate → filter
# → exact dedup → near-dup cluster keep-min → stratified sample, value-
# checked as ONE pipeline. The oracle replays every stage: lang/quality
# CTEs, md5 keep-min, SimHash pairs restricted to the surviving docs, a
# recursive-CTE transitive closure, and the portable bucket arithmetic.
# --------------------------------------------------------------------------

_CURATION_ORACLE = f"""
WITH RECURSIVE {_W}, {_lang_sql()},
{_QUAL_CTES},
ann AS (
    SELECT w.doc_id AS doc_id, w.nt, d.source AS stratum,
           p.predicted_lang, q.quality
    FROM w
    JOIN pred p USING (doc_id)
    JOIN qual q USING (doc_id)
    JOIN documents d ON d.doc_id = w.doc_id
),
filt AS (SELECT * FROM ann WHERE quality >= 0.75 AND predicted_lang IN ('en')),
keeps AS (SELECT min(doc_id) AS doc_id FROM filt GROUP BY md5(nt)),
uniq AS (SELECT f.* FROM filt f JOIN keeps k USING (doc_id)),
{_simhash_sql_cte()},
prs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM sv a JOIN sv b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
      AND a.doc_id IN (SELECT doc_id FROM uniq)
      AND b.doc_id IN (SELECT doc_id FROM uniq)
),
edges AS (SELECT id_a AS src, id_b AS dst FROM prs
          UNION SELECT id_b, id_a FROM prs),
reach(node, label) AS (
    SELECT doc_id, doc_id FROM uniq
    UNION
    SELECT e.src, r.label FROM edges e JOIN reach r ON r.node = e.dst
),
comp AS (SELECT node, min(label) AS cid FROM reach GROUP BY node),
canon AS (
    SELECT u.* FROM uniq u JOIN comp c ON c.node = u.doc_id AND c.cid = u.doc_id
),
s AS (SELECT canon.*, md5(CAST(doc_id AS VARCHAR)) AS h FROM canon)
SELECT doc_id, stratum, predicted_lang, quality,
       ({{BUCKET}}) % 1000 AS bucket
FROM s
WHERE ({{BUCKET}}) % 1000 <
      CASE WHEN CAST(regexp_extract(stratum, '(\\d+)', 1) AS INT) % 2 = 0
           THEN 800 ELSE 400 END
""".replace("{BUCKET}", _BUCKET_SQL)


@register("curation_pipeline", _CURATION_ORACLE)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data pipeline over documents: quality >=
    0.75 AND lang = 'en' → exact-dedup keep-min → SimHash near-dup
    clusters keep-min → deterministic source-stratified sample (even
    sources 80%, odd 40%). One entry value-checks all five stages wired
    together (operators/curation.py)."""
    from saber_spark.operators.curation import curate_corpus

    return curate_corpus(_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# Keyword retrieval: BM25 top-k + exact heavy-hitter terms (one entry,
# strategy-tagged — operators/retrieval.py)
# --------------------------------------------------------------------------

_BM25_TERMS = ["spark", "window", "stream"]
_BM25_K = 25
_BM25_K1, _BM25_B = 1.2, 0.75

_BM25_SQL = f"""
WITH d AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents
), tokd AS (
  SELECT doc_id, w, len(w)::double AS dl,
         {', '.join(f"len(list_filter(w, x -> x = '{t}'))::double AS tf_{t}" for t in _BM25_TERMS)}
  FROM d
), stats AS (
  SELECT count(*)::double AS n_docs, avg(len(w))::double AS avgdl,
         {', '.join(f"sum(CASE WHEN list_contains(w, '{t}') THEN 1 ELSE 0 END)::double AS df_{t}" for t in _BM25_TERMS)}
  FROM d
), scored AS (
  SELECT doc_id,
         -- rank on round(.,6): ln() can differ by an ulp across engines,
         -- and the top-k CUT must pick the same row set as Spark
         round({' + '.join(
            f"(ln(1 + (n_docs - df_{t} + 0.5) / (df_{t} + 0.5))"
            f" * tf_{t} * {_BM25_K1 + 1.0}"
            f" / (tf_{t} + {_BM25_K1} * ({1.0 - _BM25_B} + {_BM25_B} * dl / avgdl)))"
            for t in _BM25_TERMS)}, 6) AS score
  FROM tokd CROSS JOIN stats
)
SELECT doc_id, score FROM scored WHERE score > 0
ORDER BY score DESC, doc_id ASC LIMIT {_BM25_K}
"""

_HEAVY_SQL = """
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

_RETRIEVAL_ORACLE = f"""
SELECT 'bm25' AS strategy, CAST(doc_id AS VARCHAR) AS key,
       score, CAST(NULL AS BIGINT) AS doc_freq
FROM ({_BM25_SQL})
UNION ALL
SELECT 'heavy_terms' AS strategy, term AS key,
       doc_frac AS score, doc_freq
FROM ({_HEAVY_SQL})
"""


@register("retrieval_bm25_terms", _RETRIEVAL_ORACLE)
def retrieval_bm25_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-retrieval surface in one entry: Okapi BM25 top-25 for a
    3-term query (corpus never shuffles — per-term tf is a Catalyst
    array expression, corpus stats are ONE broadcast single-row agg,
    top-k is TakeOrderedAndProject) union-tagged with the exact
    heavy-hitter vocabulary mine (per-doc DISTINCT terms, map-side
    combined hash agg). operators/retrieval.py."""
    from saber_spark.operators import retrieval as rt

    docs = _docs(spark, sf_dir)
    bm25 = rt.bm25_topk(docs, _BM25_TERMS, k=_BM25_K).select(
        F.lit("bm25").alias("strategy"),
        F.col("doc_id").cast("string").alias("key"),
        "score",
        F.lit(None).cast("long").alias("doc_freq"),
    )
    heavy = rt.heavy_hitter_terms(docs, min_doc_frac=0.5, top_n=50).select(
        F.lit("heavy_terms").alias("strategy"),
        F.col("term").alias("key"),
        F.col("doc_frac").alias("score"),
        "doc_freq",
    )
    return bm25.unionByName(heavy)
