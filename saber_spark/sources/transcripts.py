"""The `transcripts` table — the engine's primary input shape.

Schema (BASELINE.json input_hint):
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Two providers:

1. ``derive_transcripts`` — a *pure, deterministic* derivation from the
   driver-provided ``events`` table. The same derivation exists as a SQL
   CTE (``TRANSCRIPTS_CTE``) so DuckDB oracles can reproduce it exactly:
   every transcript query therefore gets a value-level oracle.
2. ``synthesize_transcripts`` — a seeded arithmetic generator built on
   ``spark.range`` (no driver-side loops, no external data) with a
   Zipf-skewed conv_id distribution to exercise salting/skew handling,
   and controlled cross-conversation timestamp disorder to exercise
   watermarks. Used by streaming tests and the scale bench.

The reference engine's input is an unbounded byte-stream of fixed 32-byte
tuples with a leading int64 timestamp (reference ``TupleSchema.java:53-54``,
``TestAggregation.java:104-124``); transcripts are our typed, string-bearing
generalization of that stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: invariant: (conv_id, turn_idx) is a primary key; ts monotone per conv_id.
TRANSCRIPT_COLUMNS = ("conv_id", "turn_idx", "role", "text", "tool", "ts")

_ROLES = ("user", "assistant", "tool")
_TOOLS = ("", "search", "code", "browse")


def derive_transcripts(events: DataFrame) -> DataFrame:
    """events -> transcripts, deterministically (mirror of TRANSCRIPTS_CTE).

    conv_id : 'conv-<user_id>'
    turn_idx: dense 0..n-1 per conversation in (ts, event_id) order
    role    : cycles user/assistant/tool by turn_idx
    text    : event_type + props + variable-length deterministic padding
    tool    : one of ''/search/code/browse keyed on event_id
    ts      : event timestamp (monotone per conv by construction)
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.withColumn("turn_idx", (F.row_number().over(w) - F.lit(1)).cast("int"))
        .select(
            F.concat(F.lit("conv-"), F.col("user_id").cast("string")).alias("conv_id"),
            F.col("turn_idx"),
            F.when(F.col("turn_idx") % 3 == 0, _ROLES[0])
            .when(F.col("turn_idx") % 3 == 1, _ROLES[1])
            .otherwise(_ROLES[2])
            .alias("role"),
            F.concat(
                F.col("event_type"),
                F.lit(" "),
                F.col("props"),
                F.lit(" "),
                F.expr("repeat('tok ', CAST(event_id % 7 AS INT))"),
            ).alias("text"),
            F.when(F.col("event_id") % 4 == 0, _TOOLS[0])
            .when(F.col("event_id") % 4 == 1, _TOOLS[1])
            .when(F.col("event_id") % 4 == 2, _TOOLS[2])
            .otherwise(_TOOLS[3])
            .alias("tool"),
            F.col("ts"),
        )
    )


#: DuckDB CTE producing byte-identical rows to ``derive_transcripts``.
#: Prepend to oracle SQL: f"{TRANSCRIPTS_CTE} SELECT ... FROM transcripts".
TRANSCRIPTS_CTE = """
WITH _ev AS (
    SELECT user_id, event_id, event_type, props, ts,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx
    FROM events
),
transcripts AS (
    SELECT 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
           turn_idx,
           CASE turn_idx % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
           event_type || ' ' || props || ' ' || repeat('tok ', CAST(event_id % 7 AS INTEGER)) AS text,
           CASE event_id % 4 WHEN 0 THEN '' WHEN 1 THEN 'search' WHEN 2 THEN 'code' ELSE 'browse' END AS tool,
           ts
    FROM _ev
)
"""


def with_transcripts_oracle(select_sql: str) -> str:
    """Wrap a SELECT over `transcripts` with the derivation CTE for DuckDB."""
    return f"{TRANSCRIPTS_CTE}\n{select_sql}"


def synthesize_transcripts(
    spark: SparkSession,
    n_turns: int = 1_000_000,
    n_convs: int = 10_000,
    seed: int = 42,
    zipf_exponent: float = 3.0,
    start_ts: str = "2024-01-01 00:00:00",
    step_ms: int = 250,
    disorder_ms: int = 30_000,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic, fully-distributed transcript synthesis.

    Built on ``spark.range`` + hash arithmetic: every column is a pure
    function of the row id and the seed, so the same call yields the same
    rows at any parallelism (no RNG state, no driver loops).

    Skew: conv assignment is ``floor(n_convs * u^zipf_exponent)`` for a
    uniform hash ``u`` — a few conversations receive most turns (hot keys
    for salting tests). Disorder: a per-conv offset of up to
    ``disorder_ms`` shifts conversations against each other, so global ts
    order is only approximate (exercises watermarks) while ts stays
    strictly monotone *within* each conversation.
    """
    rng = spark.range(0, n_turns, numPartitions=partitions)
    u = (F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(1_000_000)) / 1_000_000.0)
    conv = F.floor(F.lit(n_convs) * F.pow(u, F.lit(zipf_exponent))).cast("long")
    df = rng.select(F.col("id"), conv.alias("conv"))
    w = Window.partitionBy("conv").orderBy("id")
    words = F.array(*[F.lit(x) for x in (
        "alpha", "beta", "gamma", "delta", "tensor", "spark", "window",
        "stream", "pane", "merge", "state", "batch", "join", "agg",
        "shuffle", "arrow",
    )])
    word_at = lambda k: F.element_at(  # noqa: E731
        words, (F.pmod(F.xxhash64(F.col("id"), F.lit(seed + k)), F.lit(16)) + 1).cast("int")
    )
    offset_ms = (
        F.col("id") * F.lit(step_ms)
        + F.pmod(F.xxhash64(F.col("conv"), F.lit(seed)), F.lit(disorder_ms))
    )
    return df.select(
        F.concat(F.lit("conv-"), F.col("conv").cast("string")).alias("conv_id"),
        (F.row_number().over(w) - F.lit(1)).cast("int").alias("turn_idx"),
        F.col("id"),
        offset_ms.alias("_off_ms"),
    ).select(
        "conv_id",
        "turn_idx",
        F.when(F.col("turn_idx") % 3 == 0, _ROLES[0])
        .when(F.col("turn_idx") % 3 == 1, _ROLES[1])
        .otherwise(_ROLES[2])
        .alias("role"),
        F.concat_ws(
            " ", word_at(1), word_at(2), word_at(3), word_at(4),
            F.expr("repeat('pad ', CAST(id % 11 AS INT))"),
        ).alias("text"),
        F.element_at(
            F.array(*[F.lit(t) for t in _TOOLS]),
            (F.pmod(F.col("id"), F.lit(4)) + 1).cast("int"),
        ).alias("tool"),
        F.timestamp_millis(
            (F.unix_timestamp(F.lit(start_ts)) * 1000 + F.col("_off_ms")).cast("long")
        ).alias("ts"),
    )
