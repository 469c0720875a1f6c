"""Storage-level bucketing: co-located joins and aggregations.

At 100 TB the dominant cost of a repeated conv_id join or aggregation is
the shuffle of the fact table. Bucketing moves that shuffle to WRITE
time, once: both sides stored with ``bucketBy(n, key)`` hash-place rows
by ``hash(key) % n`` into fixed buckets, so any later equi-join or
group-by on the bucket key reads co-located buckets and Catalyst drops
the Exchange entirely (asserted in tests/test_bucketed.py on the
executed plan). That is the right layout for the transcript tables this
engine targets — every headline query keys on ``conv_id``:

- stream-static enrichment joins (theta/as-of) hit the bucketed static
  side without re-shuffling it per micro-batch;
- repeated batch analytics (sessionization, per-conversation rollups)
  pay zero exchanges after the one bucketed write;
- bucket counts should be sized so one bucket ≈ one executor-core task
  at target scale (n_buckets ≈ input_bytes / 128 MB), and the bucket
  key must be the high-cardinality ``conv_id`` — bucketing on a skewed
  low-cardinality key recreates the hot-partition problem at write time.

Bucket metadata lives in the session catalog (``saveAsTable``) — a
path-based parquet read loses it, which is why this layer goes through
table names. Reference analogue: Saber keys its windowed joins and
group-bys on the stream attribute and co-locates by task dispatch
(scheduling/*.java); Spark's storage bucketing is the batch-world
equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str] | str,
    n_buckets: int,
    sort_keys: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed catalog table. ``sort_keys`` adds
    within-bucket sort order (lets sort-merge joins skip or shrink the
    per-partition sort when files-per-bucket is 1)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort_keys:
        sort_keys = (
            [sort_keys] if isinstance(sort_keys, str) else list(sort_keys)
        )
        w = w.sortBy(*sort_keys)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their bucket key(s). When both sides
    are bucketed with the same key and bucket count, the plan contains
    no Exchange — the join reads co-located buckets directly."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
