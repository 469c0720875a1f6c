"""Incremental materialized-view maintenance through CDC.

The changelog stream (sources/iceberg_datasource.py mode='changelog')
exists so downstream state can follow a table that takes deletes and
merges WITHOUT re-scanning it. This module closes that loop: a windowed
aggregate MV over the source table, kept exact through arbitrary
history by folding each micro-batch's insert/delete events into the MV
as SIGNED deltas — an insert adds (+1, +value), a delete subtracts —
so a merge-on-read GDPR erasure or a MERGE upsert in the source
propagates to the aggregate without recomputation.

Why signed folding instead of a streaming groupBy: delete events carry
the ORIGINAL row's event time, so they are arbitrarily "late" for their
window — a watermarked append-mode aggregate would have already sealed
it. The MV table is the state (no watermark seals anything), each
micro-batch is one atomic Iceberg snapshot tagged with
``<query>:<batch_id>``, and a replayed batch is dropped by the same
commit-tag dedup the exactly-once sink uses — the fold is applied
exactly once per batch even across restarts.

Scale shape: the per-batch work is one groupBy of the BATCH's events
(small), then ONE of two fold paths picked per batch by MV size
(``fold_mode='auto'``, metadata-only row count):

- **overwrite** (small MV): scan the whole MV (aggregate cardinality,
  not source cardinality), full-outer join the deltas, rewrite — right
  while the MV fits a single rewrite.
- **merge** (large MV): scan ONLY the window_start range the batch
  touched (file-pruned), right-join the deltas, and ``merge_into`` on
  (window_start, keys) with ``delete_condition='n_rows <= 0'`` — files
  outside the touched key range are carried untouched, zeroed rows are
  deleted in the SAME atomic snapshot, and per-batch write cost is
  O(files overlapping the touched windows), not O(MV).

Reference analogue: none (Saber recomputes windows from its circular
buffer and persists nothing) — this is the north_rule's exactly-once
sink extended from "append results" to "maintain state".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.iceberg_format import AlreadyCommitted, IcebergTable


class WindowedAggregateMV:
    """Maintain ``(window_start, window_end, <keys...>, n_rows,
    sum_val)`` per tumbling event-time window (and optional group keys)
    of the SOURCE table, fed by its changelog stream. ``value_col``:
    the summed column (cast to long); rows whose count folds to zero
    leave the MV entirely. Create the MV table with ``schema_ddl()``
    (pass the key columns' DDL, e.g. ``"tool STRING"``)."""

    def __init__(
        self,
        mv_table: IcebergTable,
        query_name: str,
        window_s: int,
        ts_col: str = "ts",
        value_col: str | None = None,
        keys: tuple[str, ...] = (),
        fold_mode: str = "auto",
        merge_threshold_rows: int = 100_000,
    ) -> None:
        """``fold_mode``: 'overwrite' (always rewrite the whole MV),
        'merge' (always merge_into on the touched window range), or
        'auto' (default) — overwrite while the MV's live row count (from
        manifest record counts, no data read) is at or below
        ``merge_threshold_rows``, merge once it grows past."""
        if window_s <= 0:
            raise ValueError("window_s must be positive")
        if fold_mode not in ("auto", "overwrite", "merge"):
            raise ValueError(f"unknown fold_mode {fold_mode!r}")
        self.table = mv_table
        self.query_name = query_name
        self.window_s = window_s
        self.ts_col = ts_col
        self.value_col = value_col
        self.keys = tuple(keys)
        self.fold_mode = fold_mode
        self.merge_threshold_rows = merge_threshold_rows

    #: the keyless MV schema; with keys use schema_ddl("tool STRING")
    SCHEMA = (
        "window_start BIGINT, window_end BIGINT, "
        "n_rows BIGINT, sum_val BIGINT"
    )

    @staticmethod
    def schema_ddl(key_ddl: str = "") -> str:
        return (
            "window_start BIGINT, window_end BIGINT, "
            + (f"{key_ddl}, " if key_ddl else "")
            + "n_rows BIGINT, sum_val BIGINT"
        )

    def _tag(self, batch_id: int) -> str:
        return f"{self.query_name}:{batch_id}"

    def _fold(self, batch: DataFrame, batch_id: int) -> None:
        tag = self._tag(batch_id)
        if self.table.has_commit_tag(tag):
            return  # replayed batch: already folded, exactly once
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        val = (
            F.col(self.value_col).cast("long")
            if self.value_col is not None
            else F.lit(0).cast("long")
        )
        ws = (
            F.floor(
                F.col(self.ts_col).cast("timestamp").cast("long")
                / self.window_s
            )
            * self.window_s
        ).cast("long")
        group_cols = ["window_start", *self.keys]
        deltas = (
            batch.select(
                ws.alias("window_start"),
                *[F.col(k) for k in self.keys],
                sign.alias("_s"),
                (sign * F.coalesce(val, F.lit(0))).alias("_sv"),
            )
            .groupBy(*group_cols)
            .agg(
                F.sum("_s").cast("long").alias("d_n"),
                F.sum("_sv").cast("long").alias("d_sum"),
            )
        )
        # materialize the (tiny: windows-touched-this-batch) delta rows
        # ONCE — overwrite() would otherwise re-run the whole batch
        # aggregation when it writes, doubling per-batch source work
        spark = batch.sparkSession
        delta_rows = deltas.collect()
        if not delta_rows:
            return
        deltas = spark.createDataFrame(delta_rows, deltas.schema)

        mode = self.fold_mode
        if mode == "auto":
            # manifest record counts — a metadata read, never a data scan
            live_rows = sum(d["record_count"] for d in self.table.files())
            mode = (
                "overwrite"
                if live_rows <= self.merge_threshold_rows
                else "merge"
            )

        def folded(cur, how: str):
            return cur.join(deltas, group_cols, how).select(
                F.col("window_start"),
                (F.col("window_start") + self.window_s).alias("window_end"),
                *[F.col(k) for k in self.keys],
                (
                    F.coalesce(F.col("n_rows"), F.lit(0))
                    + F.coalesce(F.col("d_n"), F.lit(0))
                ).cast("long").alias("n_rows"),
                (
                    F.coalesce(F.col("sum_val"), F.lit(0))
                    + F.coalesce(F.col("d_sum"), F.lit(0))
                ).cast("long").alias("sum_val"),
            )

        try:
            if mode == "overwrite":
                merged = (
                    folded(self.table.scan(spark), "full_outer")
                    .where(F.col("n_rows") > 0)
                    .coalesce(1)
                )
                self.table.overwrite(merged, {"saber.commit-tag": tag})
            else:
                # merge path: scan ONLY the touched window_start range
                # (file-pruned), fold the touched keys, and commit the
                # upserts AND zero-row deletes as one atomic snapshot
                lo = min(r["window_start"] for r in delta_rows)
                hi = max(r["window_start"] for r in delta_rows)
                cur = self.table.scan(
                    spark,
                    filters=[
                        ("window_start", ">=", lo),
                        ("window_start", "<=", hi),
                    ],
                )
                self.table.merge_into(
                    spark,
                    folded(cur, "right"),
                    key_cols=list(group_cols),
                    summary_extra={"saber.commit-tag": tag},
                    delete_condition="n_rows <= 0",
                )
        except AlreadyCommitted:
            pass  # lost a race against our own replay — state is correct

    def start(self, cdc_stream: DataFrame, checkpoint_dir: str, **trigger):
        """Attach to a changelog stream (read_iceberg_changelog_stream)
        and maintain the MV; returns the StreamingQuery."""
        writer = (
            cdc_stream.writeStream.foreachBatch(self._fold)
            .option("checkpointLocation", checkpoint_dir)
            .queryName(self.query_name)
        )
        if trigger:
            writer = writer.trigger(**trigger)
        return writer.start()
