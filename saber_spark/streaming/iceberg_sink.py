"""Exactly-once streaming sink into a from-scratch Iceberg-format table.

The north_rule names "an exactly-once idempotent Iceberg sink with
per-partition checkpointed state, lineage, and metrics, resumable
mid-stream" as the deliverable. ``sink.py`` proves the commit protocol
on a flat parquet layout; this sink is the full table-format version on
``sources/iceberg_format.py``:

- **Idempotence**: every micro-batch commits ONE Iceberg snapshot whose
  summary carries ``saber.commit-tag = <query_name>:<batch_id>``. A
  re-driven batch (Spark re-runs foreachBatch after failures with the
  same batch_id) finds its tag in the snapshot history inside the same
  optimistic-commit loop that publishes the metadata version, so the
  check-and-commit is atomic even under concurrent writers — the
  duplicate commit is dropped, its data files become unreferenced
  orphans (invisible to readers; reclaimed by remove_orphan_files).
  This is exactly how Iceberg's own Spark sink dedups on
  (queryId, epochId).
- **Resume**: offsets/state live in the Spark checkpoint; restarting
  with the same checkpoint_dir + query_name continues after the last
  committed snapshot, and the tag check absorbs the one batch that may
  replay across the restart boundary.
- **Lineage/metrics**: the snapshot chain (parent-snapshot-id links) is
  the lineage; summaries carry row counts and event-time→commit-time
  latency percentiles per batch, read back as a DataFrame by
  ``lineage()``.

Reference analogue: Saber re-dispatches result buffers in arrival order
and persists nothing (ResultAggregator.java:164-209); exactly-once
storage is new engineering the north_rule adds on top.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.iceberg_format import AlreadyCommitted, IcebergTable
from .sink import LATENCY_PCTS


class ExactlyOnceIcebergSink:
    def __init__(
        self,
        table: IcebergTable,
        checkpoint_dir: str,
        query_name: str,
        event_ts_col: str | None = None,
        coalesce: int | None = None,
        merge_keys: list[str] | None = None,
        merge_mode: str = "cow",
        auto_compact: dict | None = None,
    ) -> None:
        if merge_mode not in ("cow", "mor"):
            raise ValueError("merge_mode must be 'cow' or 'mor'")
        # MoR read-amplification bound: thresholds forwarded to
        # IcebergTable.compact_if_needed after each 'mor' commit (e.g.
        # {"max_delete_files": 8}; {} = defaults; None disables — manual
        # maintenance). The trigger check is metadata-only, and a crash
        # between commit and compaction is safe: compaction is a replace
        # snapshot that the next over-threshold batch simply re-attempts.
        self.auto_compact = auto_compact
        self.table = table
        self.checkpoint_dir = checkpoint_dir
        self.query_name = query_name
        self.event_ts_col = event_ts_col
        # with merge_keys: 'cow' MERGEs each batch copy-on-write (write
        # amplification ∝ affected data files — read-free afterwards),
        # 'mor' commits the batch's rows + an equality-delete of their
        # keys in ONE snapshot (upsert_by_key: O(batch) writes per
        # trigger — the only sane shape when update-mode re-emits keys
        # every batch at scale; readers anti-join the accumulated tuples
        # until rewrite_data_files folds them). Same exactly-once tags.
        self.merge_mode = merge_mode
        # update-mode upsert: when set, each micro-batch is MERGEd into
        # the table on these key columns (copy-on-write, one snapshot)
        # instead of appended — the production shape for update-mode
        # streams where a window's row is re-emitted with corrected
        # values as late data arrives (SURVEY.md §7 Phase 4: "MERGE
        # keyed on window+key, dedup by batchId"). Leave None for
        # append-mode streams (each result row emitted exactly once).
        self.merge_keys = merge_keys
        # files-per-commit bound. Iceberg writers target few large files
        # per commit (write.target-file-size-bytes); a windowed AGGREGATE
        # batch is tiny, so without this each commit lands one file per
        # shuffle partition per table partition and the table degrades
        # into thousands of KB-sized files (observed: a 2k-row result
        # spread over ~2000 files = ~2000 scan tasks). Leave None for
        # high-volume sinks where shuffle parallelism should be kept.
        self.coalesce = coalesce

    def _tag(self, batch_id: int) -> str:
        return f"{self.query_name}:{batch_id}"

    def _foreach_batch(self, df: DataFrame, batch_id: int) -> None:
        tag = self._tag(batch_id)
        if self.table.has_commit_tag(tag):
            return  # fast path; the commit loop re-checks atomically
        if self.coalesce is not None:
            df = df.coalesce(self.coalesce)
        summary = {
            "saber.commit-tag": tag,
            "saber.batch-id": str(batch_id),
            "saber.committed-at": f"{time.time():.3f}",
        }
        # persist: the latency-percentile scan and the data-file write are
        # two actions on the same batch plan — without a cache the whole
        # micro-batch (incl. stateful aggregation) would execute twice
        df.persist()
        try:
            if df.isEmpty():
                # nothing to commit — and a MERGE with an empty source
                # would prune nothing and copy-on-write-rewrite EVERY
                # live file (a full-table rewrite per idle trigger)
                return
            if self.event_ts_col and self.event_ts_col in df.columns:
                lat_ms = (
                    F.lit(time.time())
                    - F.col(self.event_ts_col).cast("timestamp").cast("double")
                ) * 1000.0
                row = df.agg(
                    F.percentile_approx(
                        lat_ms, F.array(*[F.lit(p) for p in LATENCY_PCTS]), 10_000
                    ).alias("pcts")
                ).collect()[0]
                if row["pcts"] is not None:
                    for p, v in zip(LATENCY_PCTS, row["pcts"]):
                        summary[f"saber.latency-p{int(p * 100)}-ms"] = f"{v:.3f}"
            try:
                if self.merge_keys and self.merge_mode == "mor":
                    self.table.upsert_by_key(
                        df.sparkSession, df, self.merge_keys, summary_extra=summary
                    )
                    if self.auto_compact is not None:
                        self.table.compact_if_needed(
                            df.sparkSession, **self.auto_compact
                        )
                elif self.merge_keys:
                    self.table.merge_into(
                        df.sparkSession, df, self.merge_keys, summary_extra=summary
                    )
                else:
                    self.table.append(df, summary_extra=summary)
            except AlreadyCommitted:
                pass  # lost the re-drive race to an identical commit: done
        finally:
            df.unpersist()

    def start(self, df: DataFrame, output_mode: str = "append", **trigger):
        writer = (
            df.writeStream.outputMode(output_mode)
            .option("checkpointLocation", self.checkpoint_dir)
            .queryName(self.query_name)
            .foreachBatch(self._foreach_batch)
        )
        if trigger:
            writer = writer.trigger(**trigger)
        return writer.start()

    def read_committed(self, spark: SparkSession) -> DataFrame:
        """The exactly-once view = a snapshot-isolated scan of the table
        (only committed snapshots are reachable from metadata)."""
        return self.table.scan(spark)

    def lineage(self, spark: SparkSession) -> DataFrame:
        """One row per committed micro-batch snapshot: ids, parent link,
        rows, files, commit time, latency percentiles."""
        rows = []
        for s in self.table.snapshots():
            sm = s["summary"]
            tag = sm.get("saber.commit-tag", "")
            if not tag.startswith(f"{self.query_name}:"):
                continue
            rows.append(
                (
                    int(sm["saber.batch-id"]),
                    s["snapshot-id"],
                    s.get("parent-snapshot-id"),
                    s["sequence-number"],
                    int(sm.get("added-records", "0")),
                    int(sm.get("added-data-files", "0")),
                    float(sm["saber.committed-at"]),
                    *[
                        float(sm[k]) if (k := f"saber.latency-p{int(p*100)}-ms") in sm else None
                        for p in LATENCY_PCTS
                    ],
                )
            )
        return spark.createDataFrame(
            sorted(rows),
            "batch_id long, snapshot_id long, parent_snapshot_id long, "
            "sequence_number long, n_rows long, n_files long, committed_at double, "
            "p5_ms double, p25_ms double, p50_ms double, p75_ms double, p99_ms double",
        )
