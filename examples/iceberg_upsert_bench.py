"""Measure the upsert write-cost trade: copy-on-write MERGE
(merge_into — rewrites every affected data file) vs the merge-on-read
row-delta (upsert_by_key — one snapshot of new files + an
equality-delete of the keys). Identical sequences of keyed upserts land
on two copies of a 2M-turn table; per-upsert commit seconds and scan
cost before/after compaction are reported.

Curated numbers live in BENCH/ICEBERG.md §10.
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from saber_spark.session import get_spark
from saber_spark.sources.iceberg_format import IcebergTable
from saber_spark.sources.transcripts import synthesize_transcripts

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    spark = get_spark(
        "iceberg_upsert_bench", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    )
    src = synthesize_transcripts(
        spark, n_turns=2_000_000, n_convs=20_000, seed=17, partitions=32
    ).localCheckpoint()
    # per-upsert batch: one conversation's turns, edited (~100 rows)
    batches = [
        src.where(F.col("conv_id") == f"conv-{i}").withColumn(
            "text", F.concat(F.lit(f"edit{i}: "), F.col("text"))
        ).localCheckpoint()
        for i in (11, 12, 13, 14)
    ]
    keys = ["conv_id", "turn_idx"]
    results = {}
    for mode in ("cow", "mor"):
        loc = os.path.join(REPO, ".tmp", f"upsert_bench_{mode}")
        shutil.rmtree(loc, ignore_errors=True)
        t = IcebergTable.create(loc, src)
        # 8 ts-clustered files, the post-maintenance layout
        t.append(src.repartitionByRange(8, "ts"))
        secs = []
        for b in batches:
            t0 = time.perf_counter()
            if mode == "cow":
                t.merge_into(spark, b, keys)
            else:
                t.upsert_by_key(spark, b, keys)
            secs.append(round(time.perf_counter() - t0, 3))
        t0 = time.perf_counter()
        n = t.scan(spark).count()
        scan_s = round(time.perf_counter() - t0, 3)
        files_written = sum(
            int(s["summary"].get("added-data-files", "0"))
            for s in t.snapshots()[1:]
        )
        results[mode] = {
            "per_upsert_sec": secs,
            "files_written_by_upserts": files_written,
            "rows": n,
            "scan_sec_with_deltas": scan_s,
        }
        if mode == "mor":
            t0 = time.perf_counter()
            t.rewrite_data_files(spark, min_input_files=1)
            results[mode]["compact_sec"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            assert t.scan(spark).count() == n
            results[mode]["scan_sec_after_compact"] = round(
                time.perf_counter() - t0, 3
            )
            assert t.equality_delete_files() == []
        print({mode: results[mode]}, flush=True)
    # both paths must agree on final content
    a = IcebergTable.load(os.path.join(REPO, ".tmp", "upsert_bench_cow"))
    b = IcebergTable.load(os.path.join(REPO, ".tmp", "upsert_bench_mor"))
    # '|' separators: without them ('conv-1', 11) and ('conv-11', 1)
    # would alias to the same checksum input
    chk = "sum(crc32(concat_ws('|', conv_id, turn_idx, text)))"
    ca = a.scan(spark).selectExpr(chk).first()[0]
    cb = b.scan(spark).selectExpr(chk).first()[0]
    assert ca == cb, "cow and mor upserts diverged"
    print({"content_checksum_match": True}, flush=True)


if __name__ == "__main__":
    main()
