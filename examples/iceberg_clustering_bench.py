"""Measure what the sort-order rewrite (clustering) buys at the scan
layer: files pruned and bytes scanned for a selective ts-range query,
before vs after `rewrite_sorted(by=["ts"])`, on a synthetic transcript
table appended in conv-hash chunks (the layout a streaming sink or
hash-partitioned writer naturally produces — every file straddles the
whole time domain).

Writes BENCH/ICEBERG-CLUSTERING section data to stdout; the curated
numbers live in BENCH/ICEBERG.md.
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
LOC = os.path.join(REPO, ".tmp", "iceberg_clustering_bench")


def main() -> None:
    spark = get_spark("iceberg_clustering_bench", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    shutil.rmtree(LOC, ignore_errors=True)
    t_src = synthesize_transcripts(
        spark, n_turns=2_000_000, n_convs=20_000, seed=11, partitions=32
    ).localCheckpoint()
    table = IcebergTable.create(LOC, t_src)
    # 8 appends keyed on conv hash: every data file spans ~the full ts range
    for i in range(8):
        table.append(t_src.where(F.crc32(F.col("conv_id")) % 8 == i).repartition(4))

    lo, hi = t_src.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo).total_seconds()
    # a ~2% time slice out of the middle
    q_lo = lo + type(hi - lo)(seconds=span * 0.49)
    q_hi = lo + type(hi - lo)(seconds=span * 0.51)
    filt = [("ts", ">=", q_lo.strftime("%Y-%m-%d %H:%M:%S")),
            ("ts", "<=", q_hi.strftime("%Y-%m-%d %H:%M:%S"))]

    def probe(tag: str) -> dict:
        allf = table.files()
        kept = table.files(filters=filt)
        t0 = time.perf_counter()
        n = table.scan(spark, filters=filt).count()
        sec = round(time.perf_counter() - t0, 3)
        out = {
            "tag": tag,
            "files_total": len(allf),
            "files_after_pruning": len(kept),
            "bytes_total": sum(d["file_size_in_bytes"] for d in allf),
            "bytes_scanned": sum(d["file_size_in_bytes"] for d in kept),
            "rows_matched": n,
            "scan_sec": sec,
        }
        print(out, flush=True)
        return out

    before = probe("before (conv-hash append layout)")
    total = sum(d["file_size_in_bytes"] for d in table.files())
    t0 = time.perf_counter()
    table.rewrite_sorted(spark, by=["ts"], target_file_size_bytes=max(1, total // 32))
    rewrite_sec = round(time.perf_counter() - t0, 3)
    after = probe("after rewrite_sorted(by=[ts])")
    print({
        "rewrite_sec": rewrite_sec,
        "bytes_scanned_ratio": round(after["bytes_scanned"] / max(1, before["bytes_scanned"]), 4),
        "files_ratio": round(after["files_after_pruning"] / max(1, before["files_after_pruning"]), 4),
    }, flush=True)
    assert before["rows_matched"] == after["rows_matched"]

    # -- z-order vs linear sort: the pruning-balance trade --------------------
    # Three predicate shapes against both clustered layouts. A linear ts
    # sort concentrates ALL pruning power in ts; z-order spreads it
    # across both dimensions. Expect: linear wins tight ts-only slices,
    # z-order wins second-dimension-only and mixed-moderate queries.
    w_lo = lo + type(hi - lo)(seconds=span * 0.40)
    w_hi = lo + type(hi - lo)(seconds=span * 0.60)
    fmt = lambda d: d.strftime("%Y-%m-%d %H:%M:%S")  # noqa: E731
    preds = {
        "ts 2% slice": filt,
        "turn_idx 10..20 only": [("turn_idx", ">=", 10), ("turn_idx", "<=", 20)],
        "ts 20% AND turn_idx 10..20": [
            ("ts", ">=", fmt(w_lo)), ("ts", "<=", fmt(w_hi)),
            ("turn_idx", ">=", 10), ("turn_idx", "<=", 20),
        ],
    }

    def probe_preds(layout: str) -> dict:
        allf = table.files()
        total_b = sum(d["file_size_in_bytes"] for d in allf)
        out = {}
        for tag, fl in preds.items():
            kept = table.files(filters=fl)
            rows = table.scan(spark, filters=fl).count()
            out[tag] = {
                "files": f"{len(kept)}/{len(allf)}",
                "bytes_pct": round(
                    100 * sum(d["file_size_in_bytes"] for d in kept) / total_b, 2
                ),
                "rows": rows,
            }
        print({layout: out}, flush=True)
        return out

    lin = probe_preds("linear rewrite_sorted(by=[ts])")
    t0 = time.perf_counter()
    table.rewrite_zorder(
        spark, by=["ts", "turn_idx"], target_file_size_bytes=max(1, total // 32)
    )
    z_sec = round(time.perf_counter() - t0, 3)
    zed = probe_preds("rewrite_zorder(by=[ts, turn_idx])")
    print({"zorder_rewrite_sec": z_sec}, flush=True)
    for tag in preds:
        assert lin[tag]["rows"] == zed[tag]["rows"], tag


if __name__ == "__main__":
    main()
