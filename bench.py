#!/usr/bin/env python
"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "turns_per_sec": ..., "cpus": ...}

Each headline query is materialized with the noop sink (full execution,
no write cost). The throughput figure is transcript turns processed per
second summed over the headline set — the BASELINE.json metric.

Scaling evidence (north_rule: N→4N efficiency ≥ 0.8) is produced by
``python bench.py --scaling``, which re-runs this script at two
parallelism levels in fresh JVMs and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

#: queries timed by the bench (Saber's benchmark shapes; grows per phase)
HEADLINE = [
    "ysb_windowed_agg",
    "cm1_grouped_sliding_agg",
    "cm1_pane_fanout",
    "cm1_pane_incremental",
    "cm2_filtered_grouped_agg",
    "w1_deep_projection_groupby",
    "w3_wide_or_selection",
    "row_window_sliding_agg",
]


def run_bench(sf_dir: str, cpus: int) -> dict:
    from saber_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name=f"saber_bench_{cpus}", cpus=cpus,
                      shuffle_partitions=max(cpus, 8))
    qs = entrymod.queries()
    from saber_spark.sources.tables import load_table

    n_turns = load_table(spark, sf_dir, "events").count()

    def materialize(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warmup: JVM/codegen/Arrow paths
    materialize(qs[HEADLINE[0]](spark, sf_dir))

    per_query: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        per_query[name] = round(materialize(qs[name](spark, sf_dir)), 3)

    total = sum(per_query.values())
    streaming = _streaming_throughput(spark, sf_dir, n_turns)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    return {
        "streaming": streaming,
        "metric": "headline_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "turns_per_sec": round(n_turns * len(per_query) / total, 1),
        "n_turns": n_turns,
        "cpus": cpus,
    }


def _streaming_throughput(spark, sf_dir: str, n_turns: int) -> dict:
    """Sustained streaming turns/sec: YSB windowed agg over chronological
    micro-batches (file source, availableNow) — the BASELINE.json metric."""
    import shutil
    import pyspark.sql.functions as F
    from saber_spark.plans.streaming_queries import _stage_chunks, _stream_schema
    from saber_spark.streaming.jobs import read_transcript_stream, streaming_windowed_aggregate
    from saber_spark.operators.aggregation import AggSpec
    from saber_spark.operators.windows import RANGE, WindowDef

    path = _stage_chunks(spark, sf_dir, "bench", n_files=8)
    ckpt = os.path.join(REPO, ".tmp", "bench_stream_ckpt")
    shutil.rmtree(ckpt, ignore_errors=True)
    stream = read_transcript_stream(spark, f"{path}/chunk=*",
                                    max_files_per_trigger=1, schema=_stream_schema())
    agg = streaming_windowed_aggregate(
        stream.where(F.col("role") == "assistant"),
        WindowDef(RANGE, 600),
        [AggSpec("cnt", "*", "n_turns"), AggSpec("sum", "text_len", "sum_len"),
         AggSpec("avg", "text_len", "avg_len")],
        watermark="30 minutes",
    )
    t0 = time.perf_counter()
    q = (agg.writeStream.outputMode("append").format("noop")
         .option("checkpointLocation", ckpt).trigger(availableNow=True).start())
    q.awaitTermination(600)
    elapsed = time.perf_counter() - t0
    progress = [p for p in q.recentProgress if p.get("numInputRows", 0) > 0]
    q.stop()
    return {
        "sec": round(elapsed, 3),
        "turns_per_sec": round(n_turns / elapsed, 1),
        "n_micro_batches": len(progress),
    }


def run_scaling(sf_dir: str, levels: tuple[int, int] = (8, 32)) -> None:
    """Run the bench at two parallelism levels in fresh JVMs; write
    BENCH/BASELINE.md with throughput at both + scaling efficiency."""
    results = []
    for cpus in levels:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True, cwd=REPO,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))
    lo, hi = results
    ratio = levels[1] / levels[0]
    speedup = lo["value"] / hi["value"]
    efficiency = speedup / ratio
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write(
            "# BENCH — scaling evidence (north_rule: N→4N efficiency ≥ 0.8)\n\n"
            f"Same input ({sf_dir}), same headline queries, two local\n"
            f"parallelism levels in fresh JVMs (sandbox stand-in for N vs 4N\n"
            f"executors per BASELINE.md).\n\n"
            "| cpus | total sec | turns/sec |\n|---|---|---|\n"
        )
        for cpus, r in zip(levels, results):
            f.write(f"| local[{cpus}] | {r['value']} | {r['turns_per_sec']} |\n")
        f.write(
            f"\n- speedup {levels[0]}→{levels[1]} cores: **{speedup:.2f}×** "
            f"(ideal {ratio:.0f}×)\n"
            f"- scaling efficiency: **{efficiency:.2f}**"
            f" ({'PASS' if efficiency >= 0.8 else 'BELOW'} 0.8 target)\n\n"
            "Per-query seconds:\n\n```json\n"
            + json.dumps({f"local[{c}]": r["queries"] for c, r in zip(levels, results)}, indent=2)
            + "\n```\n"
        )
    print(json.dumps({"scaling_efficiency": round(efficiency, 3),
                      "speedup": round(speedup, 2), "written": path}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true",
                    help="run at two parallelism levels and write BENCH/BASELINE.md")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                       "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()
    if args.scaling:
        run_scaling(args.sf_dir)
    else:
        print(json.dumps(run_bench(args.sf_dir, args.cpus)))
