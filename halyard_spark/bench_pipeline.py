"""Single-parallelism pipeline benchmark (subprocess worker for bench.py).

Runs the full KG-construct pipeline (extract -> link -> canonicalize ->
triples -> materialize -> stats) on a deterministic corpus and prints one
JSON line: {"cpus", "n_files", "wall_sec", "triples", "triples_per_sec"}.

Invoked at two parallelism levels (local[8] / local[32]) on IDENTICAL
input to evidence the N->4N scaling-efficiency criterion (BASELINE.md) —
one JVM per process because master can't change within a JVM.

Timing starts AFTER the session and input parquet exist: JVM startup is
not part of job throughput (the cluster analog is a long-running app).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--n-files", type=int, default=20000)
    ap.add_argument("--content-scale", type=int, default=10)
    ap.add_argument("--out", required=True)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    from halyard_spark import corpus
    from halyard_spark.pipeline import extract, run
    from halyard_spark.session import get_spark

    spark = get_spark(cpus=args.cpus, app_name=f"bench_pipeline_{args.cpus}",
                      shuffle_partitions=max(args.cpus, 8))

    src_path = f"{args.out}/src"
    corpus.generate_src(spark, args.n_files, content_scale=args.content_scale).write.mode(
        "overwrite"
    ).parquet(src_path)
    src = spark.read.parquet(src_path)

    # Warm the python worker pool (fork + pandas import per executor slot)
    # before the timed region: a long-running cluster app is in this
    # steady state; cold-fork cost is a session constant, not throughput.
    extract.extract_mentions(src.limit(4 * args.cpus)).count()

    if not args.resume:
        shutil.rmtree(f"{args.out}/kg", ignore_errors=True)

    t0 = time.time()
    report = run.run_pipeline(spark, src, f"{args.out}/kg", resume=args.resume)
    wall = time.time() - t0

    triples = report["_total"]["triples"]
    print(json.dumps({
        "cpus": args.cpus,
        "n_files": args.n_files,
        "wall_sec": round(wall, 3),
        "triples": triples,
        "triples_per_sec": round(triples / wall, 1),
        "stages": {k: v for k, v in report.items() if k != "_total"},
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
