"""Extra benchmarks — guide §1.4 noop-sink isolation per headline query.

NOT part of the frozen driver contract (bench.py is the measured harness).
This file exists so optimization work can (a) time each declared query in
isolation with the no-op sink — which computes every column of every row
without paying sink costs — and (b) capture ``explain("formatted")`` plans
into plans/r06/ for before/after evidence.

Usage:
  python bench_extra.py                       # all headline queries, tag=adhoc
  python bench_extra.py --tag before          # plans/r06/<q>_before.txt
  python bench_extra.py --queries path_closure,cc_components --runs 3
  python bench_extra.py --all-catalog         # every declared query (slow)

Environment: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same as bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "q1_pricing_summary",
    "bgp_join_region",
    "order_limit_topk",
    "kg_triples",
    "kg_bgp",
    "path_closure",
    "cc_components",
    "dedup_minhash",
    "simsearch_topk",
    "text_quality",
    "events_window_agg",
    "window_topk_group",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default=None, help="write plans/r06/<q>_<tag>.txt")
    ap.add_argument("--queries", default=None, help="comma-separated subset")
    ap.add_argument("--runs", type=int, default=1, help="timed repeats; min is kept")
    ap.add_argument("--all-catalog", action="store_true")
    ap.add_argument("--no-noop", action="store_true", help="skip the noop write timing")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from halyard_spark.session import get_spark

    spark = get_spark(cpus=CPUS, app_name="bench_extra")
    qs = entrymod.queries()
    names = (
        args.queries.split(",") if args.queries
        else (list(qs) if args.all_catalog else HEADLINE)
    )

    # warm python workers + parquet footers (same as bench.py)
    qs["q1_pricing_summary"](spark, SF_DIR).count()

    plan_dir = os.path.join(REPO, "plans", "r06")
    if args.tag:
        os.makedirs(plan_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        counts, noops = [], []
        for r in range(args.runs):
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.count()
            counts.append(round(time.time() - t0, 3))
            if not args.no_noop:
                t0 = time.time()
                df = qs[name](spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                noops.append(round(time.time() - t0, 3))
        if args.tag:
            with open(os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(qs[name](spark, SF_DIR)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
        rec = {"count_sec": min(counts), "count_all": counts}
        if noops:
            rec["noop_sec"] = min(noops)
            rec["noop_all"] = noops
        out[name] = rec
        print(f"{name}: count={counts} noop={noops}", flush=True)
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "results": out}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
