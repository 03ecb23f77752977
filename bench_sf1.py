"""sf1.0 scale rehearsal (one-shot, run manually; results land in
BENCH/SF1_REHEARSAL.md).

All routine scaling evidence is measured at sf0.1-equivalent size
(~23M triples); this rehearsal runs the SAME workload shapes once at
10x (~230M triples) at local[32] to confirm per-stage walls grow
~linearly and nothing driver-side (convergence signatures, manifest
writes, closure checkpoints) turns super-linear:

1. the full KG-construct pipeline at n_files=2,000,000 (10x the 200k
   scaling corpus; deterministic generator, identical content shape) —
   per-stage walls + end-to-end triples/sec;
2. the most expensive catalog operators over 10x-scaled inputs with
   the exact structure of their sf0.1 counterparts (__spark_entry__
   builds chains of 50 over `part`; here the same chains over a range
   10x the sf0.1 part count — same operator code path):
   transitive closure, bound-source BFS, connected components, and
   MinHash LSH over a 10x-replicated documents table.

Usage:  python bench_sf1.py [--files N] [--skip-pipeline]
Prints one JSON line and rewrites BENCH/SF1_REHEARSAL.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_FILES = 2_000_000
N_CHAIN = 200_000  # 10x sf0.1 part (20k keys in chains of 50)
DOC_REPL = 10


def chain_edges(spark, n):
    from pyspark.sql import functions as F

    r = spark.range(n).select(F.col("id").cast("int").alias("k"))
    return (
        r.where(F.col("k") % 50 != 49)
        .where(F.col("k") + 1 < n)
        .select(
            F.col("k").cast("string").alias("src"),
            (F.col("k") + 1).cast("string").alias("dst"),
        )
    )


def run_queries(spark) -> dict:
    from pyspark.sql import functions as F

    from halyard_spark.ops import dedup as D
    from halyard_spark.pipeline import cc as CC
    from halyard_spark.query import path as PATH

    out = {}

    def timed(name, fn):
        t0 = time.time()
        n = fn()
        out[name] = {"wall_sec": round(time.time() - t0, 2), "rows": n}
        print(f"  {name}: {out[name]}", flush=True)

    edges = chain_edges(spark, N_CHAIN)
    timed("path_closure_10x",
          lambda: PATH.transitive_closure(edges, min_length=1).count())
    sources = (
        spark.range(0, 5001, 50)
        .select(F.col("id").cast("string").alias("src"))
    )
    timed("path_from_source_10x",
          lambda: PATH.reachable_from(edges, sources, min_length=1).count()
          if hasattr(PATH, "reachable_from")
          else PATH.transitive_closure(edges, min_length=1)
          .join(sources, "src").count())
    pad = lambda c: F.lpad(c, 10, "0")
    timed("cc_components_10x",
          lambda: CC.connected_components(
              edges.select(pad("src").alias("src"), pad("dst").alias("dst"))
          ).count())
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    id_col = "doc_id" if "doc_id" in docs.columns else docs.columns[0]
    repl = spark.range(DOC_REPL).select(F.col("id").alias("__r"))
    docs10 = docs.crossJoin(repl).withColumn(
        id_col,
        F.concat(F.col(id_col).cast("string"), F.lit("#"), F.col("__r")),
    ).drop("__r")
    timed("dedup_minhash_10x",
          lambda: D.minhash_lsh_pairs(docs10, n=2, k=6, bands=6,
                                      max_df=2000).count())
    return out


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=N_FILES)
    ap.add_argument("--skip-pipeline", action="store_true")
    args = ap.parse_args()

    result: dict = {"rehearsal": "sf1.0", "n_files": args.files}
    if not args.skip_pipeline:
        from bench import run_pipeline_subprocess

        import tempfile

        with tempfile.TemporaryDirectory(prefix="sf1_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None) as tmp:
            result["pipeline"] = run_pipeline_subprocess(
                32, f"{tmp}/kg", args.files, 20
            )

    from halyard_spark import get_spark

    spark = get_spark(cpus=32)
    print("queries at 10x:", flush=True)
    result["queries_10x"] = run_queries(spark)

    path = os.path.join(REPO, "BENCH", "SF1_REHEARSAL.md")
    if os.path.exists(path):
        # A rehearsal record already exists (with its analysis); append
        # this run as a dated re-run section instead of clobbering it.
        md = ["", "## Re-run (after the shuffle-width / closure fixes)", ""]
    else:
        md = [
            "# sf1.0 rehearsal (10x the routine scaling corpus)",
            "",
            "One-shot confirmation that stage walls grow ~linearly from the",
            "sf0.1-equivalent scale to ~230M triples; see bench_sf1.py for",
            "the workload definitions (same operator code paths as the",
            "catalog entries, inputs scaled 10x).",
            "",
        ]
    pipe = result.get("pipeline")
    if pipe:
        md += [
            f"## Pipeline @ {pipe['n_files']} files, local[{pipe['cpus']}]",
            "",
            f"- wall {pipe['wall_sec']} s, {pipe['triples']} triples, "
            f"**{pipe['triples_per_sec']} t/s**",
            "",
            "| stage | wall_ms | rows |",
            "|---|---|---|",
        ]
        for st, v in pipe["stages"].items():
            if st.startswith("_"):  # _conf/_total metadata, not a stage
                continue
            md.append(f"| {st} | {v['wall_ms']} | {v['rows']} |")
        md.append("")
    md += ["## Operators @ 10x", "", "| op | wall_sec | rows |", "|---|---|---|"]
    for name, v in result["queries_10x"].items():
        md.append(f"| {name} | {v['wall_sec']} | {v['rows']} |")
    md.append("")
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(path, "a") as f:
        f.write("\n".join(md))
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
