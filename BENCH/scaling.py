"""Scaling-efficiency evidence: the SAME job at two parallelism levels.

The north rule requires throughput scaling efficiency >= 0.8 between N and
4N executors; in this sandbox the evidence is local[8] vs local[32] over an
identical deterministic input (BASELINE.md).  Run:

    python BENCH/scaling.py 8
    python BENCH/scaling.py 32

Workload: PageRank (10 fixed supersteps) + WCC to fixpoint + triangle count
on a deterministic synthetic graph large enough that each stage is
compute-bound (per-task overhead amortized) — the regime a 1000-executor
cluster actually runs in.  Prints one JSON line per run; `python
BENCH/scaling.py report` folds all recorded runs into BENCH/BASELINE.md
numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from neo4j_graph_algorithms_spark.operators.pagerank import pagerank  # noqa: E402
from neo4j_graph_algorithms_spark.operators.triangles import triangle_count  # noqa: E402
from neo4j_graph_algorithms_spark.operators.wcc import wcc  # noqa: E402
from neo4j_graph_algorithms_spark.session import build_session  # noqa: E402
from neo4j_graph_algorithms_spark.sources.synth import synth_edges  # noqa: E402

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scaling_runs.jsonl")

N_VERTICES = 2_000_000
N_EDGES = 16_000_000
PR_ITERS = 10
TRI_VERTICES = 1_000_000
TRI_EDGES = 4_000_000


def run(cpus: int) -> dict:
    spark = build_session(
        app_name=f"scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
    )
    # -- PageRank on the skewed graph (hub dst, alpha=2) ---------------------
    edges = synth_edges(spark, N_VERTICES, N_EDGES, num_partitions=cpus * 2)
    edges.persist()
    n_edges = edges.count()

    t0 = time.time()
    res = pagerank(spark, edges, max_iterations=PR_ITERS)
    res.state.agg(F.sum("rank")).collect()
    pr_sec = time.time() - t0
    pr_eps = n_edges * PR_ITERS / pr_sec

    # -- WCC to fixpoint -----------------------------------------------------
    t0 = time.time()
    wres = wcc(spark, edges)
    n_comp = wres.state.agg(F.countDistinct("comp")).collect()[0][0]
    wcc_sec = time.time() - t0

    edges.unpersist()

    # -- triangles on the uniform graph (bounded wedge count) ----------------
    tri_edges = synth_edges(
        spark, TRI_VERTICES, TRI_EDGES, alpha_dst=1.0, seed=7, num_partitions=cpus * 2
    )
    t0 = time.time()
    _, total = triangle_count(spark, tri_edges)
    tri_sec = time.time() - t0

    spark.stop()
    return {
        "cpus": cpus,
        "pagerank_sec": round(pr_sec, 2),
        "pagerank_edges_per_sec": round(pr_eps, 1),
        "pagerank_iters": res.iterations,
        "wcc_sec": round(wcc_sec, 2),
        "wcc_components": n_comp,
        "triangle_sec": round(tri_sec, 2),
        "triangles": total,
        "n_edges": n_edges,
        "n_vertices": N_VERTICES,
    }


def report() -> None:
    runs = {}
    with open(RESULTS) as fh:
        for line in fh:
            r = json.loads(line)
            runs[r["cpus"]] = r  # latest run per cpu count wins
    if 8 in runs and 32 in runs:
        a, b = runs[8], runs[32]
        for key, better in [
            ("pagerank_edges_per_sec", "higher"),
            ("wcc_sec", "lower"),
            ("triangle_sec", "lower"),
        ]:
            if better == "higher":
                speedup = b[key] / a[key]
            else:
                speedup = a[key] / b[key]
            eff = speedup / (32 / 8)
            print(f"{key}: local[8]={a[key]} local[32]={b[key]} "
                  f"speedup={speedup:.2f}x efficiency={eff:.2f}")
    else:
        print("need runs at both 8 and 32 cpus:", sorted(runs))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "report":
        report()
        return
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    row = run(cpus)
    with open(RESULTS, "a") as fh:
        fh.write(json.dumps(row) + "\n")
    print(json.dumps(row))


if __name__ == "__main__":
    main()
