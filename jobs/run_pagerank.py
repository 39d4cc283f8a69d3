"""spark-submit entry point: PageRank over a parquet/Iceberg edge table.

    spark-submit --py-files linkgraph.zip jobs/run_pagerank.py \
        --edges s3://.../edges --output s3://.../ranks \
        --iterations 20 --tolerance 1e-6 --checkpoint-dir s3://.../ckpt

Or derive the edge table from a source-code corpus first:

    spark-submit ... jobs/run_pagerank.py --corpus s3://.../corpus \
        --edge-kind cocommit --output ...

The script only wires config → library calls; all semantics live in
`neo4j_graph_algorithms_spark` (importable via --py-files on any cluster).
`--resume` restarts from the newest durable checkpoint (mid-algorithm).
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--edges", help="parquet/iceberg path with (src,dst[,weight])")
    src.add_argument("--corpus", help="corpus table (repo,path,commit,lang,content)")
    p.add_argument("--edge-kind", choices=["cocommit", "import"], default="cocommit")
    p.add_argument("--output", required=True)
    p.add_argument("--iterations", type=int, default=20)
    p.add_argument("--tolerance", type=float, default=None)
    p.add_argument("--damping", type=float, default=0.85)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-interval", type=int, default=5)
    p.add_argument("--resume", action="store_true")
    return p.parse_args()


def main() -> None:
    args = parse_args()
    spark = SparkSession.builder.appName("linkgraph-pagerank").getOrCreate()

    from neo4j_graph_algorithms_spark.graph import EdgeFrame
    from neo4j_graph_algorithms_spark.operators.pagerank import pagerank
    from neo4j_graph_algorithms_spark.sources.derive import cocommit_edges, import_edges

    if args.corpus:
        corpus = spark.read.parquet(args.corpus)
        edges = (
            cocommit_edges(corpus) if args.edge_kind == "cocommit" else import_edges(corpus)
        )
    else:
        edges = spark.read.parquet(args.edges)

    res = pagerank(
        spark,
        EdgeFrame(edges),
        damping_factor=args.damping,
        max_iterations=args.iterations,
        tolerance=args.tolerance,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_interval=args.checkpoint_interval,
        resume=args.resume,
    )
    res.state.select("vid", "rank").write.mode("overwrite").parquet(args.output)
    print(
        f"pagerank done: iterations={res.iterations} converged={res.converged} "
        f"output={args.output}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
