"""Generic spark-submit entry point: run any catalogue algorithm by name.

    spark-submit --py-files linkgraph.zip jobs/run_algo.py \
        --algo wcc --edges <path> --output <path> [--config '{"threshold": 2.0}'] \
        [--checkpoint-dir <path> [--resume]]

`--checkpoint-dir` turns on the durable per-superstep state commits; a job
killed mid-algorithm resumes from the last committed superstep when
resubmitted with `--resume` (north rule: runs resume mid-algorithm).

Algorithms: pagerank, wcc, mscoloring, lpa, louvain, triangles,
clustering_coefficients, scc, sssp, shortest_path, apsp_weighted,
all_shortest_paths, delta_stepping, closeness, harmonic, betweenness, mst,
kcore, coreness, ktruss, score, onion, bowtie, who_to_follow, hits,
eigenvector, katz, topo_levels,
random_walks, node2vec_walks, fastrp, sllpa, degree, degree_stats,
metapath (needs typed edges + labels tables).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--algo", required=True)
    p.add_argument("--edges", required=True)
    p.add_argument("--labels", help="node-labels table for metapath (vid, labels)")
    p.add_argument("--output", required=True)
    p.add_argument("--config", default="{}", help="JSON config map (reference key names)")
    p.add_argument("--checkpoint-dir", help="durable superstep-state dir (enables resume)")
    p.add_argument("--resume", action="store_true", help="continue from committed state")
    args = p.parse_args()
    cfg = json.loads(args.config)
    # operators that run on SuperstepRunner (or an equivalent durable loop)
    # all take the same two kwargs
    ck = (
        {"checkpoint_dir": args.checkpoint_dir, "resume": args.resume}
        if args.checkpoint_dir
        else {}
    )

    spark = SparkSession.builder.appName(f"linkgraph-{args.algo}").getOrCreate()
    import importlib

    from neo4j_graph_algorithms_spark.graph import EdgeFrame

    # operators/__init__ re-exports FUNCTIONS under the submodule names, so
    # `import pkg.operators.wcc as m` (which resolves via getattr) would bind
    # the function; importlib fetches the real modules from sys.modules
    def _mod(name: str):
        return importlib.import_module(f"neo4j_graph_algorithms_spark.operators.{name}")

    _b, _lv, _l, _m, _c, _t = (
        _mod("betweenness"), _mod("louvain"), _mod("lpa"),
        _mod("metapath"), _mod("msbfs"), _mod("mst"),
    )
    _p, _pa, _s, _tr, _w = (
        _mod("pagerank"), _mod("paths"), _mod("scc"), _mod("triangles"), _mod("wcc")
    )

    edges = EdgeFrame(spark.read.parquet(args.edges))
    algo = args.algo

    if algo == "pagerank":
        out = _p.pagerank_scores(
            _p.pagerank(
                spark,
                edges,
                damping_factor=cfg.get("dampingFactor", 0.85),
                max_iterations=cfg.get("iterations", 20),
                tolerance=cfg.get("tolerance"),
                **ck,
            )
        )
    elif algo in ("wcc", "unionfind"):
        out = _w.wcc(spark, edges, threshold=cfg.get("threshold"), **ck).state
    elif algo == "mscoloring":
        out = _w.wcc(spark, edges, extremum="max", **ck).state
    elif algo == "lpa":
        out = _l.lpa(spark, edges, max_iterations=cfg.get("iterations", 1), **ck).state
    elif algo == "louvain":
        out = _lv.louvain(spark, edges, max_iterations=cfg.get("iterations", 20), **ck)
    elif algo == "triangles":
        out, _total = _tr.triangle_count(spark, edges)
    elif algo == "clustering_coefficients":
        out = _tr.clustering_coefficients(spark, edges)
    elif algo == "scc":
        out = _s.scc(spark, edges, **ck)
    elif algo == "sssp":
        out = _pa.sssp(spark, edges, source=int(cfg["source"]), **ck)
    elif algo == "shortest_path":
        out = _pa.shortest_path(
            spark, edges, source=int(cfg["source"]), target=int(cfg["target"])
        )
    elif algo == "apsp_weighted":
        out = _pa.all_shortest_paths_weighted(spark, edges, **ck)
    elif algo == "all_shortest_paths":
        out = _c.all_shortest_paths(spark, edges)
    elif algo == "delta_stepping":
        out = _pa.delta_stepping(
            spark, edges, source=int(cfg["source"]), delta=cfg.get("delta", 3.0), **ck
        )
    elif algo == "closeness":
        out = _c.closeness(
            spark,
            edges,
            depths_fn=(lambda *a: _c.msbfs_depths(*a, **ck)) if ck else None,
        )
    elif algo == "harmonic":
        out = _c.harmonic(
            spark,
            edges,
            depths_fn=(lambda *a: _c.msbfs_depths(*a, **ck)) if ck else None,
        )
    elif algo == "betweenness":
        out = _b.betweenness(spark, edges, **ck)
    elif algo == "mst":
        out = _t.mst(spark, edges, **ck)
    elif algo == "kcore":
        from neo4j_graph_algorithms_spark.operators.kcore import kcore

        out = kcore(spark, edges, k=int(cfg.get("k", 2)), **ck).state
    elif algo == "coreness":
        from neo4j_graph_algorithms_spark.operators.kcore import coreness

        out = coreness(spark, edges)
    elif algo == "ktruss":
        from neo4j_graph_algorithms_spark.operators.ktruss import ktruss

        out = ktruss(spark, edges, k=int(cfg.get("k", 4)))
    elif algo == "score":
        from neo4j_graph_algorithms_spark.operators.kcore import s_core

        out = s_core(spark, edges, s=int(cfg.get("s", 2)), **ck).state
    elif algo == "onion":
        from neo4j_graph_algorithms_spark.operators.onion import onion_decomposition

        out = onion_decomposition(spark, edges)
    elif algo == "bowtie":
        from neo4j_graph_algorithms_spark.operators.bowtie import bowtie_decomposition

        out = bowtie_decomposition(spark, edges)
    elif algo == "who_to_follow":
        from neo4j_graph_algorithms_spark.operators.wtf import who_to_follow

        seeds_mod = int(cfg.get("seeds_mod", 400))
        from pyspark.sql import functions as F

        verts = (
            edges.select(F.col("src").alias("vid"))
            .unionByName(edges.select(F.col("dst").alias("vid")))
            .distinct()
        )
        out = who_to_follow(
            spark,
            edges,
            verts.filter(F.col("vid") % seeds_mod == 0),
            circle_size=int(cfg.get("circle_size", 100)),
            n_recs=int(cfg.get("n_recs", 50)),
        )
    elif algo == "hits":
        from neo4j_graph_algorithms_spark.operators.hits import hits

        out = hits(spark, edges, max_iterations=cfg.get("iterations", 20), **ck).state
    elif algo == "eigenvector":
        from neo4j_graph_algorithms_spark.operators.eigenvector import eigenvector

        out = eigenvector(
            spark, edges, max_iterations=cfg.get("iterations", 20), **ck
        ).state
    elif algo == "katz":
        from neo4j_graph_algorithms_spark.operators.katz import katz

        out = katz(
            spark,
            edges,
            alpha=cfg.get("alpha", 0.05),
            beta=cfg.get("beta", 1.0),
            max_iterations=cfg.get("iterations", 20),
            tolerance=cfg.get("tolerance"),
            **ck,
        ).state
    elif algo == "topo_levels":
        from neo4j_graph_algorithms_spark.operators.dag import topo_levels

        out = topo_levels(spark, edges, **ck).state
    elif algo == "random_walks":
        from neo4j_graph_algorithms_spark.operators.walks import random_walks

        out = random_walks(
            spark,
            edges,
            walk_length=cfg.get("walkLength", 4),
            walks_per_node=cfg.get("walksPerNode", 1),
            seed=cfg.get("seed", 42),
        )
    elif algo == "node2vec_walks":
        from neo4j_graph_algorithms_spark.operators.walks import node2vec_walks

        out = node2vec_walks(
            spark,
            edges,
            walk_length=cfg.get("walkLength", 4),
            walks_per_node=cfg.get("walksPerNode", 1),
            p=cfg.get("p", 1.0),
            q=cfg.get("q", 1.0),
            seed=cfg.get("seed", 42),
        )
    elif algo == "fastrp":
        from neo4j_graph_algorithms_spark.operators.fastrp import fastrp

        out = fastrp(
            spark,
            edges,
            dim=cfg.get("dim", 8),
            iteration_weights=tuple(cfg.get("iterationWeights", [1.0, 1.0])),
            seed=cfg.get("seed", 42),
        )
    elif algo == "sllpa":
        from neo4j_graph_algorithms_spark.operators.sllpa import sllpa

        out = sllpa(
            spark,
            edges,
            iterations=cfg.get("iterations", 4),
            threshold=cfg.get("threshold", 0.3),
            seed=cfg.get("seed", 42),
        )
    elif algo == "degree":
        from neo4j_graph_algorithms_spark.operators.degrees import degree_centrality

        out = degree_centrality(spark, edges)
    elif algo == "degree_stats":
        from neo4j_graph_algorithms_spark.operators.degrees import degree_distribution

        out = degree_distribution(spark, edges)
    elif algo == "metapath":
        labels = spark.read.parquet(args.labels)
        typed = spark.read.parquet(args.edges)  # keeps the `type` column
        out = _m.compute_all_metapaths(spark, typed, labels, length=cfg.get("length", 3))
    else:
        raise SystemExit(f"unknown algo {algo!r}")

    out.write.mode("overwrite").parquet(args.output)
    print(f"{algo} done -> {args.output}")
    spark.stop()


if __name__ == "__main__":
    main()
