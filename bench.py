"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., ...extras}

North-rule metric (BASELINE.json): PageRank edges-processed/sec to 1e-6
convergence + WCC/triangle wall-time on the co-commit-analogue edge table;
the extras carry edges/sec and parallelism so BENCH/BASELINE.md can derive
the N-vs-4N scaling efficiency by running this file twice:

    SPARK_GRAFT_CPUS=8  python bench.py
    SPARK_GRAFT_CPUS=32 python bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from neo4j_graph_algorithms_spark.operators.lpa import lpa  # noqa: E402
from neo4j_graph_algorithms_spark.operators.metapath import compute_all_metapaths  # noqa: E402
from neo4j_graph_algorithms_spark.operators.pagerank import pagerank  # noqa: E402
from neo4j_graph_algorithms_spark.operators.triangles import triangle_count  # noqa: E402
from neo4j_graph_algorithms_spark.operators.wcc import wcc  # noqa: E402
from neo4j_graph_algorithms_spark.session import build_session  # noqa: E402
from neo4j_graph_algorithms_spark.sources.tpch import (  # noqa: E402
    coorder_edges,
    lineseq_edges,
    typed_graph,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    spark = build_session(
        app_name="linkgraph-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    # -- graph build (the co-commit-analogue edge table), cached up front ----
    co = coorder_edges(spark, sf_dir)
    co.persist()
    n_co_edges = timed("build_coorder_graph", co.count)

    seq = lineseq_edges(spark, sf_dir)
    seq.persist()
    n_seq_edges = timed("build_lineseq_graph", seq.count)

    # -- PageRank to 1e-6 convergence: the headline edges/sec metric ---------
    def _pr():
        res = pagerank(spark, seq, tolerance=1e-6, max_iterations=100)
        res.state.agg(F.sum("rank")).collect()
        return res

    pr_res = timed("pagerank_conv_1e6", _pr)
    extras["pagerank_iterations"] = pr_res.iterations
    extras["pagerank_edges_per_sec"] = round(
        n_seq_edges * pr_res.iterations / max(timings["pagerank_conv_1e6"], 1e-9), 1
    )

    # -- WCC to fixpoint on the co-commit-analogue graph ---------------------
    def _wcc():
        res = wcc(spark, co)
        return res.state.agg(F.countDistinct("comp")).collect()[0][0]

    extras["wcc_components"] = timed("wcc_fixpoint", _wcc)

    # -- triangle count ------------------------------------------------------
    def _tri():
        _, total = triangle_count(spark, co)
        return total

    extras["triangles_total"] = timed("triangle_count", _tri)

    # -- LPA (5 sync iterations) ---------------------------------------------
    def _lpa():
        res = lpa(spark, seq, max_iterations=5)
        return res.state.agg(F.countDistinct("label")).collect()[0][0]

    extras["lpa_labels"] = timed("lpa_5iter", _lpa)

    # -- metapath length<=3 ---------------------------------------------------
    def _mp():
        edges, labels = typed_graph(spark, sf_dir)
        return compute_all_metapaths(spark, edges, labels, length=3).count()

    extras["metapath_rows"] = timed("metapath_len3", _mp)

    total = round(sum(timings.values()), 3)
    extras["coorder_edges"] = n_co_edges
    extras["lineseq_edges"] = n_seq_edges
    extras["parallelism"] = cpus

    # opt-in extended timings for the round-3 operators — kept OUT of the
    # headline `queries`/`value` so cross-round comparability holds
    if os.environ.get("SPARK_GRAFT_EXTENDED"):
        ext: dict[str, float] = {}

        def timed_ext(name: str, fn):
            t0 = time.time()
            out = fn()
            ext[name] = round(time.time() - t0, 3)
            return out

        from neo4j_graph_algorithms_spark.operators.fastrp import fastrp
        from neo4j_graph_algorithms_spark.operators.katz import katz
        from neo4j_graph_algorithms_spark.operators.ktruss import ktruss
        from neo4j_graph_algorithms_spark.operators.walks import node2vec_walks

        from neo4j_graph_algorithms_spark.csr.fastrp import fastrp_csr

        timed_ext("fastrp_d16_2iter", lambda: fastrp(
            spark, co, dim=16, iteration_weights=(1.0, 1.0)).count())
        timed_ext("fastrp_csr_d16_2iter", lambda: fastrp_csr(
            spark, co, dim=16, iteration_weights=(1.0, 1.0)).count())
        timed_ext("node2vec_len4", lambda: node2vec_walks(
            spark, seq, walk_length=4, p=2.0, q=0.5).count())
        timed_ext("ktruss_k4", lambda: ktruss(spark, seq, k=4).count())
        timed_ext("katz_20iter", lambda: katz(
            spark, seq, alpha=0.05, max_iterations=20).state.count())

        from neo4j_graph_algorithms_spark.operators.hyperball import (
            effective_diameter,
        )
        from neo4j_graph_algorithms_spark.pipeline.bpe import bpe_train
        from neo4j_graph_algorithms_spark.pipeline.dedup import keep_best_in_groups

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        timed_ext("effective_diameter_r6", lambda: effective_diameter(
            spark, seq, max_radius=6, m=16).count())
        timed_ext("bpe_train_6merges", lambda: bpe_train(
            docs, num_merges=6).count())
        timed_ext("dedup_keep_best", lambda: keep_best_in_groups(
            docs, hash_mode="xxhash").count())

        from neo4j_graph_algorithms_spark.pipeline.events import funnel
        from neo4j_graph_algorithms_spark.pipeline.similarity import gram_matrix
        from neo4j_graph_algorithms_spark.pipeline.text import (
            bigram_logprob,
            top_ngrams,
        )

        embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        timed_ext("gram_matrix_d64", lambda: gram_matrix(embs).count())
        timed_ext("events_funnel_3step", lambda: funnel(
            ev, ["view", "click", "purchase"]).count())
        timed_ext("bigram_logprob", lambda: bigram_logprob(docs).count())
        timed_ext("top_bigrams_k50", lambda: top_ngrams(docs, n=2, k=50).count())

        # r4 continuation operators
        from neo4j_graph_algorithms_spark.operators.coarsen import (
            coarsen_by_matching,
        )
        from neo4j_graph_algorithms_spark.operators.coloring import greedy_coloring
        from neo4j_graph_algorithms_spark.operators.degrees import rich_club
        from neo4j_graph_algorithms_spark.pipeline.text import collocations

        from pyspark.sql import functions as _F
        from neo4j_graph_algorithms_spark.pipeline.text import HASH_P as _P

        thin = seq.filter(
            ((_F.col("src") % _P) * 31 + (_F.col("dst") % _P)) % 100 < 10
        )
        timed_ext("coloring_thinned", lambda: greedy_coloring(spark, thin).count())
        timed_ext("coarsen_by_matching", lambda: coarsen_by_matching(
            spark, seq).count())
        timed_ext("rich_club", lambda: rich_club(spark, seq).count())
        timed_ext("collocations_k3", lambda: collocations(
            docs, min_count=5, per_head_k=3).count())
        extras["extended"] = ext

    co.unpersist()
    seq.unpersist()
    spark.stop()

    print(
        json.dumps(
            {
                "metric": "linkgraph headline suite (PR conv + WCC + triangles + LPA + metapath)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
