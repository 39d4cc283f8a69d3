"""Synthesize the HEADLINE testdata tables at an arbitrary scale factor.

The driver ships sf{0.001,0.01,0.1}; VERDICT r4 item 7 asks for one run of
the headline suite at sf1 (10× the bench scale) to catch AQE/skew/memory
surprises the plan audit can't.  /root/testdata is read-only, so this
generates the three tables bench.py's headline queries actually read —
lineitem(l_orderkey,l_linenumber,l_partkey), orders(o_orderkey,
o_orderpriority), part(p_partkey) — into a repo-local dir, matching the
driver tables' shape at sf0.1 (150k orders, 600k lineitem ≈ 4 lines/order
with l_linenumber 1..7, 20k parts, uniform hash part picks, balanced
priorities) scaled linearly.  Generation is fully distributed
(spark.range + column exprs, no driver-side rows) and deterministic
(xxhash64 of the keys), so two runs produce identical parquet.

Usage:  python tools/gen_sf.py 1.0 /root/repo/.data/sf1 [cpus]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from neo4j_graph_algorithms_spark.session import build_session  # noqa: E402

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def generate(sf: float, out_dir: str, cpus: int = 32) -> None:
    n_orders = int(1_500_000 * sf)
    n_parts = int(200_000 * sf)
    spark = build_session(
        app_name=f"gen-sf{sf}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )

    parts = spark.range(n_parts).select(F.col("id").alias("p_partkey"))
    parts.coalesce(max(1, cpus // 8)).write.mode("overwrite").parquet(
        f"{out_dir}/part.parquet"
    )

    orders = spark.range(n_orders).select(
        F.col("id").alias("o_orderkey"),
        F.element_at(
            F.array(*[F.lit(p) for p in PRIORITIES]),
            (F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(5)) + 1).cast("int"),
        ).alias("o_orderpriority"),
    )
    orders.coalesce(max(1, cpus // 4)).write.mode("overwrite").parquet(
        f"{out_dir}/orders.parquet"
    )

    # 1..7 lines per order (avg 4, like the driver tables), hash-uniform
    # part picks over the full part space — the graph stays one connected
    # co-occurrence structure as sf grows, not disjoint replicas
    lineitem = (
        spark.range(n_orders)
        .select(
            F.col("id").alias("l_orderkey"),
            F.explode(
                F.sequence(
                    F.lit(1),
                    (F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(7)) + 1).cast(
                        "int"
                    ),
                )
            ).alias("l_linenumber"),
        )
        .withColumn(
            "l_partkey",
            F.pmod(F.xxhash64(F.col("l_orderkey"), F.col("l_linenumber")), F.lit(n_parts)),
        )
        .select("l_orderkey", "l_partkey", "l_linenumber")
    )
    lineitem.coalesce(cpus).write.mode("overwrite").parquet(
        f"{out_dir}/lineitem.parquet"
    )

    li_n = spark.read.parquet(f"{out_dir}/lineitem.parquet").count()
    print(f"sf{sf}: orders={n_orders} parts={n_parts} lineitem={li_n}")
    spark.stop()


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"/root/repo/.data/sf{sys.argv[1]}"
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    generate(sf, out, cpus)
