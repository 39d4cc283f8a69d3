"""Property write-back sink tests (Exporter.java:47-158 analogue)."""

from __future__ import annotations

from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.sources.writeback import write_vertex_property


def test_writeback_creates_and_merges(spark, tmp_path):
    table = str(tmp_path / "verts")
    r1 = spark.createDataFrame([(1, 0.5), (2, 0.7)], "vid long, rank double")
    out = write_vertex_property(spark, table, r1, "pagerank")
    got = {r.vid: r.pagerank for r in out.collect()}
    assert got == {1: 0.5, 2: 0.7}

    # second algorithm adds a NEW property; existing column preserved
    r2 = spark.createDataFrame([(2, 9), (3, 4)], "vid long, comp long")
    out = write_vertex_property(spark, table, r2, "component")
    rows = {r.vid: (r.pagerank, r.component) for r in out.collect()}
    assert rows[1] == (0.5, None)  # untouched vertex keeps row, prop NULL
    assert rows[2] == (0.7, 9)
    assert rows[3] == (None, 4)  # new vertex appended


def test_writeback_overwrites_same_property(spark, tmp_path):
    table = str(tmp_path / "verts")
    write_vertex_property(
        spark, table, spark.createDataFrame([(1, 1.0), (2, 2.0)], "vid long, v double"), "score"
    )
    out = write_vertex_property(
        spark,
        table,
        spark.createDataFrame([(2, 20.0)], "vid long, v double"),
        "score",
        default=-1.0,
    )
    got = {r.vid: r.score for r in out.collect()}
    # vid 2 updated; vid 1 keeps its previous value (MERGE WHEN MATCHED only
    # touches matched rows)
    assert got == {1: 1.0, 2: 20.0}


def test_iceberg_merge_writeback_or_skip(spark):
    """Native MERGE INTO route: green when an Iceberg catalog is on the
    session, skipped otherwise (this sandbox ships no Iceberg jars — the
    parquet-swap tests above cover the same merge semantics)."""
    import pytest

    from neo4j_graph_algorithms_spark.sources.writeback import (
        iceberg_available,
        write_vertex_property_merge,
    )

    if not iceberg_available(spark):
        pytest.skip("no Iceberg catalog configured on this session")
    res = spark.createDataFrame([(0, 1.5), (1, 2.5)], "vid long, rank double")
    out = write_vertex_property_merge(
        spark, "iceberg.db.test_vertex_props", res, "rank"
    )
    got = {r.vid: r.rank for r in out.collect()}
    assert got == {0: 1.5, 1: 2.5}
