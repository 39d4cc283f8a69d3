"""Subgraph projection by label/type allow-lists (algo.graphReducer,
impl/metapath/GraphReducer.java; proc GraphReducerProc.java:23-24) and the
label-token dictionary dump (algo.getLabelIdToLabelNameMapping,
impl/metapath/LabelIdToLabelNameMapping.java).

The reference mutates the database destructively; ours is functional —
returns the reduced (edges, node_labels) pair for the caller to persist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID


def graph_reducer(
    edges: DataFrame,
    node_labels: DataFrame,
    keep_labels: list[int] | None = None,
    keep_types: list[int] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Keep only nodes having >=1 allowed label and edges of allowed types
    whose BOTH endpoints survive.  edges: [src, dst, type];
    node_labels: [vid, labels: array<int>]."""
    labels = node_labels
    if keep_labels is not None:
        allowed = [int(x) for x in keep_labels]
        labels = (
            labels.withColumn(
                "labels", F.filter("labels", lambda l: l.isin(allowed))
            )
            .filter(F.size("labels") > 0)
        )
    e = edges
    if keep_types is not None:
        e = e.filter(F.col("type").isin([int(x) for x in keep_types]))
    surviving = labels.select(VID)
    e = (
        e.join(surviving.withColumnRenamed(VID, SRC), on=SRC, how="left_semi")
        .join(surviving.withColumnRenamed(VID, DST), on=DST, how="left_semi")
    )
    return e, labels


def label_dictionary(names: DataFrame) -> DataFrame:
    """[label_id, label_name] token dictionary
    (algo.getLabelIdToLabelNameMapping): dense ids by lexicographic name —
    the same engine-independent convention as the text token dictionary."""
    from neo4j_graph_algorithms_spark.functions.rank import dense_ids

    return dense_ids(names.select("label_name").distinct(), "label_name").select(
        F.col("_rk").cast("int").alias("label_id"), "label_name"
    )
