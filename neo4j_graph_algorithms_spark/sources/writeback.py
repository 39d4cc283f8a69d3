"""Property write-back sink — the MERGE/upsert analogue of the reference's
Exporter (core/src/main/java/org/neo4j/graphalgo/core/write/Exporter.java:
47-158: writeNodeProperties batches per-node property writes back into the
store in parallel transactions).

Our store is a parquet (Iceberg in production) VERTEX PROPERTY TABLE
[vid, <prop1>, <prop2>, ...].  `write_vertex_property` merges an algorithm
result [vid, value] into it:

  * existing vertices get the new property value (overwriting that column
    only — other property columns are preserved);
  * result vertices absent from the table are appended;
  * table vertices absent from the result keep their row (property NULL or
    `default`).

Parquet has no in-place MERGE, so the merge is re-written atomically:
write to `<table>.tmp-<token>`, then swap directories.  On Iceberg this
maps 1:1 to `MERGE INTO ... WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT`
(documented here so the production translation is mechanical).

Progress/termination mirror Exporter's ProgressLogger/TerminationFlag via
the standard job-group cancellation the superstep runtime already uses.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import VID


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is configured on this session (any
    `spark.sql.catalog.<name>` whose implementation mentions iceberg).
    Capability check for routing write-back through native `MERGE INTO`
    instead of the parquet swap."""
    try:
        confs = dict(spark.sparkContext.getConf().getAll())
    except Exception:  # pragma: no cover - defensive
        return False
    return any(
        k.startswith("spark.sql.catalog.") and "iceberg" in str(v).lower()
        for k, v in confs.items()
    )


def write_vertex_property_merge(
    spark: SparkSession,
    table_ident: str,
    result: DataFrame,
    property_name: str,
    value_col: str | None = None,
) -> DataFrame:
    """Native MERGE write-back for catalog tables (Iceberg/Delta): the
    direct translation of the parquet-swap path below —

        MERGE INTO t USING updates s ON t.vid = s.vid
        WHEN MATCHED THEN UPDATE SET t.<prop> = s._new_value
        WHEN NOT MATCHED THEN INSERT (vid, <prop>) VALUES (...)

    `table_ident` is a catalog identifier (e.g. `iceberg.db.vertex_props`);
    the table is created (and the property column added) if missing.
    Requires a MERGE-capable catalog — gate with `iceberg_available`."""
    if not property_name.replace("_", "").isalnum():
        raise ValueError(f"bad property name {property_name!r}")
    cols = [c for c in result.columns if c != VID]
    if value_col is None:
        if len(cols) != 1:
            raise ValueError(
                f"result must have exactly one value column (or pass value_col); got {cols}"
            )
        value_col = cols[0]
    new = result.select(F.col(VID), F.col(value_col).alias("_new_value"))
    view = f"_wb_updates_{uuid.uuid4().hex[:8]}"
    new.createOrReplaceTempView(view)
    try:
        if not spark.catalog.tableExists(table_ident):
            spark.sql(
                f"CREATE TABLE {table_ident} "
                f"AS SELECT {VID}, _new_value AS {property_name} FROM {view}"
            )
            return spark.table(table_ident)
        if property_name not in spark.table(table_ident).columns:
            spark.sql(
                f"ALTER TABLE {table_ident} ADD COLUMN {property_name} DOUBLE"
            )
        spark.sql(
            f"""MERGE INTO {table_ident} t USING {view} s ON t.{VID} = s.{VID}
WHEN MATCHED THEN UPDATE SET t.{property_name} = s._new_value
WHEN NOT MATCHED THEN INSERT ({VID}, {property_name}) VALUES (s.{VID}, s._new_value)"""
        )
        return spark.table(table_ident)
    finally:
        spark.catalog.dropTempView(view)


def write_vertex_property(
    spark: SparkSession,
    table_path: str,
    result: DataFrame,
    property_name: str,
    value_col: str | None = None,
    default: float | None = None,
) -> DataFrame:
    """Merge [vid, value] `result` into the vertex property table at
    `table_path` as column `property_name`; returns the merged table.

    `value_col` defaults to the single non-vid column of `result`.
    """
    cols = [c for c in result.columns if c != VID]
    if value_col is None:
        if len(cols) != 1:
            raise ValueError(
                f"result must have exactly one value column (or pass value_col); got {cols}"
            )
        value_col = cols[0]
    new = result.select(F.col(VID), F.col(value_col).alias("_new_value"))

    if os.path.exists(table_path):
        existing = spark.read.parquet(table_path)
        keep_cols = [c for c in existing.columns if c not in (VID, property_name)]
        merged = (
            existing.join(new, on=VID, how="full_outer")
            .select(
                VID,
                *keep_cols,
                F.coalesce(
                    F.col("_new_value"),
                    F.col(property_name) if property_name in existing.columns else F.lit(default),
                    F.lit(default),
                ).alias(property_name),
            )
        )
    else:
        merged = new.select(VID, F.col("_new_value").alias(property_name))

    tmp = f"{table_path}.tmp-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    # atomic swap (directory rename); Iceberg replaces this with a MERGE commit
    if os.path.exists(table_path):
        old = f"{table_path}.old-{uuid.uuid4().hex[:8]}"
        os.rename(table_path, old)
        os.rename(tmp, table_path)
        shutil.rmtree(old)
    else:
        os.rename(tmp, table_path)
    return spark.read.parquet(table_path)
