"""Corpus → graph derivation (the ingest front door, SURVEY.md §7.1 step 1).

    vertices       : vid = xxhash64(repo, path)  — stable hashed ids, no
                     global zipWithIndex barrier (the reference's IdMap
                     dense remap, core/IdMap.java:36-45, is replaced by
                     hashing: at 10^12 files a global dense remap is a
                     sort of the world; hashed ids join for free)
    edges_cocommit : pairs of files sharing a (repo, commit);
                     weight = number of shared commits; canonical src<dst
    edges_import   : file → imported file (directed), resolved within repo

Skew guard: commits touching huge file counts expand to O(k²) pairs — a
single vendored-checkin commit at 10^12 scale is a clique bomb.
`max_files_per_commit` truncates each commit to its first N paths
(deterministic order) and logs how many commits were truncated
(SURVEY.md §7.3; precedent: the reference special-cases high-degree nodes,
impl/metapath/MetaPathPrecomputeHighDegreeNodes.java).
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame, Window, functions as F

log = logging.getLogger(__name__)

# Engine-independent polynomial string hash (mod Mersenne prime 2^31-1):
# the ORACLE-PARITY id mode — DuckDB computes the identical value, so the
# correctness gate gets full value-hash checks on hashed vertex ids.  The
# scale path stays xxhash64 (better mixing, no char fold).
POLY_P = 2_147_483_647


def poly_hash(col: Column | str) -> Column:
    """Fold (acc*31 + codepoint) % POLY_P over the string's characters —
    same recurrence as pipeline/text.py fingerprints."""
    c = F.col(col) if isinstance(col, str) else col
    chars = F.filter(F.split(c, ""), lambda ch: ch != "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % POLY_P,
    )


def poly_hash_sql(expr: str) -> str:
    """DuckDB twin of `poly_hash` over an arbitrary SQL string expression."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({expr}, ''), ch -> ord(ch))), "
        f"(acc, x) -> (acc * 31 + x) % {POLY_P})"
    )


def _vid(id_mode: str) -> Column:
    if id_mode == "xxhash":
        return F.xxhash64("repo", "path")
    if id_mode == "poly":
        return poly_hash(F.concat_ws("|", "repo", "path"))
    raise ValueError(f"unknown id_mode {id_mode!r}")


def corpus_vertices(corpus: DataFrame, id_mode: str = "xxhash") -> DataFrame:
    """[vid, repo, path] — one row per distinct file."""
    return (
        corpus.select("repo", "path")
        .distinct()
        .select(_vid(id_mode).alias("vid"), "repo", "path")
    )


def cocommit_edges(
    corpus: DataFrame,
    max_files_per_commit: int = 1000,
    id_mode: str = "xxhash",
) -> DataFrame:
    """[src, dst, weight] undirected-canonical co-commit edges.

    weight = number of (repo, commit) groups in which both files appear.
    Commits larger than `max_files_per_commit` are truncated (clique cap).
    """
    touches = (
        corpus.select("repo", "commit", "path")
        .distinct()
        .withColumn("vid", _vid(id_mode))
    )
    w = Window.partitionBy("repo", "commit").orderBy("path")
    capped = (
        touches.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_files_per_commit)
        .select("repo", "commit", "vid")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    pairs = a.join(b, on=["repo", "commit"]).filter(F.col("a.vid") < F.col("b.vid"))
    return (
        pairs.select(F.col("a.vid").alias("src"), F.col("b.vid").alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
    )


def import_edges(corpus: DataFrame, id_mode: str = "xxhash") -> DataFrame:
    """[src, dst] directed import edges, resolved within the same repo.

    Imports are extracted with a vectorized regexp over content
    (`import <module>` lines); module f_N resolves to the repo file whose
    path contains f_N (any lang extension).  Unresolvable imports drop.
    """
    files = (
        corpus.select("repo", "path")
        .distinct()
        .withColumn("vid", _vid(id_mode))
        .withColumn("module", F.regexp_extract("path", r"([^/]+)\.[a-z]+$", 1))
    )
    imports = (
        corpus.select("repo", "path", "content")
        .distinct()
        .withColumn("vid", _vid(id_mode))
        .select(
            "repo",
            "vid",
            F.explode(F.expr(r"regexp_extract_all(content, 'import ([A-Za-z0-9_]+)', 1)")).alias(
                "module"
            ),
        )
    )
    resolved = imports.join(
        files.select("repo", F.col("vid").alias("dst"), "module"), on=["repo", "module"]
    )
    return (
        resolved.select(F.col("vid").alias("src"), "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def check_sha_invariant(source: DataFrame, materialized: DataFrame) -> int:
    """Verify content sha256 equality between the source table and any
    materialization carrying (repo, path, commit, content_sha256).

    Returns the number of violating rows (0 = invariant holds).  Uses a
    full outer join on the key so both drops and corruptions count.
    """
    key = ["repo", "path", "commit"]
    s = source.select(*key, F.sha2("content", 256).alias("_sha_src")).distinct()
    m = materialized.select(*key, F.col("content_sha256").alias("_sha_dst")).distinct()
    joined = s.join(m, on=key, how="full_outer")
    return joined.filter(
        F.col("_sha_src").isNull()
        | F.col("_sha_dst").isNull()
        | (F.col("_sha_src") != F.col("_sha_dst"))
    ).count()
