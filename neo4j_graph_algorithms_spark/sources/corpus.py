"""Deterministic synthetic source-code corpus (the engine's input table).

Schema per BASELINE.json input_hint:
    repo: string, path: string, commit: string, lang: string, content: string

One row per (repo, path, commit) touch.  Synthesis is pure column
expressions over ``spark.range`` — distributed by construction, no driver
list, so the same generator scales from the CI fixture to any size.
Determinism: everything derives from the row index + a seed; no RNG state.

Rules (FIXTURES.md F0):
  * R repos × F files/repo; file j has lang cycling {py, js, md};
  * C commits/repo; commit m touches file j iff
    xxhash64(repo, commit, path, seed) % touch_mod == 0, plus the guarantee
    commit (j % C) always touches file j (every file appears at least once);
  * content is deterministic text containing import statements referencing
    other paths of the SAME repo: file j imports files (j*3+1)%F and
    (j*7+2)%F — the import-edge ground truth used by tests;
  * content depends only on (repo, path): sha256(content) is the per-row
    invariant every materialization must preserve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

LANGS = ["py", "js", "md"]


def _content_expr():
    """content = header + two import lines (same-repo module names)."""
    imp1 = (F.col("file_idx") * 3 + 1) % F.col("files_per_repo")
    imp2 = (F.col("file_idx") * 7 + 2) % F.col("files_per_repo")
    return F.concat_ws(
        "\n",
        F.format_string("# module f_%d in %s", F.col("file_idx"), F.col("repo")),
        F.format_string("import f_%d", imp1),
        F.format_string("import f_%d", imp2),
        F.format_string("def main_%d(): return %d", F.col("file_idx"), F.col("file_idx")),
    )


def synthesize_corpus(
    spark: SparkSession,
    n_repos: int = 4,
    files_per_repo: int = 50,
    commits_per_repo: int = 20,
    touch_mod: int = 5,
    seed: int = 42,
    hash_mode: str = "xxhash",
) -> DataFrame:
    """Return the corpus DataFrame (repo, path, commit, lang, content).

    `hash_mode` picks the touch-filter hash: 'xxhash' (scale path) or
    'poly' (engine-independent polynomial hash — the oracle-parity mode:
    DuckDB regenerates the IDENTICAL corpus from range(), giving the
    correctness gate full value-hash checks on the whole ingest path)."""
    base = (
        spark.range(n_repos * files_per_repo * commits_per_repo)
        .withColumn("repo_idx", (F.col("id") / (files_per_repo * commits_per_repo)).cast("long"))
        .withColumn("rem", F.col("id") % (files_per_repo * commits_per_repo))
        .withColumn("file_idx", (F.col("rem") / commits_per_repo).cast("long"))
        .withColumn("commit_idx", F.col("rem") % commits_per_repo)
        .withColumn("files_per_repo", F.lit(files_per_repo))
    )
    df = (
        base.withColumn("repo", F.format_string("repo_%d", F.col("repo_idx")))
        .withColumn(
            "lang", F.element_at(F.array(*[F.lit(x) for x in LANGS]), (F.col("file_idx") % 3 + 1).cast("int"))
        )
        .withColumn("path", F.format_string("src/f_%d.%s", F.col("file_idx"), F.col("lang")))
        .withColumn("commit", F.format_string("c_%04d", F.col("commit_idx")))
    )
    if hash_mode == "xxhash":
        touch_h = F.pmod(F.xxhash64("repo", "commit", "path", F.lit(seed)), F.lit(touch_mod))
    elif hash_mode == "poly":
        from neo4j_graph_algorithms_spark.sources.derive import poly_hash

        touch_h = F.pmod(
            poly_hash(F.concat_ws("|", "repo", "commit", "path", F.lit(str(seed)))),
            F.lit(touch_mod),
        )
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    touched = df.filter(
        (touch_h == 0) | (F.col("file_idx") % commits_per_repo == F.col("commit_idx"))
    )
    return touched.select(
        "repo", "path", "commit", "lang", _content_expr().alias("content")
    )


def with_sha(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Attach the per-row invariant column sha256(content)
    (Spark sha2; BASELINE.json: 'content rows preserve sha256 equality')."""
    return df.withColumn("content_sha256", F.sha2(F.col(content_col), 256))
