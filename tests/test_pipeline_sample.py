"""Mixture resampling: determinism, exact copy rule, expected-rate sanity."""

from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.pipeline.sample import (
    _copies,
    mixture_counts,
    mixture_resample,
)
from neo4j_graph_algorithms_spark.pipeline.text import HASH_P, hash_params


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "zh")
        .otherwise("es")
        .alias("lang"),
        F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"),
    )


def test_copy_rule_matches_python_mirror(spark):
    docs = _docs(spark)
    weights = {"en": 0.5, "zh": 2.25}
    out = mixture_resample(docs, weights, default_weight=0.75, seed=42)
    got = {}
    for r in out.select("doc_id", "copy").collect():
        got[r["doc_id"]] = max(got.get(r["doc_id"], -1), r["copy"])
    a, b = hash_params(42)
    for r in docs.collect():
        w = weights.get(r["lang"], 0.75)
        base, thr = _copies(w)
        h = ((r["doc_id"] % HASH_P) * a + b) % HASH_P
        n = base + (1 if h < thr else 0)
        if n == 0:
            assert r["doc_id"] not in got
        else:
            assert got[r["doc_id"]] == n - 1, r

def test_zero_weight_drops_stratum_and_int_weight_is_exact_epochs(spark):
    docs = _docs(spark)
    out = mixture_resample(docs, {"en": 0.0, "zh": 3.0, "es": 1.0})
    by_lang = {r["stratum"]: (r["n_docs"], r["n_rows"])
               for r in mixture_counts(docs, {"en": 0.0, "zh": 3.0, "es": 1.0}).collect()}
    assert "en" not in by_lang
    n_zh = docs.filter("lang = 'zh'").count()
    n_es = docs.filter("lang = 'es'").count()
    assert by_lang["zh"] == (n_zh, 3 * n_zh)  # exactly 3 epochs, every doc
    assert by_lang["es"] == (n_es, n_es)
    assert out.filter("lang = 'zh'").count() == 3 * n_zh


def test_resample_deterministic_and_seed_sensitive(spark):
    docs = _docs(spark)
    w = {"en": 0.4}
    a = sorted(map(tuple, mixture_resample(docs, w, seed=1).select("doc_id", "copy").collect()))
    b = sorted(map(tuple, mixture_resample(docs, w, seed=1).select("doc_id", "copy").collect()))
    c = sorted(map(tuple, mixture_resample(docs, w, seed=2).select("doc_id", "copy").collect()))
    assert a == b
    assert a != c


def test_fractional_rate_close_to_expectation(spark):
    docs = _docs(spark, n=3000)
    out = mixture_resample(docs, {"en": 0.5}, default_weight=1.0)
    kept_en = out.filter("lang = 'en'").count()
    total_en = docs.filter("lang = 'en'").count()
    assert abs(kept_en / total_en - 0.5) < 0.08  # universal hash, not exact split
