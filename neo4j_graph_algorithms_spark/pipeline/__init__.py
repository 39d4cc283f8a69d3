"""Training-data pipeline operators over document / embedding tables.

Beyond the reference's graph algorithms, a 100 TB corpus engine needs the
data-curation operators every large-scale training pipeline runs: exact and
near deduplication, similarity search over embeddings, text analysis
(language id, quality, tokens, fingerprints), and multimodal column
plumbing.  All are built DataFrame-first (JVM expressions, no per-row
Python); near-dup candidate generation is LSH-bucketed so the plans scale
to 10^12 rows (no all-pairs joins outside explicit small-scale baselines).
"""
