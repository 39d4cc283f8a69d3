"""Tier B: per-partition CSR kernels (SURVEY.md §7.0).

Tier A expresses supersteps as DataFrame join+agg (Catalyst-optimized,
correctness-first).  Tier B mirrors the reference's `huge` paged-CSR design
(core/huge/HugeGraphImpl.java:37-78): adjacency co-partitioned by source,
each superstep a vectorized pandas/Arrow gather-scatter inside
`applyInPandas` cogroups that PRE-AGGREGATES per partition before the
(tiny) shuffle.  Bit-compatible with Tier A up to float summation order;
equivalence is tested to 1e-9.
"""
