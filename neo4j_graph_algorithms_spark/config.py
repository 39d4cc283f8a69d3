"""Procedure configuration — mirror of the reference's config surface.

Key names and defaults follow reference core/ProcedureConstants.java:26-62
and core/ProcedureConfiguration.java:232-352 (iterations, dampingFactor,
weightProperty/defaultValue, threshold, partitionProperty, direction,
concurrency, batchSize, graph name).  Concurrency maps to Spark shuffle
partitions; ``graph`` maps to the named-graph registry.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

OUTGOING = "OUTGOING"
INCOMING = "INCOMING"
BOTH = "BOTH"

DEFAULT_DAMPING = 0.85          # PageRankProc.java:54
DEFAULT_ITERATIONS = 20         # PageRankProc.java:55
DEFAULT_LPA_ITERATIONS = 1      # doc/label-propagation.adoc:104
DEFAULT_TOLERANCE = 1e-6        # our convergence stop (BASELINE.json metric)
DEFAULT_WEIGHT_PROPERTY = "weight"


@dataclass
class ProcedureConfig:
    """Typed config map shared by all procedures."""

    iterations: int = DEFAULT_ITERATIONS
    damping_factor: float = DEFAULT_DAMPING
    tolerance: float = DEFAULT_TOLERANCE
    direction: str = OUTGOING
    weight_column: str | None = None      # weightProperty
    default_weight: float = 1.0           # defaultValue
    threshold: float | None = None        # weighted-WCC union threshold (>=)
    seed_column: str | None = None        # partitionProperty (LPA seeds)
    concurrency: int | None = None        # → shuffle partitions override
    graph: str | None = None              # named-graph registry key
    write: bool = False
    write_property: str = "value"
    checkpoint_dir: str | None = None
    checkpoint_interval: int = 5
    extras: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def create(cls, config: dict[str, Any] | None = None) -> "ProcedureConfig":
        """Build from a loose dict using the reference's key names."""
        config = dict(config or {})
        mapping = {
            "iterations": "iterations",
            "dampingFactor": "damping_factor",
            "tolerance": "tolerance",
            "direction": "direction",
            "weightProperty": "weight_column",
            "defaultValue": "default_weight",
            "threshold": "threshold",
            "partitionProperty": "seed_column",
            "concurrency": "concurrency",
            "graph": "graph",
            "write": "write",
            "writeProperty": "write_property",
            "checkpointDir": "checkpoint_dir",
            "checkpointInterval": "checkpoint_interval",
        }
        kwargs = {}
        extras = {}
        for k, v in config.items():
            if k in mapping:
                kwargs[mapping[k]] = v
            else:
                extras[k] = v
        return cls(extras=extras, **kwargs)
