"""Superstep runtime: the iteration driver every iterative operator runs on.

The reference drives iterations with a hand-rolled state machine
(INIT→CALC→SYNC, impl/PageRank.java:344-354,430-442) whose per-iteration
barrier is a single-threaded score transpose
(ComputeSteps.synchronizeScores:356-374).  In Spark the barrier *is* the
shuffle of the per-superstep aggregation; what remains custom is the loop
itself, which Catalyst never sees:

  * lineage truncation each superstep (iterative plans otherwise grow
    exponentially) — `localCheckpoint(eager=True)` by default;
  * durable checkpoints: every `interval` supersteps the vertex state is
    written to `<dir>/state/iter=<i>` (parquet; Iceberg in production) with
    a metrics row appended to `<dir>/metrics` — per-partition lineage +
    convergence metrics, the generalization of the reference's
    TerminationFlag/ProgressLogger (impl/Algorithm.java, GraphUnionFind.java:60-71);
  * resume: `run(resume=True)` restarts from the newest durable checkpoint;
  * cancellation via Spark job groups.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class SuperstepResult:
    state: DataFrame
    iterations: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)
    # physical plan of the FIRST superstep (captured before lineage
    # truncation): lets tests/operators assert plan shape — e.g. that no
    # BroadcastHashJoin of vertex state crept in (the serial driver-side
    # build the shuffle_hash hints exist to prevent)
    first_plan: str | None = None

    @property
    def did_converge(self) -> bool:  # reference result DTO naming
        return self.converged


class SuperstepRunner:
    """Run `step(state, i) -> new_state` until convergence.

    After each step the new state is materialized (lineage-truncated), THEN
    `metric(new_state, old_state, i) -> float` runs against the cached blocks
    — so the superstep plan executes exactly once per iteration.
    `converged(metric) -> bool` decides the stop; `max_iterations` caps it.
    """

    def __init__(
        self,
        spark: SparkSession,
        max_iterations: int,
        metric: Callable[[DataFrame, DataFrame, int], float] | None = None,
        converged: Callable[[float], bool] | None = None,
        checkpoint_dir: str | None = None,
        checkpoint_interval: int = 5,
        job_group: str = "linkgraph-superstep",
        metric_every: int = 1,
    ):
        """`metric_every=k`: evaluate the convergence metric only every k-th
        superstep — each metric is a driver-coordinated job, and geometric
        contractions (PageRank deltas shrink ×d per superstep) spend most
        iterations far from tolerance.  Worst case overshoots convergence by
        k-1 (cheap) extra supersteps; results only get MORE converged."""
        self.spark = spark
        self.max_iterations = max_iterations
        self.metric = metric
        self.converged = converged
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_interval = max(1, checkpoint_interval)
        self.job_group = job_group
        self.metric_every = max(1, metric_every)

    # -- durable checkpoint layout -------------------------------------------

    def _state_path(self, i: int) -> str:
        return os.path.join(self.checkpoint_dir, "state", f"iter={i}")

    def _metrics_path(self) -> str:
        return os.path.join(self.checkpoint_dir, "metrics.jsonl")

    def latest_checkpoint(self) -> int | None:
        """Newest iteration with a committed (_SUCCESS) state directory."""
        if not self.checkpoint_dir:
            return None
        root = os.path.join(self.checkpoint_dir, "state")
        if not os.path.isdir(root):
            return None
        iters = []
        for name in os.listdir(root):
            if name.startswith("iter=") and os.path.exists(os.path.join(root, name, "_SUCCESS")):
                iters.append(int(name.split("=", 1)[1]))
        return max(iters) if iters else None

    def _write_checkpoint(self, state: DataFrame, i: int, metric: float) -> None:
        state.write.mode("overwrite").parquet(self._state_path(i))
        row = {
            "iteration": i,
            "metric": metric,
            "ts": time.time(),
            "partitions": state.rdd.getNumPartitions(),
        }
        with open(self._metrics_path(), "a") as fh:
            fh.write(json.dumps(row) + "\n")

    # -- checkpoint stats guard ------------------------------------------------

    # localCheckpoint's LogicalRDD inherits the child plan's sizeInBytes
    # ESTIMATE (Spark preserves originStats), so a step whose plan references
    # the state frame k times compounds the estimate ^k per superstep — with
    # self-joining steps (coloring, pointer jumping) Catalyst's
    # join-selection arithmetic ends up on multi-megabit BigIntegers and
    # planning time explodes geometrically (measured: 0.8 s → 86 s/iter by
    # iteration 10 on a 30-vertex graph).  The guard reads the leaf
    # estimate's bit length (one cheap py4j call) and, only once it crosses
    # the threshold, stacks .persist() on the checkpoint: the materialized
    # InMemoryRelation reports the REAL cached byte size, resetting the
    # compounding.  Linear-growth loops (PageRank's single state reference:
    # ~63·i bits after i supersteps) never trip it and keep the cheaper
    # uncached path — an unconditional persist cost PageRank's 80-iteration
    # loop ~5 s at sf0.1 (BENCH/paired_r4c.jsonl vs r4/r4b floors).
    _STATS_RESET_BITS = 16384

    def _ckpt_stats_guard(self, df: DataFrame) -> DataFrame:
        try:
            bits = int(
                str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
            ).bit_length()
        except Exception:  # Connect-mode or API drift: fall back to persist
            return df.persist()
        return df.persist() if bits > self._STATS_RESET_BITS else df

    # -- the loop --------------------------------------------------------------

    def run(
        self,
        initial_state: DataFrame,
        step: Callable[[DataFrame, int], DataFrame],
        resume: bool = False,
    ) -> SuperstepResult:
        sc = self.spark.sparkContext
        sc.setJobGroup(self.job_group, "linkgraph superstep loop", interruptOnCancel=True)

        start_iter = 0
        state = initial_state
        if resume:
            latest = self.latest_checkpoint()
            if latest is not None:
                state = self.spark.read.parquet(self._state_path(latest))
                start_iter = latest
        # Materialize + truncate lineage of the incoming state once so the
        # first step doesn't recompute the whole upstream plan per action.
        state = self._ckpt_stats_guard(state.localCheckpoint(eager=True))

        metrics: list[dict] = []
        converged = False
        first_plan: str | None = None
        i = start_iter
        gc_interval = 4  # see below: shuffle-file cleanup is GC-driven
        while i < self.max_iterations:
            t0 = time.time()
            new_state = step(state, i)
            if first_plan is None:
                first_plan = new_state._jdf.queryExecution().toString()
            # Lineage truncation: REQUIRED for iterative DataFrame plans.
            new_state = self._ckpt_stats_guard(
                new_state.localCheckpoint(eager=True)
            )
            run_metric = self.metric is not None and (
                (i + 1) % self.metric_every == 0 or i + 1 == self.max_iterations
            )
            metric = self.metric(new_state, state, i) if run_metric else float("nan")
            state.unpersist()
            state = new_state
            i += 1
            metrics.append({"iteration": i, "metric": metric, "sec": time.time() - t0})
            if os.environ.get("LINKGRAPH_SUPERSTEP_DEBUG"):
                print(
                    f"[superstep {self.job_group}] iter={i} metric={metric} "
                    f"sec={metrics[-1]['sec']:.2f}",
                    flush=True,
                )
            if self.checkpoint_dir and (
                i % self.checkpoint_interval == 0 or i == self.max_iterations
            ):
                self._write_checkpoint(state, i, metric)
            if i % gc_interval == 0:
                # Spark's ContextCleaner frees shuffle files only when the
                # driver GC collects the RDD objects; a long superstep loop
                # outruns it and accumulated shuffle data slows later
                # iterations (measured: 5s → 14s drift over 10 supersteps).
                # A periodic explicit GC keeps on-disk shuffle state bounded.
                self.spark.sparkContext._jvm.System.gc()
            if self.converged is not None and self.converged(metric):
                converged = True
                break
        if self.checkpoint_dir and not (
            i % self.checkpoint_interval == 0 or i == self.max_iterations
        ):
            # final state always durable when a checkpoint dir is configured
            self._write_checkpoint(state, i, metrics[-1]["metric"] if metrics else float("nan"))
        sc.setJobGroup("", "")
        return SuperstepResult(
            state=state,
            iterations=i,
            converged=converged,
            metrics=metrics,
            first_plan=first_plan,
        )

    def cancel(self) -> None:
        self.spark.sparkContext.cancelJobGroup(self.job_group)
