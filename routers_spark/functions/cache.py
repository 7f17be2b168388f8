"""Bounded materialization registry: freeze intermediate DataFrames that
must not be recomputed divergently (a nondeterministic upstream read by a
counts-then-use pair, an index read by several joins) WITHOUT leaking one
cached copy per call into executor storage for the session's lifetime.

Implementation: ``localCheckpoint(eager=True)`` rather than ``persist()``.
The difference matters for safety, not just style:

- ``persist()`` registers the plan with the SQL CacheManager, which holds a
  strong JVM reference until an explicit ``unpersist()`` — so a bounded
  registry MUST evict explicitly, and an eviction can un-freeze a frame
  that a not-yet-executed downstream plan still references (the upstream
  then re-executes, possibly differently: silent wrongness).
- ``localCheckpoint`` materializes the partitions once and truncates the
  lineage to a ``LogicalRDD``; the blocks belong to that RDD. Any lazy
  downstream plan keeps the RDD alive JVM-side, and Spark's ContextCleaner
  unpersists the blocks automatically once nothing references them. The
  registry below only bounds how long WE pin a strong reference — dropping
  it can never invalidate a pending consumer, and if a block were somehow
  lost the job fails loudly (no lineage to silently re-execute).

Each ``scope`` pins the most recent ``cap`` frames so bench loops reuse
storage bounded by ``cap``, with reclamation of evicted frames deferred to
GC + ContextCleaner exactly until their last consumer executes."""

from __future__ import annotations

from collections import defaultdict, deque

from pyspark.sql import DataFrame

_REGISTRY: dict[str, deque] = defaultdict(deque)


def bounded_persist(df: DataFrame, scope: str, cap: int = 2) -> DataFrame:
    """Materialize ``df`` (eager local checkpoint) and return the frozen
    frame. The registry drops its pin on the oldest frame of ``scope``
    once more than ``cap`` are held; actual block reclamation waits for
    the last referencing plan to be garbage collected."""
    frozen = df.localCheckpoint(eager=True)
    q = _REGISTRY[scope]
    q.append(frozen)
    while len(q) > cap:
        q.popleft()  # reclamation is GC-driven; see module docstring
    return frozen
