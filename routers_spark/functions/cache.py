"""Bounded persist registry: persist intermediate DataFrames that must not
be recomputed divergently (nondeterministic upstream frozen for a
counts-then-use pair, an index read by several joins) WITHOUT leaking one
cached copy per call into executor storage for the session's lifetime.

Each ``scope`` keeps the most recent ``cap`` persisted frames; older ones
are unpersisted (non-blocking) as new ones arrive. Callers that invoke the
same operator repeatedly (bench loops, long sessions) therefore hold a
bounded amount of storage instead of an ever-growing cache."""

from __future__ import annotations

from collections import defaultdict, deque

from pyspark.sql import DataFrame

_REGISTRY: dict[str, deque] = defaultdict(deque)


def bounded_persist(df: DataFrame, scope: str, cap: int = 2) -> DataFrame:
    """Persist ``df``; unpersist the oldest cached frame of ``scope`` once
    more than ``cap`` are live. Returns the persisted frame."""
    df = df.persist()
    q = _REGISTRY[scope]
    q.append(df)
    while len(q) > cap:
        old = q.popleft()
        try:
            old.unpersist(blocking=False)
        except Exception:  # noqa: BLE001 — context may already be stopped
            pass
    return df
