"""routers_spark — a from-scratch PySpark-native spatial-join + map-matching +
tiling engine with the query semantics of routers-org/routers.

Design pillars (SURVEY.md §7):
  (a) heavy per-row work only in Arrow-batched pandas UDFs / numpy — zero
      per-row Python;
  (b) relational glue stays JVM-side as Column expressions so Catalyst can
      push down, prune, and codegen;
  (c) road graph + spatial index broadcast once, packed as numpy arrays;
  (d) boundary correctness via padded cell-cover duplication + dedup;
  (e) deterministic everything — integer cost domain, pinned constants,
      stable hashes.
"""

__version__ = "0.1.0"
