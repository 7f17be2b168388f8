from routers_spark.graph.packed import PackedGraph, build_packed_graph  # noqa: F401
