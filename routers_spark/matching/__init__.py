from routers_spark.matching.matcher import match_trips  # noqa: F401
