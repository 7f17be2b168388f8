from routers_spark.functions import cells, geo, hashing, sqlgen  # noqa: F401
