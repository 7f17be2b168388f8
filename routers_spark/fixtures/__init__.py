from routers_spark.fixtures.roads import (  # noqa: F401
    disconnected,
    grid_network,
    straight_road,
    t_junction,
)
