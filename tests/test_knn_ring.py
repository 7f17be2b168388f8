"""X3/X7 kNN ring expansion: the engine's radius-3 two-stage form must be
row-for-row identical to the one-shot radius-1 SQL (the oracle's shape).

This pins r6 change #10's exactness argument: the ring radius only decides
which events are RESOLVED by the ring versus the fallback scan — an
accepted ring winner is the provable global nearest under the conservative
block-boundary guarantee, so the final (event_id, nearest_station, dist_m)
set is radius-independent.
"""

from __future__ import annotations


def test_knn_radius3_matches_oneshot_sql(spark, sf_dir):
    from routers_spark.queries import (
        _SQL_QUERIES,
        _knn_spark_materialized,
        register_views,
    )

    register_views(spark, sf_dir)
    oneshot = spark.sql(_SQL_QUERIES["knn_nearest_station"]("spark"))
    staged = _knn_spark_materialized(spark, sf_dir)

    a = sorted(map(tuple, oneshot.collect()))
    b = sorted(map(tuple, staged.collect()))
    assert len(a) == len(b) > 0
    # dist_m comes from the same haversine expression on both paths —
    # exact equality expected, not approximate
    assert a == b


def test_knn_fallback_still_exercised(spark, sf_dir):
    """The radius-3 guarantee must not silently become 'everything passes'
    — on the sf0.001 corpus some events still take the fallback scan, so
    both branches of the union stay covered."""
    from routers_spark.queries import _knn_ctes, register_views

    register_views(spark, sf_dir)
    c = dict(_knn_ctes())
    r, cell = 3, "2.0e-2"
    c["ev_g"] = f"""
  SELECT *,
         least(lon + 180.0e0 - (cx - {r}) * {cell},
               (cx + {r + 1}) * {cell} - (lon + 180.0e0)) AS glon,
         least(lat + 90.0e0 - (cy - {r}) * {cell},
               (cy + {r + 1}) * {cell} - (lat + 90.0e0)) AS glat
  FROM ev"""
    c["nbr"] = f"""
  SELECT x.dx, y.dy
  FROM (SELECT explode(sequence(-{r}, {r})) AS dx) x
  CROSS JOIN (SELECT explode(sequence(-{r}, {r})) AS dy) y"""
    ctes = ",\n".join(f"{n} AS ({c[n]}\n)"
                      for n in ("ev", "ev_g", "st", "nbr", "ring"))
    counts = spark.sql(f"""WITH {ctes}
        SELECT count(DISTINCT event_id) AS resolved,
               (SELECT count(*) FROM ev_g) AS total
        FROM (SELECT event_id, min(dist_m) AS d, min(g_m) AS g
              FROM ring GROUP BY event_id)
        WHERE d <= g""").collect()[0]
    assert 0 < counts.resolved < counts.total
