"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and an order-insensitive value hash (columns sorted by name, rows sorted).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import numpy as np
import pandas as pd


def canonical(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
    rows = sorted(df.itertuples(index=False, name=None), key=lambda r: tuple(str(v) for v in r))
    h = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
    return len(rows), cols, h


def main() -> int:
    sys.path.insert(0, ".")
    import __spark_entry__ as entry_mod
    from routers_spark.session import get_spark
    from routers_spark.queries import TABLES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("local[8]", app_name="check_oracle", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark_df = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only check, spark rows={len(spark_df)}")
            continue
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        sn, sc, sh = canonical(spark_df)
        dn, dc, dh = canonical(duck_df)
        ok = (sn, sc, sh) == (dn, dc, dh)
        status = "OK  " if ok else "FAIL"
        if not ok:
            failures += 1
        print(f"{status} {name}: spark({sn} rows, {sh}) duck({dn} rows, {dh})")
        if not ok and sc != dc:
            print(f"     cols spark={sc} duck={dc}")
        if not ok and sn == dn and sc == dc:
            # locate first differing row for debugging
            s = spark_df[sorted(spark_df.columns)].sort_values(sorted(spark_df.columns)).reset_index(drop=True)
            d = duck_df[sorted(duck_df.columns)].sort_values(sorted(duck_df.columns)).reset_index(drop=True)
            for i in range(min(len(s), 2000)):
                if not s.iloc[i].equals(d.iloc[i]):
                    print(f"     first diff row {i}:\n      spark={s.iloc[i].to_dict()}\n      duck ={d.iloc[i].to_dict()}")
                    break
    spark.stop()
    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
