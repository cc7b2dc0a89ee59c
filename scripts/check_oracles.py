"""Dev-side oracle checker: runs every queries() entry on Spark and its
oracle_sql() on DuckDB at sf0.01, compares row count, sorted column names,
and an order-insensitive multiset of stringified rows — a faithful stand-in
for the driver's CORRECTNESS gate.

Usage: python scripts/check_oracles.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_val(v):
    import datetime
    import decimal
    import math

    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return str(v)


def df_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_val(r[i]) for i in order) for r in rows)
    return sorted(cols), out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))

    import __spark_entry__ as entry_mod
    from warcbase_spark.session import get_spark

    spark = get_spark(app_name="check_oracles")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failed = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_rows = sdf.collect()
            s_cols = sdf.columns
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(s_rows)} rows (no oracle)")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = rel.columns
            d_rows = rel.fetchall()
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc()
            failed.append(name)
            continue
        sc, sm = df_multiset(s_cols, [tuple(r) for r in s_rows])
        dc, dm = df_multiset(d_cols, d_rows)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            failed.append(name)
        elif len(sm) != len(dm):
            print(f"FAIL {name}: rowcount spark={len(sm)} duck={len(dm)}")
            failed.append(name)
        elif sm != dm:
            bad = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
            print(f"FAIL {name}: values differ, first: {bad}")
            failed.append(name)
        else:
            print(f"OK   {name}: {len(sm)} rows")
    attempted = [n for n in queries if not only or n in only]
    print(f"\n{len(attempted) - len(failed)}/{len(attempted)} pass"
          + ("" if not only else f" (subset of {len(queries)} registered)"))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
