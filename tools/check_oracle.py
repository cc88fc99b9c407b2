"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at sf0.01; compare
row count, schema-insensitive sorted columns, and order-insensitive
value multiset.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    return sorted(out, key=repr), [cols[i] for i in order]


def main():
    import duckdb
    import __spark_entry__ as entrymod
    from osm2garmin_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) \
        else os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))

    spark = get_spark("check-oracle", master="local[16]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = (entrymod.oracle_sql_for(sf_dir)
               if hasattr(entrymod, "oracle_sql_for")
               else entrymod.oracle_sql())
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR {type(e).__name__}: {e}"))
            print(f"FAIL  {name}: spark error {e}")
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append((name, f"schema mismatch {sorted(scols)} vs {sorted(dcols)}"))
            print(f"FAIL  {name}: schema {sorted(scols)} vs {sorted(dcols)}")
            continue
        # DTYPE-STRICT (VERDICT r6 #2): the driver hashes pandas frames,
        # where DuckDB HUGEINT (any SUM(BIGINT)) lands as float64 while a
        # Spark long stays int64 — equal VALUES, different hash. The old
        # checker compared python scalars (7 == 7.0) and passed what the
        # driver fails. Flag any integral-vs-float column family split.
        _INT_DUCK = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                     "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
        _FLT_DUCK = {"HUGEINT", "UHUGEINT", "FLOAT", "DOUBLE"}
        _INT_SPARK = {"tinyint", "smallint", "int", "bigint"}
        _FLT_SPARK = {"float", "double"}
        try:
            dtypes = {c: str(t).upper() for c, t in
                      zip(con.sql(oracles[name]).columns,
                          con.sql(oracles[name]).types)}
        except Exception:  # noqa: BLE001 — relation-only typing failed
            dtypes = {}
        stypes = dict(sdf.dtypes)
        dtype_bad = [
            (c, stypes[c], dtypes.get(c))
            for c in scols
            if (stypes.get(c) in _INT_SPARK and dtypes.get(c) in _FLT_DUCK)
            or (stypes.get(c) in _FLT_SPARK and dtypes.get(c) in _INT_DUCK)]
        if dtype_bad:
            failures.append((name, f"dtype family mismatch {dtype_bad}"))
            print(f"FAIL  {name}: dtype family mismatch {dtype_bad} "
                  f"(driver hash is dtype-sensitive)")
            continue
        s_n, d_n = len(srows), len(drows)
        s_vals, _ = _normalize([tuple(r) for r in srows], scols)
        d_vals, _ = _normalize(drows, dcols)
        if s_n != d_n:
            failures.append((name, f"rowcount {s_n} vs {d_n}"))
            print(f"FAIL  {name}: rowcount {s_n} vs {d_n}")
        elif s_vals != d_vals:
            diff = [(a, b) for a, b in zip(s_vals, d_vals) if a != b][:3]
            failures.append((name, f"values differ, first: {diff}"))
            print(f"FAIL  {name}: values differ; first diffs {diff}")
        else:
            print(f"OK    {name}: {s_n} rows")
    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, m in failures:
            print(f"  {n}: {m[:300]}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
