"""Self-check: run every REGISTRY query on Spark AND its DuckDB oracle,
compare row count, column names, and order-insensitive values — a local
stand-in for the driver's CORRECTNESS gate.

Usage: python scripts/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pyarrow as pa

from factstore_spark.queries import REGISTRY
from factstore_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _spark_class(dt: str) -> str:
    """Coarse dtype class for a Spark simpleString dtype."""
    d = dt.lower()
    if d.startswith("decimal"):
        return "decimal"
    if d in ("tinyint", "smallint", "int", "integer", "bigint", "long", "short", "byte"):
        return "int"
    if d in ("float", "double"):
        return "float"
    if d == "boolean":
        return "bool"
    if d in ("string", "varchar"):
        return "str"
    if d == "date":
        return "date"
    if d.startswith("timestamp"):
        return "timestamp"
    if d.startswith("array"):
        return "array"
    return "other:" + d


def _arrow_class(t) -> str:
    """Coarse dtype class for a DuckDB-arrow column type."""
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "array"
    return "other:" + str(t)


def dtype_drift(s_dtypes, d_schema):
    """Columns whose coarse dtype class differs between Spark and the
    oracle's arrow output. The driver's value hash is dtype-sensitive
    (e.g. DuckDB HUGEINT -> decimal128 vs Spark bigint hashed apart even
    when every value is equal — the round-6 text_boilerplate_lines red
    row), while Python compares Decimal(3) == 3 as equal, so plain value
    comparison cannot catch this class of oracle bug."""
    s_map = {c: _spark_class(t) for c, t in s_dtypes}
    drift = []
    for field in d_schema:
        if field.name not in s_map:
            continue  # column-name mismatch is reported separately
        dc = _arrow_class(field.type)
        sc = s_map[field.name]
        if dc != sc:
            drift.append(f"{field.name}: spark={sc} oracle={dc}")
    return drift


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    unknown = only - set(REGISTRY)
    if unknown:
        # A typo'd filter must not report ALL MATCH having checked nothing.
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        return 2
    spark = get_spark(app_name="selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, (fn, sql) in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_rows = [tuple(r) for r in sdf.collect()]
            s_cols = list(sdf.columns)
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:200]}")
            failures.append(name)
            continue
        if sql is None:
            # Rows-only entries: "the emitted row IS the check" — so
            # CHECK it. Convention across the battery: any column named
            # match_bp or ending in _match_bp must be 10000, any *_ok
            # column must be truthy, and any *_problems count must be
            # 0, in every row; printing ok unconditionally let a
            # failing contract (e.g. layout_ok=0) pass as green.
            bad = []
            for r in s_rows:
                d = dict(zip(s_cols, r))
                for col, v in d.items():
                    if (col == "match_bp" or col.endswith("_match_bp")) and v != 10000:
                        bad.append(f"{col}={v}")
                    elif col.endswith("_ok") and not v:
                        bad.append(f"{col}={v}")
                    elif col.endswith("_problems") and v != 0:
                        bad.append(f"{col}={v}")
            if bad:
                print(f"FAIL {name}: contract columns tripped: {sorted(set(bad))}")
                failures.append(name)
            else:
                print(f"ok   {name}: rows-only ({len(s_rows)} rows, contract green)")
            continue
        try:
            tbl = con.execute(sql).fetch_arrow_table()
            d_cols = list(tbl.column_names)
            col_vals = [tbl.column(j).to_pylist() for j in range(tbl.num_columns)]
            d_rows = [tuple(col[i] for col in col_vals) for i in range(tbl.num_rows)]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:200]}")
            failures.append(name)
            continue
        drift = dtype_drift(sdf.dtypes, tbl.schema)
        if drift:
            print(f"FAIL {name}: dtype drift (driver hash would mismatch): {drift}")
            failures.append(name)
            continue
        sc, sr = norm_rows(s_cols, s_rows)
        dc, dr = norm_rows(d_cols, d_rows)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}")
            failures.append(name)
        elif len(sr) != len(dr):
            print(f"FAIL {name}: rowcount {len(sr)} vs {len(dr)}")
            failures.append(name)
        elif sr != dr:
            diff = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs:")
            for i in diff:
                print(f"   spark : {sr[i]}")
                print(f"   duckdb: {dr[i]}")
            failures.append(name)
        else:
            print(f"ok   {name}: {len(sr)} rows match")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("ALL MATCH")
    return 0


if __name__ == "__main__":
    sys.exit(main())
