"""Local mirror of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet, compare row count,
column names, column TYPES, and order-insensitive values.

The driver's hash is output-type sensitive (round-1 verdict): DuckDB widens
sum(BIGINT) -> HUGEINT/decimal128(38,0) and sum(DECIMAL(18,s)) -> DECIMAL(38,s)
while Spark returns bigint/decimal(p+10,s); identical values then hash
differently.  This mirror therefore compares the Spark schema against the
DuckDB arrow() schema under a normalization that tolerates integer *width*
(int32 vs int64 both hash as ints driver-side) but flags decimal-vs-int drift
and decimal precision/scale drift.  Decimal values are compared exactly (no
float coercion).

Usage: python tools/check_oracle.py [--sf /root/testdata/sf0.01] [--only name]
"""

from __future__ import annotations

import argparse
import math
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_spark_type(dt_str: str) -> str:
    """Normalize a Spark simpleString type to the driver-comparison alphabet."""
    s = dt_str.strip().lower()
    m = re.match(r"^array<(.*)>$", s)
    if m:
        return f"array<{norm_spark_type(m.group(1))}>"
    m = re.match(r"^decimal\((\d+),\s*(-?\d+)\)$", s)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    if s in ("tinyint", "smallint", "int", "integer", "bigint", "long", "short", "byte"):
        return "int"
    if s in ("float", "double", "real"):
        return "float"
    if s in ("string", "varchar"):
        return "string"
    if s.startswith("varchar(") or s.startswith("char("):
        return "string"
    if s in ("timestamp", "timestamp_ntz", "timestamp_ltz"):
        return "timestamp"
    if s == "date":
        return "date"
    if s in ("boolean", "bool"):
        return "bool"
    if s == "binary":
        return "binary"
    return s


def norm_arrow_type(t) -> str:
    """Normalize a pyarrow DataType to the same alphabet as norm_spark_type."""
    import pyarrow as pa

    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return f"array<{norm_arrow_type(t.value_type)}>"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def canon(v):
    import datetime as dt
    from decimal import Decimal

    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, Decimal):
        # exact, no float coercion; Decimal("1.50") == Decimal("1.5") numerically
        return ("dec", v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def rows_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out


def spark_types_by_col(sdf) -> dict:
    return {f.name: norm_spark_type(f.dataType.simpleString()) for f in sdf.schema.fields}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from peerdb_spark import get_spark

    spark = get_spark("check_oracle", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    names = args.only.split(",") if args.only else list(qs)
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            scols = sdf.columns
            stypes = spark_types_by_col(sdf)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        if name not in osql:
            print(f"skip  {name}: no oracle (rows-only: {len(srows)} rows)")
            continue
        try:
            tbl = con.execute(osql[name]).arrow()
            ocols = list(tbl.schema.names)
            otypes = {f.name: norm_arrow_type(f.type) for f in tbl.schema}
            orows = [tuple(d[c] for c in ocols) for d in tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        dt_s = time.time() - t0
        # hard lint: NO decimal-typed output columns.  Rounds 1-2 showed the
        # driver's value hash is unreliable for decimal cells even when values
        # and normalized types match on both engines — declared queries must
        # emit only int/double/string/date/timestamp/bool/binary/array outputs.
        dec_cols = [c for c in scols if stypes[c].startswith("decimal")] + [
            c for c in ocols if otypes[c].startswith("decimal")
        ]
        if dec_cols:
            print(f"FAIL  {name}: decimal output columns (driver-hash-unsafe): {sorted(set(dec_cols))}")
            failures += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            failures += 1
            continue
        type_diffs = {
            c: (stypes[c], otypes[c])
            for c in scols
            if stypes[c] != otypes[c] and otypes[c] != "null"
        }
        if type_diffs:
            print(f"FAIL  {name}: output types differ (spark vs oracle): {type_diffs}")
            failures += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            failures += 1
            continue
        sm, om = rows_multiset(scols, srows), rows_multiset(ocols, orows)
        if sm != om:
            ndiff = sum(1 for a, b in zip(sm, om) if a != b)
            print(f"FAIL  {name}: values differ in {ndiff}/{len(sm)} sorted rows")
            for a, b in zip(sm, om):
                if a != b:
                    print(f"      spark : {a}")
                    print(f"      oracle: {b}")
                    break
            failures += 1
            continue
        print(f"ok    {name}: {len(srows)} rows, {dt_s:.1f}s")
    print(f"\n{len(names) - failures}/{len(names)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
