#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/validate.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB over the same test lake, and
compares: schema (column names), row count, and cell values with columns
sorted by name (mirroring the driver's hash compare). Reports per-query
PASS/FAIL. Exit code = number of failures.

Dev-only tool (driver-side python deps); not part of the shipped library.
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as pads


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    if hasattr(v, "isoformat"):  # date/datetime
        return v.isoformat()
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return v


def rows_of(table):
    cols = sorted(table.column_names)
    if not cols:
        return cols, []
    data = [table.column(c).to_pylist() for c in cols]
    return cols, [tuple(canon(x) for x in row) for row in zip(*data)]


def type_class(t):
    """Coarse arrow-type class for hash-sensitivity comparison.

    The driver's hash is type/encoding sensitive: DuckDB HUGEINT
    (decimal128/int128 in arrow) vs Spark INT64 hash-mismatches even when
    every cell is equal (round-7 x_seq_pack).  canon() reduces both to
    Python ints, which masked it — so compare coarse type classes too.
    Classes chosen so that pairs the driver is known to accept (int32 vs
    int64 widths, float32/64, tz-naive vs tz-aware timestamps) collapse,
    while int-vs-hugeint/decimal/string splits stay visible.
    """
    import pyarrow as pa
    if pa.types.is_decimal(t):
        # Decimal canonicalizes to float driver-side (g_reproject_utm18s:
        # double vs decimal(24,1) is driver-green), so decimal and float
        # share a class; int-vs-decimal (HUGEINT) does NOT ("1024" vs
        # "1024.0") — that is the x_seq_pack failure shape.
        return "float"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return ("list", type_class(t.value_type))
    if pa.types.is_struct(t):
        return ("struct",) + tuple(
            (f.name, type_class(f.type)) for f in t)
    if pa.types.is_map(t):
        return ("map", type_class(t.key_type), type_class(t.item_type))
    return str(t)


def type_mismatches(got_tbl, exp_tbl):
    """Columns whose coarse type class differs spark-vs-duck."""
    gs = {f.name: f.type for f in got_tbl.schema}
    es = {f.name: f.type for f in exp_tbl.schema}
    out = []
    for c in sorted(set(gs) & set(es)):
        a, b = type_class(gs[c]), type_class(es[c])
        if a != b:
            out.append((c, str(gs[c]), str(es[c])))
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    only = set(sys.argv[3:])
    for name, sql in oracle.items():
        if only and name not in only:
            continue
        try:
            got_tbl = pads.dataset(f"{out_dir}/{name}").to_table()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            failures += 1
            continue
        try:
            exp_tbl = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        gc, gr = rows_of(got_tbl)
        ec, er = rows_of(exp_tbl)
        if gc != ec:
            print(f"FAIL {name}: columns differ spark={gc} duck={ec}")
            failures += 1
            continue
        tm = type_mismatches(got_tbl, exp_tbl)
        if tm:
            print(f"FAIL {name}: result-type class mismatch "
                  f"(driver hash is type-sensitive): " +
                  "; ".join(f"{c}: spark={a} duck={b}" for c, a, b in tm))
            failures += 1
            continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rowcount spark={len(gr)} duck={len(er)}")
            failures += 1
            continue
        # exact order compare first; fall back to sorted compare diagnostics
        if gr != er:
            mism = [i for i, (a, b) in enumerate(zip(gr, er)) if a != b][:3]
            print(f"FAIL {name}: {len([1 for a,b in zip(gr,er) if a!=b])}/{len(gr)} rows differ; first at {mism}")
            for i in mism:
                print(f"   spark[{i}] = {gr[i]}")
                print(f"   duck [{i}] = {er[i]}")
            if sorted(map(repr, gr)) == sorted(map(repr, er)):
                print("   (note: sets equal — ordering-only mismatch)")
            failures += 1
            continue
        print(f"PASS {name} ({len(gr)} rows)")
    print(f"== {failures} failures ==")
    sys.exit(min(failures, 99))


if __name__ == "__main__":
    main()
