#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check.py <outDir> <sfDir>

Reads each <outDir>/<name> parquet (written by graft.Verify) and the
dumped oracle_sql.json, runs each SQL in DuckDB against the sf tables,
and compares: schema (column names), row count, and values (rows sorted,
columns sorted by name, exact match after normalizing to strings with
float repr).
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _unsafe_type(t):
    import pyarrow as pa
    if pa.types.is_decimal(t) or pa.types.is_struct(t) or \
            pa.types.is_map(t) or pa.types.is_interval(t) or \
            pa.types.is_duration(t):
        return True
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return _unsafe_type(t.value_type)
    return False


def table_rows(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    rows = sorted(tuple(norm_cell(v) for v in row) for row in zip(*data))
    return cols, rows


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            spark_tbl = ds.dataset(f"{out_dir}/{name}", format="parquet").to_table()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        # Output-type lint (mirrors graft.Verify.outputTypeLint): the
        # driver's hasher is only known-stable on integer/float/
        # string/binary/bool/date-time columns; DECIMAL provably
        # splits it (q301/q344/q351, r14) and struct/map/interval are
        # untested. Fail loudly instead of hash-mismatching quietly.
        unsafe = [f.name for f in spark_tbl.schema
                  if _unsafe_type(f.type)]
        if unsafe:
            print(f"FAIL {name}: LINT unsafe output column type(s): "
                  f"{unsafe}")
            n_fail += 1
            continue
        try:
            duck_tbl = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        sc, sr = table_rows(spark_tbl)
        dc, dr = table_rows(duck_tbl)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(sr, dr) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(sr)} rows differ; first: "
                  f"spark={bad[0][0]} duck={bad[0][1]} (cols {sc})")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(sr)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
