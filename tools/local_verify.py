#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle at a given SF dir. Usage:
  python3 tools/local_verify.py <verifyOutDir> <sfDir> [only_prefix...]
Builder-side tool only (driver has its own); not part of the library.
"""
import sys, os, json, hashlib
import duckdb
import pyarrow.parquet as pq

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

def table_hash(tbl):
    cols = sorted(tbl.column_names)
    rows = []
    data = {c: tbl.column(c).to_pylist() for c in cols}
    for i in range(tbl.num_rows):
        rows.append("|".join(canon(data[c][i]) for c in cols))
    rows.sort()
    h = hashlib.md5()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = sys.argv[3:]
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    fails = 0
    for name in sorted(oracle):
        if only and not any(name.startswith(o) for o in only):
            continue
        spark_dir = os.path.join(outdir, name)
        if not os.path.isdir(spark_dir):
            print(f"{name}: MISSING spark output")
            fails += 1
            continue
        spark_tbl = pq.read_table(spark_dir)
        try:
            duck_tbl = con.execute(oracle[name]).arrow()
        except Exception as e:
            print(f"{name}: ORACLE ERR {e}")
            fails += 1
            continue
        rm = spark_tbl.num_rows == duck_tbl.num_rows
        sm = sorted(spark_tbl.column_names) == sorted(duck_tbl.column_names)
        hm = rm and sm and table_hash(spark_tbl) == table_hash(duck_tbl)
        status = "ok" if (rm and sm and hm) else "FAIL"
        if status == "FAIL":
            fails += 1
        print(f"{name}: {status} rows={spark_tbl.num_rows}/{duck_tbl.num_rows}"
              f" schema={sm} hash={hm}")
        if not sm:
            print(f"  spark cols: {sorted(spark_tbl.column_names)}")
            print(f"  duck  cols: {sorted(duck_tbl.column_names)}")
    sys.exit(1 if fails else 0)

main()
