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
import re
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


def _select_item(sql, as_pos):
    """The SELECT-item text enclosing an `AS name` at as_pos: walk
    back to the previous top-level ',' / '(' / 'SELECT' at paren
    depth 0, so an unrelated round() in a NEIGHBORING item can no
    longer false-positive (the old fixed 600-char lookback could)."""
    depth = 0
    i = as_pos - 1
    while i >= 0:
        c = sql[i]
        if c == ")":
            depth += 1
        elif c == "(":
            if depth == 0:
                return sql[i + 1:as_pos]
            depth -= 1
        elif depth == 0:
            if c == ",":
                return sql[i + 1:as_pos]
            if sql[max(0, i - 5):i + 1].upper().endswith("SELECT"):
                return sql[i + 1:as_pos]
        i -= 1
    return sql[:as_pos]


def fragile_argmin_sql(sql):
    """Rounding-boundary lint (oracle side, complements
    graft.Verify.fragileArgminLint): flag any QUALIFY
    row_number() ... ORDER BY whose FIRST key is round(...) inline or
    a (possibly table-qualified) column defined via round(...) — a
    float-rounded argmin key flips the elected row on a 1-ulp
    FMA/libm difference between engines whenever candidates sit on
    the .5 boundary (the r15 q402 driver-hash lesson; real label
    censuses DO land there). Argmin keys must be exact-integer
    comparisons; a reported rounded column derived from the already-
    elected winner is fine. Returns the offending key names."""
    hits = []
    for m in re.finditer(
            r"QUALIFY\s+row_number\(\)\s+OVER\s*\(\s*PARTITION\s+BY"
            r"\s+.*?ORDER\s+BY\s+(.*?)\)\s*=\s*1", sql, re.I | re.S):
        first = m.group(1).split(",")[0].strip()
        if re.match(r"round\s*\(", first, re.I):
            hits.append(first[:40])
            continue
        km = re.match(r"(?:[a-zA-Z_]\w*\.)?([a-zA-Z_]\w*)$", first)
        if not km:
            continue
        key = km.group(1)
        for d in re.finditer(r"AS\s+" + key + r"\b", sql):
            if "round(" in _select_item(sql, d.start()).lower():
                hits.append(key)
                break
    return hits


def unsafe_oracle_types(schema):
    """Driver-hasher type lint, ORACLE side: the two r15/r16
    hash-red gates (q384/q402) were exactly the two whose DuckDB
    result carried arrow decimal128 columns (un-cast windowed
    sums) against Spark int64 — value-identical under str(), but
    the driver's hasher normalizes Decimal differently. Any
    decimal/struct/map/interval column in an oracle result must be
    cast (windowed sums / HUGEINT -> CAST(... AS BIGINT))."""
    return [f.name for f in schema if _unsafe_type(f.type)]


def lint_selftest():
    # Seeded regression: the PRE-fix q402 oracle shape must trip.
    fragile = """
      sc AS (SELECT feature, v,
        CAST(round(1e6 * (2.0 * CAST(cp * (cn - cp) AS DOUBLE)
          / CAST(cn AS DOUBLE))) AS BIGINT) AS gini_micro FROM run)
      SELECT feature, v FROM sc
      QUALIFY row_number() OVER (PARTITION BY feature
        ORDER BY gini_micro, v) = 1"""
    assert fragile_argmin_sql(fragile) == ["gini_micro"], \
        "lint failed to flag a round()-defined argmin key"
    # The fixed shape (exact HUGEINT floor-div key) must pass.
    exact = """
      sc2 AS (SELECT feature, v,
        CAST((4000000 * gnum + gden) // (2 * gden) AS BIGINT)
          AS gini_micro FROM sc)
      SELECT feature, v FROM sc2
      QUALIFY row_number() OVER (PARTITION BY feature
        ORDER BY gini_micro, v) = 1"""
    assert fragile_argmin_sql(exact) == [], \
        "lint false-positive on an exact integer argmin key"
    # round() elsewhere (not defining the ordering key) must pass.
    unrelated = """
      b AS (SELECT g, CAST(round(v * 1e6) AS BIGINT) AS vq, n FROM t)
      SELECT g, vq FROM b
      QUALIFY row_number() OVER (PARTITION BY g ORDER BY n) = 1"""
    assert fragile_argmin_sql(unrelated) == [], \
        "lint false-positive on a non-key round()"
    # Inline round() directly inside the ORDER BY (no alias) — the
    # shape the old alias-only regex silently missed (ADVICE r16).
    inline = """
      SELECT feature, v FROM sc
      QUALIFY row_number() OVER (PARTITION BY feature
        ORDER BY round(1e6 * g / n), v) = 1"""
    assert fragile_argmin_sql(inline), \
        "lint missed an inline round() ORDER BY key"
    # Qualified key (t.col) defined via round() — also previously
    # missed (the regex captured nothing after the dot).
    qualified = """
      WITH sc AS (SELECT feature, v,
        CAST(round(1e6 * 2.0 * cp / cn) AS BIGINT) AS gm FROM run)
      SELECT feature, v FROM sc t
      QUALIFY row_number() OVER (PARTITION BY feature
        ORDER BY t.gm, v) = 1"""
    assert fragile_argmin_sql(qualified) == ["gm"], \
        "lint missed a qualified round()-defined key"
    # Neighbor-item round() must NOT flag the exact key beside it
    # (the old 600-char window false-positived here).
    neighbor = """
      WITH sc AS (SELECT feature, v,
        CAST(round(x * 1e6) AS BIGINT) AS unrelated_q,
        (4000000 * gnum + gden) // (2 * gden) AS gm FROM run)
      SELECT feature, v FROM sc
      QUALIFY row_number() OVER (PARTITION BY feature
        ORDER BY gm, v) = 1"""
    assert fragile_argmin_sql(neighbor) == [], \
        "lint false-positive from a neighboring SELECT item's round()"
    print("lint selftest: 6/6 pass")
    return 0


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
        frag = fragile_argmin_sql(sql)
        if frag:
            print(f"FAIL {name}: LINT round()-defined argmin ordering "
                  f"key(s) in oracle SQL: {frag} — compare exactly in "
                  f"integers (r15 q402)")
            n_fail += 1
            continue
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
        unsafe_o = unsafe_oracle_types(duck_tbl.schema)
        if unsafe_o:
            print(f"FAIL {name}: LINT unsafe ORACLE output column "
                  f"type(s): {unsafe_o} — cast windowed sums/HUGEINT "
                  f"to BIGINT (r16 q384/q402 driver-hash root cause)")
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
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        sys.exit(lint_selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
