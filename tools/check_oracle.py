#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, compare against the Spark result parquet written by
graft.Verify (rows sorted, columns sorted by name, values normalized).

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, os, math
import duckdb
import pyarrow.parquet as pq

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(v):
    # Deliberately STRICTER than the driver: no float rounding, no decimal
    # normalization, and the python type class is part of the value. Round 1
    # learned the hard way that Decimal('247392.00') vs float 247392.0 can
    # hash-mismatch driver-side while a lenient local check passes — so query
    # outputs must already be representation-identical, not just value-equal.
    if v is None: return None
    if isinstance(v, bytes): return v.hex()
    import decimal, datetime
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if isinstance(v, float):
        return ("float", repr(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out, sorted(cols)

n_pass = n_fail = 0
for name in sorted(os.listdir(out_dir)):
    path = os.path.join(out_dir, name)
    if not os.path.isdir(path): continue
    tbl = pq.read_table(path)
    spark_cols = tbl.column_names
    spark_rows = [tuple(d[c] for c in spark_cols) for d in tbl.to_pylist()]
    if name not in oracle:
        print(f"  [rows-only] {name}: {len(spark_rows)} rows")
        continue
    try:
        # Physical-type lint (the q32 lesson): DuckDB quietly widens e.g.
        # sum(BIGINT) to HUGEINT, a type Spark cannot produce — values then
        # compare equal HERE (python ints) while the DRIVER's value-hash
        # diverges on physical type. Fail fast on any oracle column whose
        # type Spark has no counterpart for; the fix is a CAST in the SQL.
        rel = con.sql(oracle[name])
        bad = [(c, t) for c, t in zip(rel.columns, map(str, rel.types))
               if "HUGEINT" in t or t.startswith(("UTINYINT", "USMALLINT",
                                                  "UINTEGER", "UBIGINT"))]
        if bad:
            print(f"✗ {name}: ORACLE TYPE LINT: un-Spark-able column types {bad} "
                  f"— add CAST(... AS BIGINT/DOUBLE) in the oracle SQL")
            n_fail += 1
            continue
        res = con.execute(oracle[name])
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
    except Exception as e:
        print(f"✗ {name}: ORACLE SQL ERROR: {e}")
        n_fail += 1
        continue
    s_rows, s_cols = canon(spark_rows, spark_cols)
    d_rows, d_cols = canon(duck_rows, duck_cols)
    if s_cols != d_cols:
        print(f"✗ {name}: schema mismatch spark={s_cols} duck={d_cols}")
        n_fail += 1
    elif s_rows != d_rows:
        n = len(s_rows); m = len(d_rows)
        diff = None
        for i in range(min(n, m)):
            if s_rows[i] != d_rows[i]:
                diff = (i, s_rows[i], d_rows[i]); break
        print(f"✗ {name}: rows spark={n} duck={m} first_diff={diff}")
        n_fail += 1
    else:
        print(f"✓ {name}: {len(s_rows)} rows")
        n_pass += 1
print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
