#!/usr/bin/env python3
"""Strict cell-level diff between Spark verify output and DuckDB oracle:
NO normalization — prints repr() of every differing cell, including Decimal
scale and float bit patterns, to expose what a strict hash would see.

Usage: strict_diff.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, os, struct
import duckdb
import pyarrow.parquet as pq

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def key(v):
    return (v is None, str(v))

def show(v):
    import decimal
    if isinstance(v, float):
        return f"float({v!r}/0x{struct.pack('>d', v).hex()})"
    if isinstance(v, decimal.Decimal):
        return f"Decimal({v!s})"
    return repr(v)

for name in sorted(oracle):
    if only and name not in only: continue
    path = os.path.join(out_dir, name)
    if not os.path.isdir(path): continue
    tbl = pq.read_table(path)
    s_cols = sorted(tbl.column_names)
    s_rows = sorted(([d[c] for c in s_cols] for d in tbl.to_pylist()),
                    key=lambda r: [key(x) for x in r])
    res = con.execute(oracle[name])
    d_colnames = [d[0] for d in res.description]
    order = sorted(range(len(d_colnames)), key=lambda i: d_colnames[i])
    d_cols = sorted(d_colnames)
    d_rows = sorted(([r[i] for i in order] for r in res.fetchall()),
                    key=lambda r: [key(x) for x in r])
    # spark schema types
    s_types = {f.name: str(f.type) for f in tbl.schema}
    d_types = {d_colnames[i]: str(res.description[i][1]) for i in range(len(d_colnames))}
    ndiff = 0
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        for j, (sv, dv) in enumerate(zip(sr, dr)):
            if repr(sv) != repr(dv):
                if ndiff < 6:
                    print(f"  {name} row{i} col={s_cols[j]}: spark={show(sv)}  duck={show(dv)}")
                ndiff += 1
    typediff = {c: (s_types.get(c), d_types.get(c)) for c in s_cols
                if s_types.get(c) != d_types.get(c)}
    status = "STRICT-DIFF" if ndiff else "strict-equal"
    print(f"{name}: {status} ({ndiff} cells)  types: {typediff}")
