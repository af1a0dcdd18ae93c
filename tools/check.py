#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads each <outDir>/<name> parquet (Verify.scala output), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the
same sf dir, sorts columns by name + rows by value, and compares.
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

import datetime as _dt
import pandas as _pd

def _norm(v):
    # Spark DATE reads back as datetime.date; DuckDB DATE through .df() is a
    # midnight Timestamp — the driver's hash treats them as equal, so do we
    if isinstance(v, _pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, _dt.datetime):
        if v.hour == v.minute == v.second == 0 and v.microsecond == 0:
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    return repr(v)

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm(r[i]) for i in order))
    out.sort()
    return sorted(c for c in cols), out

fails = 0
# a query that THREW in Verify leaves no output dir — that must be a
# failure, not a silent skip (this is exactly how a broken query once
# slipped past as "FAILURES: 0")
present = {os.path.basename(d.rstrip("/")) for d in glob.glob(f"{out_dir}/*/")}
for name in sorted(set(oracle) - present):
    print(f"  {name}: NO VERIFY OUTPUT (query failed?)")
    fails += 1
for d in sorted(glob.glob(f"{out_dir}/*/")):
    name = os.path.basename(d.rstrip("/"))
    files = glob.glob(f"{d}/*.parquet")
    tbl = pq.read_table(files[0]) if len(files) == 1 else pq.ParquetDataset(d).read()
    scols = tbl.column_names
    sdf = tbl.to_pandas()
    srows = [tuple(v.item() if hasattr(v, "item") else v for v in row)
             for row in sdf.itertuples(index=False, name=None)]
    if name not in oracle:
        print(f"  {name}: rows-only ({len(srows)} rows)" + (" EMPTY!" if not srows else ""))
        if not srows: fails += 1
        continue
    ocols = None
    try:
        res = con.execute(oracle[name])
        ocols = [x[0] for x in res.description]
        # go through pandas like the driver's harness does: DuckDB HUGEINT
        # (bare sum() of integers) becomes float64 here, so an uncast oracle
        # sum hashes as "5.0" against Spark's "5" — fetchall() would hide that
        odf = res.df()
        orows = [tuple(v.item() if hasattr(v, "item") else v for v in row)
                 for row in odf.itertuples(index=False, name=None)]
    except Exception as e:
        print(f"  {name}: ORACLE SQL ERROR: {e}")
        fails += 1
        continue
    sc, sr = canon(srows, scols)
    oc, orr = canon(orows, ocols)
    if sc != oc:
        print(f"  {name}: SCHEMA MISMATCH spark={sc} oracle={oc}")
        fails += 1
    elif sr != orr:
        diff = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
        print(f"  {name}: VALUE MISMATCH rows spark={len(sr)} oracle={len(orr)}; first diffs: {diff}")
        fails += 1
    else:
        print(f"  {name}: OK ({len(sr)} rows, cols={sc})")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
