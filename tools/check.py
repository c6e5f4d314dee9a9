#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfdir> <verify_outdir>
For each query dir: load spark parquet result, run oracle SQL in duckdb
over the same tables, sort columns by name, sort rows, compare values.
"""
import json, math, sys
from pathlib import Path

import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = Path(sfdir) / f"{t}.parquet"
    if p.exists():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize for comparison: round floats, stringify
    out = df.copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
    # Sort on float values rounded to 9 significant digits so near-equal
    # floats (within the compare tolerance) can't order rows differently
    # between engines and misalign the row-wise compare.
    key = out.copy()
    for c in key.columns:
        if key[c].dtype.kind == "f":
            key[c] = key[c].apply(
                lambda v: float(f"{v:.9g}") if pd.notna(v) else v)
    order = key.sort_values(by=list(key.columns), kind="mergesort").index
    return out.loc[order].reset_index(drop=True)

def kind(dtype) -> str:
    # collapse dtype kinds into the classes the driver's hash is
    # sensitive to: int-vs-float is a representation difference
    # (DuckDB HUGEINT reaches pandas as float64 and hashes "0.0" while
    # Spark's BIGINT hashes "0") — so it must FAIL here even when the
    # values compare equal.
    k = dtype.kind
    return {"i": "int", "u": "int", "f": "float", "b": "bool",
            "M": "datetime", "m": "timedelta"}.get(k, "obj")

def close(a, b):
    # The driver hashes exact value representations — floats must be
    # BIT-exact across engines, no tolerance (see CLAUDE.md invariants).
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return a == b

fails = 0
for name in sorted(oracle):
    qdir = Path(outdir) / name
    if not qdir.exists():
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        spark_df = pd.read_parquet(qdir)
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    s, d = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: cols spark={list(s.columns)} duck={list(d.columns)}")
        fails += 1; continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); fails += 1; continue
    badtype = [(c, kind(s[c].dtype), kind(d[c].dtype)) for c in s.columns
               if kind(s[c].dtype) != kind(d[c].dtype)]
    if badtype:
        c, ks, kd = badtype[0]
        print(f"FAIL {name}: dtype col {c}: spark={ks} duck={kd}")
        fails += 1; continue
    bad = None
    for c in s.columns:
        for i, (x, y) in enumerate(zip(s[c], d[c])):
            if not close(x, y):
                bad = (c, i, x, y); break
        if bad: break
    if bad:
        c, i, x, y = bad
        print(f"FAIL {name}: col {c} row {i}: spark={x!r} duck={y!r}")
        fails += 1
    else:
        print(f"ok   {name} ({len(s)} rows)")
print(f"{len(oracle)-fails}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
