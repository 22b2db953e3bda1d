#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: load Verify output
parquet per query, run the oracle SQL in DuckDB over the same testdata,
sort columns by name + rows by all columns, compare values exactly.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
(driver-side tooling only; the shipped library never imports this)
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

# Representation-strict: NO Decimal->float coercion.  The driver's gate
# compares string/hash representations exactly, so a Spark DECIMAL
# ('138014.00') vs a DuckDB DOUBLE (138014.0) must FAIL here too —
# queries must emit identical presentation types on both sides.
import datetime as _dt

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # normalize DATE columns only (Spark parquet -> datetime.date
            # objects, DuckDB -> datetime64): a type-level normalization
            # the driver also performs, not a value coercion
            nn = df[c].dropna()
            if len(nn) and isinstance(nn.iloc[0], _dt.date) and not isinstance(nn.iloc[0], _dt.datetime):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)

fails = 0
for name in sorted(oracle):
    d = f"{outdir}/{name}"
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    got = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
    try:
        exp = canon(con.execute(oracle[name]).fetchdf())
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
    # dtype KINDS must agree: Decimal(object) vs float64 would compare
    # numerically equal in Python but hash-mismatch in the driver
    kinds = [(c, got[c].dtype.kind, exp[c].dtype.kind) for c in got.columns]
    bad_kinds = [k for k in kinds if k[1] != k[2]]
    if bad_kinds:
        print(f"FAIL {name}: dtype-kind mismatch {bad_kinds}"); fails += 1; continue
    diff_cols = []
    for c in got.columns:
        a, b = got[c], exp[c]
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                # exact: the driver's hash compare has no tolerance, so
                # neither do we — every float column must be bit-stable
                eq = ((a == b) | (a.isna() & b.isna())).all()
            else:
                eq = ((a.astype(str) == b.astype(str)) | (a.isna() & b.isna())).all()
        except Exception:
            eq = (a.astype(str) == b.astype(str)).all()
        if not eq:
            diff_cols.append(c)
    if diff_cols:
        print(f"FAIL {name}: value mismatch in {diff_cols}")
        for c in diff_cols[:2]:
            m = ~((got[c].astype(str) == exp[c].astype(str)) | (got[c].isna() & exp[c].isna()))
            print(got[m].head(3)); print(exp[m].head(3))
        fails += 1
    else:
        print(f"PASS {name} ({len(got)} rows)")

# rows-only queries (no oracle): just report row counts
for d in sorted(glob.glob(f"{outdir}/*/")):
    name = os.path.basename(d.rstrip("/"))
    if name in oracle: continue
    files = glob.glob(f"{d}/*.parquet")
    n = sum(len(pd.read_parquet(f)) for f in files) if files else -1
    print(f"ROWS {name}: {n}")

print(f"\n{'ALL PASS' if fails==0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
