#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB against the sf tables and compare with the Verify parquet dump
(column-name-sorted, row-sorted, tolerant float compare + exact compare
reported separately)."""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}")
        n_fail += 1
        continue
    try:
        got = pd.read_parquet(f"{outdir}/{name}")
    except Exception as e:
        print(f"FAIL {name}: spark result missing: {e}")
        n_fail += 1
        continue
    exp = exp[sorted(exp.columns)].reset_index(drop=True)
    got = got[sorted(got.columns)] if set(got.columns) == set(exp.columns) else got
    if sorted(got.columns) != sorted(exp.columns):
        print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(exp.columns)}")
        n_fail += 1
        continue
    got = got[sorted(got.columns)].reset_index(drop=True)
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
        n_fail += 1
        continue
    # row-sort both for order-insensitive compare; also check as-is order
    def norm(df):
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    ok_exact = True
    detail = []
    for c in exp.columns:
        a, b = got[c], exp[c]
        try:
            # Dtype-SENSITIVE, like the driver's hash gate: an int64 Spark
            # column vs a DuckDB HUGEINT (fetchdf -> float64/object) is a
            # FAIL even when the digits agree. Timestamps are compared at
            # ns resolution regardless of storage unit (us/ns), since both
            # engines materialize the same logical instant.
            ka, kb = a.dtype.kind, b.dtype.kind
            if ka == 'M' and kb == 'M':
                same = a.astype('datetime64[ns]').equals(
                    b.astype('datetime64[ns]'))
            elif ka != kb:
                same = False
                detail.append(f"{c}: dtype {a.dtype} vs {b.dtype}")
            elif ka == 'f':
                same = np.allclose(a.astype(float), b.astype(float),
                                   rtol=0, atol=0, equal_nan=True)
            else:
                same = a.astype(str).equals(b.astype(str))
        except Exception as e:
            same = False
            detail.append(f"{c}: cmp error {e}")
        if not same:
            ok_exact = False
            detail.append(c)
    if ok_exact:
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
    else:
        print(f"FAIL {name}: value mismatch in {detail}")
        # show first diff
        for c in detail[:2]:
            if isinstance(c, str) and c in exp.columns:
                mask = got[c].astype(str) != exp[c].astype(str)
                idx = mask[mask].index[:3]
                for i in idx:
                    print(f"   row {i} col {c}: spark={got[c][i]!r} duck={exp[c][i]!r}")
        n_fail += 1
print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
