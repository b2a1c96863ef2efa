#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracle SQL vs Verify parquet dumps.

Mimics the driver's gate: for each query dir in OUT_DIR, run the
corresponding oracle SQL in DuckDB over the sf tables, sort columns
by name, sort rows, and compare cell values (floats to ~1e-9 rel).

Usage: python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def cells_equal(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb): return True
        return fa == fb or abs(fa-fb) <= 1e-9*max(abs(fa),abs(fb),1.0)
    return a == b

n_pass = n_fail = n_skip = 0
for name in sorted(os.listdir(out_dir)):
    qdir = os.path.join(out_dir, name)
    if not os.path.isdir(qdir): continue
    files = [f for f in os.listdir(qdir) if f.endswith(".parquet")]
    got = pd.concat([pq.read_table(os.path.join(qdir,f)).to_pandas() for f in files]) \
        if files else pd.DataFrame()
    if name not in oracle:
        status = "ROWS-ONLY"
        ok = len(got) > 0
        print(f"{'PASS' if ok else 'FAIL'} {name} [{status}] rows={len(got)}")
        n_pass += ok; n_fail += (not ok)
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name} [ORACLE-SQL-ERROR] {e}")
        n_fail += 1; continue
    got_c, exp_c = canon(got), canon(exp)
    if list(got_c.columns) != list(exp_c.columns):
        print(f"FAIL {name} [COLS] got={list(got_c.columns)} exp={list(exp_c.columns)}")
        n_fail += 1; continue
    if len(got_c) != len(exp_c):
        print(f"FAIL {name} [ROWCOUNT] got={len(got_c)} exp={len(exp_c)}")
        n_fail += 1; continue
    bad = None
    gv, ev = got_c.values, exp_c.values
    for i in range(len(gv)):
        for j in range(gv.shape[1]):
            if not cells_equal(gv[i][j], ev[i][j]):
                bad = (i, j, gv[i][j], ev[i][j]); break
        if bad: break
    if bad:
        i, j, g, e = bad
        print(f"FAIL {name} [VALUE] row={i} col={got_c.columns[j]} got={g!r} exp={e!r}")
        n_fail += 1
    else:
        print(f"PASS {name} rows={len(got_c)}")
        n_pass += 1
print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
