#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracle SQL vs Verify parquet dumps.

Mimics the driver's gate: for each query dir in OUT_DIR, run the
corresponding oracle SQL in DuckDB over the sf tables, sort columns
by name, sort rows, and compare cell values.

Comparison discipline (matches the driver's canonical-string hash):
- float64 vs float64: tolerated to ~1e-9 rel (driver is exact; the
  repo's float discipline keeps those bitwise anyway).
- float vs non-float (Decimal, int): HARD FAIL. This is exactly the
  class the driver red-flags — DuckDB DECIMAL / HUGEINT surfaces as
  float64 through fetchdf while Spark's parquet keeps Decimal/int64,
  so the canonical cell strings can never match. (r5 lesson: q142/
  q173/q203/q208/q242.)
- everything else: exact STRING-representation equality — value-equal
  but differently-rendered cells (Decimal('1.20') vs 1.2) are the
  driver's hash mismatch, so they are ours too.

Usage: python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, os, json, math
import numpy as np
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

def _is_float(x):
    return isinstance(x, (float, np.floating))

def cells_equal(a, b):
    if a is None and b is None: return True
    fa, fb = _is_float(a), _is_float(b)
    if fa and fb:
        if math.isnan(a) and math.isnan(b): return True
        return a == b or abs(a-b) <= 1e-9*max(abs(a),abs(b),1.0)
    if fa != fb:
        # NaN-vs-None is the nullable-column pandas artifact, equal;
        # any OTHER float/non-float pairing is a hash-unstable output
        # type (DECIMAL>18 digits or HUGEINT on one side) — hard fail.
        f = a if fa else b
        o = b if fa else a
        return o is None and math.isnan(f)
    return str(a) == str(b)

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
