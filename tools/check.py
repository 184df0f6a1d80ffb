#!/usr/bin/env python3
"""Dev-only pre-declare gate (SURVEY.md §2.0.8) — NOT part of the library.

Mimics the driver's t2 compare: for each query dir under OUTDIR, load the
Spark-written parquet, run the matching oracle SQL from oracle_sql.json in
DuckDB (tables = views over the sf parquet files), sort columns by name, and
compare row-by-row values exactly.

Round-2 hardening (VERDICT.md r1 #4): the round-1 version tolerated exactly
the drift the driver fails on. Now ALL of these are hard FAILs:
  - any Spark output column with a DECIMAL or tz-aware TIMESTAMP physical
    type (pyarrow schema lint on the written parquet);
  - any dtype difference between the Spark and oracle pandas frames;
  - any tz-aware column on either side (no tz-stripping normalization).

Usage:
    python3 tools/check.py <sfDir> <outDir> [key ...]
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pyarrow.types as pat

TABLES = ["region", "nation", "supplier", "customer", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    return df[sorted(df.columns)].reset_index(drop=True)


def schema_lint(qdir: str):
    """Return [(col, type)] of forbidden physical types in the Spark output."""
    bad = []
    for f in glob.glob(os.path.join(qdir, "*.parquet")):
        sch = pq.read_schema(f)
        for field in sch:
            t = field.type
            if pat.is_decimal(t):
                bad.append((field.name, str(t)))
            elif pat.is_timestamp(t) and t.tz is not None:
                bad.append((field.name, str(t)))
        break  # one part-file carries the full schema
    return bad


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for key in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, key)
        if not os.path.isdir(qdir) or (only and key not in only):
            continue
        bad_schema = schema_lint(qdir)
        if bad_schema:
            print(f"FAIL {key}: forbidden output type(s) {bad_schema} "
                  f"(decimal / tz-aware timestamp — driver hash will reject)")
            n_fail += 1
            continue
        try:
            got = norm(con.execute(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df())
        except Exception as e:
            print(f"FAIL {key}: cannot read spark output: {e}"); n_fail += 1; continue
        if key not in oracle:
            print(f"SKIP {key}: no oracle (rows={len(got)})"); continue
        try:
            exp = norm(con.execute(oracle[key]).df())
        except Exception as e:
            print(f"FAIL {key}: oracle sql error: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {key}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1; continue
        tz_cols = [(c, str(df[c].dtype)) for df in (got, exp) for c in df.columns
                   if isinstance(df[c].dtype, pd.DatetimeTZDtype)]
        if tz_cols:
            print(f"FAIL {key}: tz-aware column(s) {tz_cols}"); n_fail += 1; continue
        dt = [(c, str(got[c].dtype), str(exp[c].dtype))
              for c in got.columns if str(got[c].dtype) != str(exp[c].dtype)]
        if dt:
            print(f"FAIL {key}: dtype drift {dt}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {key}: rows {len(got)} != {len(exp)}"); n_fail += 1; continue
        bad = None
        for c in got.columns:
            a, b = got[c], exp[c]
            neq = ~((a == b) | (a.isna() & b.isna()))
            if neq.any():
                i = int(neq.idxmax())
                bad = (c, i, a[i], b[i], str(a.dtype), str(b.dtype))
                break
        if bad:
            c, i, av, bv, at, bt = bad
            print(f"FAIL {key}: col {c} row {i}: spark={av!r}({at}) oracle={bv!r}({bt})")
            n_fail += 1
        else:
            print(f"PASS {key} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
