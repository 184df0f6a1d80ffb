#!/usr/bin/env python3
"""Dev-only pre-declare gate (SURVEY.md §2.0.8) — NOT part of the library.

Mimics the driver's t2 compare: for each query dir under OUTDIR, load the
Spark-written parquet, run the matching oracle SQL from oracle_sql.json in
DuckDB (tables = views over the sf parquet files), sort columns by name, and
compare row-by-row values exactly. Usage:

    python3 tools/check.py <sfDir> <outDir> [key ...]
"""
import json, os, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "supplier", "customer", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        # tz-aware (Spark UTC parquet) vs naive (DuckDB) → compare naive
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except TypeError:
                pass
    return df


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
        if len(got) != len(exp):
            print(f"FAIL {key}: rows {len(got)} != {len(exp)}"); n_fail += 1; continue
        bad = None
        for c in got.columns:
            a, b = got[c], exp[c]
            neq = ~((a == b) | (a.isna() & b.isna()))
            if neq.any():
                i = int(neq.idxmax())
                bad = (c, i, a[i], b[i],
                       str(a.dtype), str(b.dtype))
                break
        if bad:
            c, i, av, bv, at, bt = bad
            print(f"FAIL {key}: col {c} row {i}: spark={av!r}({at}) oracle={bv!r}({bt})")
            n_fail += 1
        else:
            # dtype drift warning (value-equal but physical type differs)
            dt = [(c, str(got[c].dtype), str(exp[c].dtype))
                  for c in got.columns if str(got[c].dtype) != str(exp[c].dtype)]
            note = f"  [dtype drift: {dt}]" if dt else ""
            print(f"PASS {key} ({len(got)} rows){note}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
