#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Reads the Verify output dir (one parquet dir per query + oracle_sql.json),
runs each oracle SQL in DuckDB against the same sf parquet tables, and
compares: row count, column names (sorted), and a hash of the values with
columns sorted by name and rows sorted by all columns.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints->int64 where possible, floats rounded repr
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(qdir):
            continue
        name = os.path.basename(qdir)
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True) \
            if files else pd.DataFrame()
        if name not in oracles:
            print(f"  [rows-only] {name}: rows={len(got)}")
            n_noracle += 1
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"  [FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        ok_cols = list(g.columns) == list(e.columns)
        ok_rows = len(g) == len(e)
        ok_vals = False
        if ok_cols and ok_rows:
            try:
                gs = g.astype(str).to_csv(index=False)
                es = e.astype(str).to_csv(index=False)
                ok_vals = gs == es
            except Exception as ex:
                print(f"    compare error: {ex}")
        if ok_cols and ok_rows and ok_vals:
            print(f"  [PASS] {name} ({len(g)} rows)")
            n_pass += 1
        else:
            print(f"  [FAIL] {name}: cols_match={ok_cols} rows {len(g)}vs{len(e)} vals={ok_vals}")
            if not ok_cols:
                print(f"    got  cols: {list(g.columns)}")
                print(f"    want cols: {list(e.columns)}")
            elif not ok_vals and len(g) == len(e):
                diff = (g.astype(str) != e.astype(str))
                bad = diff.any(axis=0)
                for c in g.columns[bad][:3]:
                    i = diff[c].idxmax()
                    print(f"    first diff col={c} row={i}: got={g[c][i]!r} want={e[c][i]!r}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
