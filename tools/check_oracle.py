#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify output
against DuckDB oracles and compare row-sets.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: datetimes → iso strings, floats → repr, ints → int
    out = pd.DataFrame()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.map(lambda v: "null" if pd.isna(v) else repr(float(v) + 0.0 if float(v) != 0 else 0.0))
        elif pd.api.types.is_bool_dtype(s):
            out[c] = s.map(lambda v: "null" if pd.isna(v) else str(bool(v)))
        else:
            out[c] = s.map(lambda v: "null" if v is None or (isinstance(v, float) and math.isnan(v)) else str(v))
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        if not g.equals(e):
            diff = (g != e).any(axis=1)
            i = diff[diff].index[0]
            print(f"FAIL {name}: first diff row {i}:\n  spark={g.loc[i].to_dict()}\n  duck ={e.loc[i].to_dict()}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
