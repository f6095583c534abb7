#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs each oracle SQL in DuckDB against the sf parquet tables, loads the
Spark parquet output written by graft.Verify, sorts columns by name, and
compares schemas + values. Usage:

    python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        # decimals arrive as objects; unify via str
        elif df[c].dtype == object and df[c].map(
                lambda x: type(x).__name__ in ("Decimal",)).any():
            df[c] = df[c].map(lambda x: None if x is None else str(x))
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    import os
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # Spark-written tables (e.g. tools/ScaleUp output) are
        # DIRECTORIES of part files; shipped testdata is single files
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_fail = 0
    # rows-only queries (no oracle): must exist and be non-empty
    import os
    for d in sorted(os.listdir(out_dir)):
        if d in oracles or not os.path.isdir(f"{out_dir}/{d}"):
            continue
        try:
            n = con.execute(
                f"SELECT count(*) FROM '{out_dir}/{d}/*.parquet'"
            ).fetchone()[0]
            status = "OK  " if n > 0 else "FAIL"
            if n == 0:
                n_fail += 1
            print(f"{status} {d} (rows-only, {n} rows)")
        except Exception as e:
            print(f"FAIL {d} (rows-only): {e}")
            n_fail += 1
    for name in sorted(oracles):
        try:
            exp = norm(con.execute(oracles[name]).df())
            got = norm(con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: load error: {e}")
            n_fail += 1
            continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} "
                  f"got={list(got.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_fail += 1
            continue
        bad = []
        for c in exp.columns:
            e, g = exp[c], got[c]
            if str(e.dtype) != str(g.dtype):
                bad.append(f"{c}: dtype exp={e.dtype} got={g.dtype}")
                continue
            if pd.api.types.is_float_dtype(e):
                neq = ~((e.isna() & g.isna()) | (e == g))
            else:
                neq = ~((e.isna() & g.isna()) | (e.astype(str) == g.astype(str)))
            if neq.any():
                i = neq.idxmax()
                bad.append(f"{c}: {int(neq.sum())} diffs, first@{i} "
                           f"exp={e[i]!r} got={g[i]!r}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:4]))
            n_fail += 1
        else:
            print(f"OK   {name} ({len(exp)} rows)")
    print(f"{'ALL GREEN' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
