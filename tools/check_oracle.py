#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers the sfDir parquet tables as
DuckDB views, runs each oracle SQL, loads the corresponding Spark parquet
result, sorts columns by name / rows by all columns, and compares.
Exact compare for non-floats; floats must match to ~1e-12 relative (we aim for
bit-exact via decimal-sum discipline, the tolerance only reports how close).
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def cells_equal(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        if fa == fb:
            return True
        return abs(fa - fb) <= 1e-12 * max(abs(fa), abs(fb))
    return a == b


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        # Builder-side partial runs (Verify with a name filter) dump only a
        # subset; silently skip queries with no spark output rather than
        # flooding the report. The driver always dumps the full surface.
        if not os.path.exists(f"{out_dir}/{name}"):
            continue
        try:
            expect = canon(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        if list(expect.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(expect.columns)}")
            n_fail += 1
            continue
        if len(expect) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(expect)}")
            n_fail += 1
            continue
        bad = None
        exact = True
        for c in expect.columns:
            ev, gv = expect[c].tolist(), got[c].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                if not cells_equal(a, b):
                    bad = (c, i, a, b)
                    break
                if isinstance(a, float) and isinstance(b, float) and a != b \
                        and not (pd.isna(a) and pd.isna(b)):
                    exact = False
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col {c} row {i}: oracle={a!r} spark={b!r}")
            n_fail += 1
        else:
            note = "" if exact else "  (float ulp diff within tol)"
            print(f"PASS {name} ({len(got)} rows){note}")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
