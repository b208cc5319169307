#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers the sfDir parquet tables as
DuckDB views, runs each oracle SQL, loads the corresponding Spark parquet
result, sorts columns by name / rows by all columns, and compares.

STRICT by design (round 9): the driver's hash is type/format-sensitive
(int64 `123` vs float64 `123.0` fails it), so this mirror must be at least
as strict. Pandas dtypes must match exactly per column, and every cell must
be exactly equal — no int/float coercion, no tolerance. A float near-miss
is reported as a diagnostic alongside the FAIL, but it is still a FAIL.
The round-8 lesson: a tolerant mirror reported 195/195 while the driver
recorded 186/195 on nine DuckDB-HUGEINT-vs-Spark-int64 divergences.
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
    """Exact equality only. Same-type NaN pairs are equal; nothing else is
    coerced. int 123 != float 123.0 here — exactly as the driver sees it."""
    if pd.isna(a) and pd.isna(b):
        return type(a) is type(b) or (isinstance(a, float) and isinstance(b, float))
    if type(a) is not type(b) and not (
            isinstance(a, type(b)) or isinstance(b, type(a))):
        return False
    return a == b


def float_near(a, b) -> bool:
    """Diagnostic only: would the old tolerant compare have passed this?"""
    try:
        fa, fb = float(a), float(b)
    except (TypeError, ValueError):
        return False
    if math.isnan(fa) and math.isnan(fb):
        return True
    if fa == fb:
        return True
    return abs(fa - fb) <= 1e-12 * max(abs(fa), abs(fb))


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
        dt_bad = [(c, str(expect[c].dtype), str(got[c].dtype))
                  for c in expect.columns
                  if str(expect[c].dtype) != str(got[c].dtype)]
        if dt_bad:
            c, de, dg = dt_bad[0]
            print(f"FAIL {name}: dtype col {c}: oracle={de} spark={dg}"
                  f" ({len(dt_bad)} column(s) diverge)")
            n_fail += 1
            continue
        bad = None
        for c in expect.columns:
            ev, gv = expect[c].tolist(), got[c].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                if not cells_equal(a, b):
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            near = "  (within old 1e-12 tol — still FAIL)" if float_near(a, b) else ""
            print(f"FAIL {name}: col {c} row {i}: oracle={a!r} spark={b!r}{near}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
